"""Structured Streaming veneer: file-source stream → watermarked window
agg must equal the batch computation (stream/batch parity), and
foreachBatch-driven crawl rounds must reach the same final state as the
batch round loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.streaming.stream import stream_crawl_rounds, windowed_event_counts

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "event_type", "value"
    )
    batch.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_stream_batch_window_parity(spark, events_dir, tmp_path_factory):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)
    out = windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("ckpt_win"))
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.schema(EVENT_SCHEMA).parquet(events_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in windowed_event_counts(batch).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_rounds_match_batch_engine(
    spark, world, fixture_dir, tmp_path_factory, oracle_result
):
    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table
    from crawler_spark.streaming.rounds import CrawlEngine
    from tests.test_crawl_parity import _engine_order, _oracle_order

    tmp = tmp_path_factory.mktemp("stream_eng")
    engine = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp / "store")),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
    )
    engine.init_frontier(read_table(spark, fixture_dir, "seeds"))

    # tick stream: one parquet file per desired round; each micro-batch
    # (availableNow → one batch per file group) fires rounds until the
    # frontier drains; surplus ticks become no-ops
    ticks_dir = str(tmp / "ticks")
    for k in range(24):
        spark.createDataFrame([(k,)], "tick int").write.mode(
            "append" if k else "overwrite"
        ).parquet(ticks_dir)
    ticks = spark.readStream.schema("tick int").option(
        "maxFilesPerTrigger", 1
    ).parquet(ticks_dir)

    q = stream_crawl_rounds(engine, ticks, str(tmp / "ckpt"))
    q.awaitTermination(300)

    assert _engine_order(engine) == _oracle_order(oracle_result)
    got = {r["url"] for r in engine.url_seen().collect()}
    assert got == oracle_result.url_seen


def test_round_job_budget(spark, world, fixture_dir, tmp_path_factory):
    """Regression tripwire for duplicate evaluation (VERDICT r1 #9: the
    discovery chain used to run twice per round). A round's Spark-job
    budget: fetch+count, 4 sink commits, the frontier delta write, the
    metrics commit, and store/manifest housekeeping — measured 22-29
    jobs; a re-evaluated discovery or fetch chain adds ~5+ jobs and
    trips the bound."""
    import os

    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table
    from crawler_spark.streaming.rounds import CrawlEngine

    d = str(tmp_path_factory.mktemp("jobbudget"))
    store = SnapshotStore(spark, os.path.join(d, "store"))
    fetcher = FixtureFetcher(
        pages={u: (p.body, p.fail_rounds, p.latency_ms) for u, p in world.pages.items()}
    )
    eng = CrawlEngine(
        spark=spark,
        store=store,
        fetcher=fetcher,
        robots=read_table(spark, fixture_dir, "robots"),
        politeness=read_table(spark, fixture_dir, "politeness"),
    )
    eng.init_frontier(read_table(spark, fixture_dir, "seeds"))
    sc = spark.sparkContext
    for rnd in (1, 2):
        sc.setJobGroup(f"jobbudget{rnd}", f"round {rnd}")
        eng.run_round(rnd)
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(f"jobbudget{rnd}"))
        sc.setJobGroup(None, None)
        assert n_jobs <= 32, f"round {rnd} ran {n_jobs} Spark jobs (budget 32)"


def test_stream_validate_images_resumable(spark, tmp_path_factory):
    """Incremental payload validation: new files are decoded exactly
    once across restarts (checkpoint-resumable), results match the
    batch kernel."""
    import numpy as np

    from crawler_spark.functions import images as im
    from crawler_spark.streaming.stream import stream_validate_images

    base = tmp_path_factory.mktemp("imgstream")
    in_dir, out_dir, ck = str(base / "in"), str(base / "out"), str(base / "ck")

    rng = np.random.default_rng(71)

    def write_batch(ids, fmts):
        rows = []
        for i, fmt in zip(ids, fmts):
            arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            rows.append((f"im{i}", bytearray(im.encode_image(arr, fmt)), fmt))
        spark.createDataFrame(
            rows, "image_id string, bytes binary, fmt string"
        ).coalesce(1).write.mode("append").parquet(in_dir)

    write_batch([0, 1, 2], ["png", "jpg", "bmp"])
    q = stream_validate_images(spark, in_dir, out_dir, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    assert first.count() == 3
    assert first.filter("ok").count() == 3

    # more files arrive; restart from the SAME checkpoint
    write_batch([3, 4], ["qjpg", "jpg"])
    q2 = stream_validate_images(spark, in_dir, out_dir, ck)
    q2.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    # exactly once: 5 distinct ids, 5 rows total (no re-decode of 0-2)
    assert out.count() == 5
    assert out.select("image_id").distinct().count() == 5
    assert out.filter("ok").count() == 5
    assert set(r["fmt"] for r in out.collect()) == {"png", "jpg", "bmp", "qjpg"}
