"""SnapshotStore semantics: snapshot isolation, O(Δ) appends, time
travel, MERGE-style upsert, rollback — the Iceberg contract the engine
relies on for resume (SURVEY §7.5 Plan B)."""

from __future__ import annotations

import pytest

from crawler_spark.plans.store import SnapshotStore


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "store"))


def df_of(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_commit_read_roundtrip(spark, store):
    v = store.commit("t", df_of(spark, [(1, "a"), (2, "b")]), lineage={"op": "init"})
    assert v == 0
    got = {(r["k"], r["v"]) for r in store.read("t").collect()}
    assert got == {(1, "a"), (2, "b")}
    assert store.versions("t")[0]["lineage"] == {"op": "init"}


def test_append_is_delta(spark, store):
    store.commit("t", df_of(spark, [(1, "a")]))
    store.commit("t", df_of(spark, [(2, "b")]), mode="append")
    store.commit("t", df_of(spark, [(3, "c")]), mode="append")
    snaps = store.versions("t")
    # each append snapshot references prior files + one new delta dir
    assert [len(s["paths"]) for s in snaps] == [1, 2, 3]
    got = {r["k"] for r in store.read("t").collect()}
    assert got == {1, 2, 3}


def test_time_travel_and_rollback(spark, store):
    store.commit("t", df_of(spark, [(1, "a")]))
    store.commit("t", df_of(spark, [(1, "a"), (2, "b")]))
    store.commit("t", df_of(spark, [(9, "z")]))
    assert {r["k"] for r in store.read("t", version=0).collect()} == {1}
    assert {r["k"] for r in store.read("t", version=1).collect()} == {1, 2}
    assert {r["k"] for r in store.read("t").collect()} == {9}
    store.rollback("t", 1)
    assert {r["k"] for r in store.read("t").collect()} == {1, 2}
    # a new commit after rollback continues the version chain
    v = store.commit("t", df_of(spark, [(7, "q")]))
    assert v == 2
    assert {r["k"] for r in store.read("t").collect()} == {7}


def test_merge_upsert_latest_wins(spark, store):
    store.commit("t", df_of(spark, [(1, "a"), (2, "b"), (3, "c")]))
    store.merge_upsert("t", df_of(spark, [(2, "B2"), (4, "d")]), key="k")
    got = dict((r["k"], r["v"]) for r in store.read("t").collect())
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_snapshot_isolation_on_failed_write(spark, store, monkeypatch):
    """A crash between data write and manifest publish must leave the
    old snapshot intact (readers never see partial state)."""
    store.commit("t", df_of(spark, [(1, "a")]))

    real_publish = store._publish

    def boom(table, manifest):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(store, "_publish", boom)
    with pytest.raises(RuntimeError):
        store.commit("t", df_of(spark, [(2, "b")]))
    monkeypatch.setattr(store, "_publish", real_publish)
    assert {r["k"] for r in store.read("t").collect()} == {1}
    # and the next commit succeeds with a fresh version
    store.commit("t", df_of(spark, [(3, "c")]), mode="append")
    assert {r["k"] for r in store.read("t").collect()} == {1, 3}


def test_commit_upsert_merge_on_read(spark, store):
    store.commit("t", df_of(spark, [(1, "a"), (2, "b"), (3, "c")]))
    store.commit_upsert("t", df_of(spark, [(2, "B2"), (4, "d")]), key="k")
    store.commit_upsert("t", df_of(spark, [(2, "B3"), (5, "e")]), key="k")
    got = dict((r["k"], r["v"]) for r in store.read("t").collect())
    assert got == {1: "a", 2: "B3", 3: "c", 4: "d", 5: "e"}
    # time travel still works across the delta chain
    got1 = dict((r["k"], r["v"]) for r in store.read("t", version=1).collect())
    assert got1 == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # compaction materializes a base without changing the view
    v = store.compact("t")
    assert store.versions("t")[-1]["lineage"]["op"] == "compact"
    got_c = dict((r["k"], r["v"]) for r in store.read("t").collect())
    assert got_c == got
    # further upserts stack on the new base
    store.commit_upsert("t", df_of(spark, [(1, "A9")]), key="k")
    got2 = dict((r["k"], r["v"]) for r in store.read("t").collect())
    assert got2 == {**got, 1: "A9"}
    assert v == store.versions("t")[-2]["version"]


def test_compact_noop_on_base(spark, store):
    store.commit("t", df_of(spark, [(1, "a")]))
    v = store.current_version("t")
    assert store.compact("t") == v


def _frontier_like(spark, n=1000):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("url_key"),
        F.concat(F.lit("h"), (F.col("id") % 7)).alias("host"),
        F.lit(False).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
    )


def test_mor_read_is_delta_touched_only(spark, store):
    """Scale gate (VERDICT r1 #1): reading a MoR head must NOT shuffle
    the base — deltas resolve among themselves (O(Δ) window) and base
    rows pass through a broadcast anti-join, with read-side predicates
    pushed into the base parquet scan. At 10^10 frontier rows this is
    the difference between O(Δ) and O(frontier) per round."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import eligible

    base = _frontier_like(spark)
    store.commit("frontier", base)
    delta = base.limit(5).withColumn("completed", F.lit(True))
    store.commit_upsert("frontier", delta, key="url_key")

    df = eligible(store.read("frontier"))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # base joins via broadcast anti-join — never a sort-merge shuffle
    assert "BroadcastHashJoin LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    # the eligible predicate reaches the BASE parquet scan
    base_scan = next(
        b
        for b in plan.split("\n\n")
        if "Scan parquet" in b and "/frontier/v0" in b
    )
    assert "Not(EqualTo(completed,true))" in base_scan
    assert "LessThan(attempts,5)" in base_scan
    # the only hash-partition shuffles are over delta files (v1), not v0:
    # every Exchange's subtree scan must be a delta path
    assert plan.count("Exchange hashpartitioning") <= 2  # delta window (+reuse)
    # and the merged view is still correct
    got = df.count()
    assert got == 1000 - 5


def test_compact_partition_pruning(spark, store):
    """compact(partition_by=['completed']) must (a) keep the column
    typed boolean (snapshot schema beats Spark's string path-value
    inference) and (b) let the eligible filter prune the completed
    partition at the directory level (PartitionFilters in the scan)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import eligible

    base = _frontier_like(spark)
    store.commit("frontier", base)
    store.commit_upsert(
        "frontier", base.limit(5).withColumn("completed", F.lit(True)), key="url_key"
    )
    store.compact("frontier", partition_by=["completed"])
    # stack one more delta so the MoR + pruned-base paths compose
    store.commit_upsert(
        "frontier",
        base.limit(9).withColumn("completed", F.lit(True)),
        key="url_key",
    )
    df = eligible(store.read("frontier"))
    assert dict(df.dtypes)["completed"] == "boolean"
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    base_scan = next(
        b for b in plan.split("\n\n") if "Scan parquet" in b and "/frontier/v2" in b
    )
    assert "PartitionFilters" in base_scan and "completed" in base_scan.split(
        "PartitionFilters"
    )[1].splitlines()[0]
    assert df.count() == 1000 - 9


def test_upsert_onto_append_head_rejected(spark, store):
    store.commit("t", df_of(spark, [(1, "a")]))
    store.commit("t", df_of(spark, [(1, "dup"), (2, "b")]), mode="append")
    with pytest.raises(ValueError, match="append-mode head"):
        store.commit_upsert("t", df_of(spark, [(2, "B2")]), key="k")
    # merge_upsert (full MERGE) remains the legal path
    store.merge_upsert("t", df_of(spark, [(2, "B2")]), key="k")
    got = sorted((r["k"], r["v"]) for r in store.read("t").collect())
    assert got == [(1, "a"), (1, "dup"), (2, "B2")]


def test_append_onto_delta_head_rejected(spark, store):
    store.commit("t", df_of(spark, [(1, "a")]))
    store.commit_upsert("t", df_of(spark, [(1, "a2")]), key="k")
    with pytest.raises(ValueError, match="merge-on-read"):
        store.commit("t", df_of(spark, [(9, "z")]), mode="append")
    # compacting clears the restriction
    store.compact("t")
    store.commit("t", df_of(spark, [(9, "z")]), mode="append")
    got = dict((r["k"], r["v"]) for r in store.read("t").collect())
    assert got == {1: "a2", 9: "z"}


def test_mor_large_delta_read_drops_broadcast(spark, store):
    """Scale gate (VERDICT r2 #1): deltas accumulate discoveries for up
    to compact_every rounds, so the delta key set is NOT always
    driver-sized. Past broadcast_delta_max_rows (footer-counted, no
    extra job) the read must plan a plain anti-join, not force the key
    set through the driver."""
    from pyspark.sql import functions as F

    base = _frontier_like(spark)
    store.commit("frontier", base)
    delta = base.limit(50).withColumn("completed", F.lit(True))
    store.commit_upsert("frontier", delta, key="url_key")

    def _plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # make the static planner honest: tiny test files would be
    # auto-broadcast by size estimation regardless of the hint
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        store.broadcast_delta_max_rows = 10  # delta has 50 rows → over
        assert "BroadcastHashJoin" not in _plan(store.read("frontier"))
        store.broadcast_delta_max_rows = 4_000_000  # under → hint kept
        assert "BroadcastHashJoin LeftAnti" in _plan(store.read("frontier"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        store.broadcast_delta_max_rows = 4_000_000

    # both plans resolve the same table state
    store.broadcast_delta_max_rows = 10
    rows = store.read("frontier").collect()
    assert len(rows) == 1000
    assert sum(r["completed"] for r in rows) == 50


def test_parquet_footer_row_counts(spark, store, tmp_path):
    df = spark.range(123).selectExpr("id", "id * 2 AS v")
    p = str(tmp_path / "footers")
    df.repartition(4).write.parquet(p)
    assert store._parquet_rows([p]) == 123
    assert store._parquet_rows([str(tmp_path / "missing")]) == 0


def test_iceberg_statement_builders():
    """IcebergStore maps the SnapshotStore API onto Iceberg SQL; the
    runtime needs an Iceberg catalog (no jar in this sandbox), but the
    statement builders are deterministic and unit-testable."""
    from crawler_spark.plans.store import IcebergStore

    fq = "ice.crawl.frontier"
    got = IcebergStore.merge_sql(fq, "_updates_frontier", "url_key",
                                 ["url_key", "url", "completed"])
    assert got == (
        "MERGE INTO ice.crawl.frontier t USING _updates_frontier s "
        "ON t.url_key = s.url_key "
        "WHEN MATCHED THEN UPDATE SET t.url = s.url, t.completed = s.completed "
        "WHEN NOT MATCHED THEN INSERT (url_key, url, completed) "
        "VALUES (s.url_key, s.url, s.completed)"
    )
    assert IcebergStore.compact_sql("ice", fq) == (
        "CALL ice.system.rewrite_data_files(table => 'ice.crawl.frontier', "
        "options => map('min-input-files', '2'))"
    )
    assert IcebergStore.rollback_sql("ice", fq, 42) == (
        "CALL ice.system.rollback_to_snapshot('ice.crawl.frontier', 42)"
    )
    assert IcebergStore.time_travel_sql(fq, 7) == (
        "SELECT * FROM ice.crawl.frontier VERSION AS OF 7"
    )
