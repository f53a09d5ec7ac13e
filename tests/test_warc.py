"""WARC 1.1 sink/source: framing, determinism, seekable members, and
the distributed round-trip (pages → archive → pages)."""

from __future__ import annotations

import gzip
import hashlib
import base64

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources.warc import (
    gzip_member,
    make_record,
    make_response_record,
    make_warcinfo,
    parse_http_response,
    parse_warc,
    read_member,
    read_warc,
    write_warc,
)


# ----------------------------------------------------------------- framing
def test_record_framing_exact():
    rec = make_record(
        "resource",
        b"hello",
        uri="https://example.test/a",
        date="2026-01-01T00:00:00Z",
        content_type="text/plain",
    )
    assert rec.startswith(b"WARC/1.1\r\n")
    head, _, rest = rec.partition(b"\r\n\r\n")
    assert rest == b"hello\r\n\r\n"
    fields = dict(
        ln.decode().split(": ", 1) for ln in head.split(b"\r\n")[1:]
    )
    assert fields["Content-Length"] == "5"
    assert fields["WARC-Type"] == "resource"
    assert fields["WARC-Target-URI"] == "https://example.test/a"
    digest = "sha1:" + base64.b32encode(hashlib.sha1(b"hello").digest()).decode()
    assert fields["WARC-Block-Digest"] == digest
    # content-derived record id → identical input, identical bytes
    assert rec == make_record(
        "resource",
        b"hello",
        uri="https://example.test/a",
        date="2026-01-01T00:00:00Z",
        content_type="text/plain",
    )


def test_response_roundtrip_and_payload_digest():
    body = "xin chào — tiếng Việt".encode("utf-8")
    rec = make_response_record(
        "https://example.test/vn", 200, body, http_headers=[("X-A", "1")]
    )
    parsed = parse_warc(rec)
    assert len(parsed) == 1
    f = parsed[0]["fields"]
    assert f["WARC-Type"] == "response"
    assert f["Content-Type"] == "application/http;msgtype=response"
    status, headers, got = parse_http_response(parsed[0]["payload"])
    assert status == 200 and got == body
    assert ("X-A", "1") in headers
    want = "sha1:" + base64.b32encode(hashlib.sha1(body).digest()).decode()
    assert f["WARC-Payload-Digest"] == want


def test_block_digest_validated():
    rec = bytearray(
        make_record("resource", b"abcdef", uri="u:x", content_type="text/plain")
    )
    rec[rec.index(b"\r\n\r\nabcdef") + 4] ^= 0xFF  # corrupt the block
    with pytest.raises(ValueError, match="digest"):
        parse_warc(bytes(rec))


def test_gzip_members_concatenate_and_seek(tmp_path):
    recs = [
        make_response_record(f"https://h{i}.test/p", 200, f"body-{i}".encode())
        for i in range(3)
    ]
    members = [gzip_member(r) for r in recs]
    # deterministic members (mtime pinned)
    assert members[0] == gzip_member(recs[0])
    blob = b"".join(members)
    parsed = parse_warc(blob)
    assert len(parsed) == 3
    # each record's (offset, length) decompresses standalone
    p = tmp_path / "a.warc.gz"
    p.write_bytes(blob)
    for i, rec in enumerate(parsed):
        got = read_member(str(p), rec["offset"], rec["length"])
        assert got["fields"]["WARC-Target-URI"] == f"https://h{i}.test/p"
        assert gzip.decompress(
            blob[rec["offset"] : rec["offset"] + rec["length"]]
        ) == recs[i]


def test_warcinfo_fields():
    parsed = parse_warc(make_warcinfo("f.warc.gz", software="crawler-spark"))
    f = parsed[0]["fields"]
    assert f["WARC-Type"] == "warcinfo"
    assert f["WARC-Filename"] == "f.warc.gz"
    assert b"format: WARC File Format 1.1" in parsed[0]["payload"]


# ------------------------------------------------------------- spark paths
@pytest.fixture()
def pages_df(spark):
    rows = [
        (f"https://site{i % 4}.test/doc/{i}", 200 if i % 7 else 404,
         f"# doc {i}\n\nnội dung {'x' * (i % 50)}")
        for i in range(200)
    ] + [("https://site0.test/empty", 200, "")]
    return spark.createDataFrame(rows, "url string, status int, body string")


def test_write_read_roundtrip_distributed(spark, pages_df, tmp_path):
    out = str(tmp_path / "archive")
    manifest = write_warc(pages_df.repartition(4, "url"), out).cache()
    n = pages_df.count()
    assert manifest.count() == n
    # one archive per non-empty partition, every manifest row resolvable
    files = sorted({r["file"] for r in manifest.select("file").distinct().collect()})
    assert 1 <= len(files) <= 4
    back = read_warc(spark, out + "/*.warc.gz")
    got = {
        (r["uri"], r["status"], r["body"])
        for r in back.select("uri", "status", "body").collect()
    }
    want = {
        (r["url"], r["status"], r["body"]) for r in pages_df.collect()
    }
    assert got == want
    # warcinfo excluded by default, present when asked
    assert back.count() == n
    with_info = read_warc(spark, out + "/*.warc.gz", include_warcinfo=True)
    assert with_info.count() == n + len(files)


def test_manifest_random_access(spark, pages_df, tmp_path):
    out = str(tmp_path / "archive2")
    manifest = write_warc(pages_df.repartition(2), out)
    row = manifest.filter(F.col("status") == 404).limit(1).collect()[0]
    rec = read_member(row["file"], row["offset"], row["length"])
    assert rec["fields"]["WARC-Record-ID"] == row["record_id"]
    status, _, _ = parse_http_response(rec["payload"])
    assert status == 404


def test_engine_archive_pages(spark, tmp_path, tmp_path_factory):
    """End-to-end: crawl the fixture world, archive, and verify the
    archive replays every fetched page byte-for-byte + the manifest
    lands in the snapshot store as `warc_index`."""
    from crawler_spark.oracle.fixtures import build_world
    from crawler_spark.sources.fetch import FixtureFetcher
    from crawler_spark.sources.fixtures_io import read_table, write_world
    from crawler_spark.plans.store import SnapshotStore
    from crawler_spark.streaming.rounds import CrawlEngine

    world = build_world(n_docs=8, seed=5)
    fd = tmp_path_factory.mktemp("warc_world")
    write_world(spark, world, str(fd))
    eng = CrawlEngine(
        spark=spark,
        store=SnapshotStore(spark, str(tmp_path / "store")),
        fetcher=FixtureFetcher(
            pages={
                u: (p.body, p.fail_rounds, p.latency_ms)
                for u, p in world.pages.items()
            }
        ),
        robots=read_table(spark, str(fd), "robots"),
        politeness=read_table(spark, str(fd), "politeness"),
    )
    eng.init_frontier(read_table(spark, str(fd), "seeds"))
    eng.run(max_rounds=50)

    out = str(tmp_path / "warc")
    manifest = eng.archive_pages(out, n_files=3)
    pages = eng.store.read("pages")
    assert manifest.count() == pages.count()
    back = read_warc(spark, out + "/*.warc.gz")
    got = {
        (r["uri"], r["status"], r["body"])
        for r in back.select("uri", "status", "body").collect()
    }
    want = {
        (r["url"], r["status"], r["body"])
        for r in pages.select("url", "status", "body").collect()
    }
    assert got == want


def test_read_warc_selected_ranged(spark, pages_df, tmp_path):
    """A filtered manifest subset replays exactly those records via
    ranged reads — no archive scan, map-only plan."""
    from crawler_spark.sources.warc import read_warc_selected

    out = str(tmp_path / "sel")
    manifest = write_warc(pages_df.repartition(3, "url"), out).cache()
    picked = manifest.filter(F.col("status") == 404)
    got = read_warc_selected(picked)
    want = {
        (r["uri"], r["status"]) for r in picked.select("uri", "status").collect()
    }
    rows = got.collect()
    assert {(r["uri"], r["status"]) for r in rows} == want
    assert all(r["warc_type"] == "response" for r in rows)
    # body round-trips through the ranged path too
    bodies = {r["uri"]: r["body"] for r in rows}
    src = {r["url"]: r["body"] for r in pages_df.collect()}
    for uri, body in bodies.items():
        assert body == src[uri]
    # the ranged read itself adds NO exchange: over a lineage-free
    # manifest (as read back from the parquet index table) the whole
    # replay is map-only
    flat = spark.createDataFrame(picked.collect(), picked.schema)
    plan = (
        read_warc_selected(flat)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_write_is_map_only(spark, pages_df, tmp_path):
    """The sink must add no exchange: partitioning is the caller's
    knob, archiving itself never shuffles."""
    plan = write_warc(pages_df, str(tmp_path / "a3"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
