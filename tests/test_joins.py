"""As-of and bucketed-range join semantics on hand-built frames
(brute-force cross-check; the sf0.01 DuckDB parity covers scale)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark.operators.joins import asof_join, range_join_bucketed


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p1"), (1, _ts(30), "p2"), (2, _ts(5), "p3"), (3, _ts(9), "p4")],
        "k int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), "v1"),   # exact tie with p1 → matches (<=)
            (1, _ts(20), "v2"),
            (1, _ts(20), "v3"),   # same-ts tie → greatest tiebreak wins
            (2, _ts(6), "v4"),    # after p3 → no match
        ],
        "k int, ts timestamp, vid string",
    )
    got = {
        r["pid"]: r["vid_r"]
        for r in asof_join(
            left, right, on=["k"], tiebreak="vid"
        ).collect()
    }
    assert got == {"p1": "v1", "p2": "v3", "p3": None, "p4": None}


def test_asof_join_matches_bruteforce(spark):
    import random

    rnd = random.Random(7)
    lrows = [(k, _ts(rnd.randrange(0, 59)), f"p{i}") for i, k in enumerate(rnd.choices(range(5), k=40))]
    rrows = [(k, _ts(rnd.randrange(0, 59)), f"v{i}") for i, k in enumerate(rnd.choices(range(5), k=60))]
    left = spark.createDataFrame(lrows, "k int, ts timestamp, pid string")
    right = spark.createDataFrame(rrows, "k int, ts timestamp, vid string")
    got = {
        r["pid"]: r["vid_r"]
        for r in asof_join(left, right, on=["k"], tiebreak="vid").collect()
    }
    for k, lt, pid in lrows:
        cands = [(rt, vid) for rk, rt, vid in rrows if rk == k and rt <= lt]
        # greatest (ts, vid) wins — vid sorts lexicographically here and
        # the operator's tiebreak is the raw column ordering
        want = max(cands, key=lambda c: (c[0], c[1]))[1] if cands else None
        assert got[pid] == want, (pid, got[pid], want)


def test_range_join_bucketed_matches_bruteforce(spark):
    import random

    rnd = random.Random(11)
    arows = [(k, _ts(rnd.randrange(0, 59))) for k in rnd.choices(range(4), k=50)]
    brows = [(k, _ts(rnd.randrange(0, 59))) for k in rnd.choices(range(4), k=50)]
    a = spark.createDataFrame(arows, "k int, ts_a timestamp")
    b = spark.createDataFrame(brows, "k int, ts_b timestamp")
    got = sorted(
        (r["k"], r["ts_a"], r["ts_b"])
        for r in range_join_bucketed(a, b, on=["k"], width_s=600).collect()
    )
    want = sorted(
        (ka, ta, tb)
        for ka, ta in arows
        for kb, tb in brows
        if ka == kb and tb > ta and (tb - ta).total_seconds() <= 600
    )
    assert got == want
