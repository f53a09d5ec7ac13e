"""Physical-plan quality gates: the plan shapes that must survive a
100× scale-up. These parse `.explain` output — planning only, no
execution — so regressions (lost pushdown, lost broadcast, global
single-partition windows) fail fast."""

from __future__ import annotations

import pytest

from crawler_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    # registry entry, or a component function folded into a suite
    # (the 50-entry driver budget retired some standalone keys; the
    # functions stay importable and individually plan-gated)
    import crawler_spark.queries as Q

    fn = QUERIES.get(name) or getattr(Q, name)
    df = fn(spark, SF_DIR)
    return plan_str(spark, df)


def plan_str(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q01_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q01_pricing_rollup")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema_line and "l_orderkey" not in schema_line
    assert "partial_sum" in plan  # map-side combine before the shuffle


def test_q06_broadcasts_all_dims(spark):
    plan = plan_of(spark, "q06_broadcast_dim_join")
    assert plan.count("BroadcastHashJoin Inner BuildRight") == 3
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["q03_priority_order", "q09_wordcount_topk"])
def test_distributed_topk(spark, name):
    plan = plan_of(spark, name)
    assert "TakeOrderedAndProject" in plan


def test_no_partitionless_windows_on_big_tables(spark):
    """A Window with an empty partition spec funnels everything into
    one task. Only allowed after a limit (tiny survivor sets)."""
    offenders = []
    for name in QUERIES:
        plan = plan_of(spark, name)
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window [" in line and "windowspecdefinition(" in line:
                # empty partition spec → windowspecdefinition starts
                # directly with the order column list and no partition
                # columns; detect via ', windowspecdefinition(' right
                # after '[' with no partitionBy marker
                pass
        # structural check instead: partition-less windows emit the
        # WindowExec warning at runtime; statically, a partition-less
        # window's plan shows 'Window' directly over an 'Exchange
        # SinglePartition'
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line and not _allowed_single_partition(
                name, plan
            ):
                offenders.append((name, line.strip()))
                break
    assert not offenders, offenders


def _allowed_single_partition(name: str, plan: str) -> bool:
    # global aggregates (single output row) and post-limit ranking are
    # legitimately single-partition
    return (
        "TakeOrderedAndProject" in plan
        or "GlobalLimit" in plan
        or name
        in {
            "q36_correlated_avg",  # single-row global aggregate
            "q10_grouping_sets",  # grand-total rows (rollup + cube)
        }
    )


@pytest.mark.parametrize("name", ["q05_anti_join", "q07_semi_join"])
def test_join_strategies_not_nested_loop(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q22_single_pass_signatures(spark):
    """MinHash signatures must build in ONE groupBy over the shingles
    (K min-aggregates + posexplode), not K unioned groupBys — one
    shuffle instead of four at 100 TB."""
    plan = plan_of(spark, "q22_minhash_lsh_pairs")
    assert "Union" not in plan


def test_lsh_pair_shuffle_carries_no_signatures(spark):
    """The banded-candidate join and the pair-dedup exchange must
    carry bare ids, never the k-long signature arrays: sig_a/sig_b at
    k=128 are ~2 KB/row, and at 10^9 docs the band-collision fan-out
    turns that into terabytes of shuffle for re-derivable data
    (VERDICT r3). Signatures re-join ONCE, keyed on a single doc id,
    after the dedup — so any exchange keyed on (band, bh) or on both
    pair ids must be signature-free."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import minhash_pairs

    docs = spark.range(64).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat_ws(
            " ", *[F.concat(F.lit(f"w{i}_"), F.col("id") % 7) for i in range(12)]
        ).alias("text"),
    )
    # disable broadcast at plan time so the shuffle exchanges this
    # gate inspects actually appear (at 10^9 docs neither side fits)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_str(spark, minhash_pairs(docs, "doc_id", "text", k=16, bands=4))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    checked = 0
    for blk in plan.split("\n\n"):
        args = next(
            (l for l in blk.splitlines() if l.startswith("Arguments: hashpartitioning")),
            None,
        )
        if args is None:
            continue
        keys = args.split("hashpartitioning(", 1)[1]
        if "band" in keys or ("doc_a" in keys and "doc_b" in keys):
            checked += 1
            assert "sig" not in blk, blk
    assert checked >= 2, plan  # the band join + the pair dedup


def test_q26_ivf_assignment_has_no_window(spark):
    """IVF nearest-centroid assignment must be a partial-aggregable
    max(struct) groupBy, not a row_number window — the window's
    sort-based exchange keyed on vec_id is pure waste at 10^9 vectors
    (VERDICT r3)."""
    plan = plan_of(spark, "q26_ann_cells")
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_brute_force_guard_trips(spark):
    """The brute-force verify tier must refuse oversized inputs rather
    than melt a cluster (VERDICT r1: q24/q25/q38 guards)."""
    from crawler_spark.queries import (
        q24_ngram_jaccard,
        q25_cosine_topk,
        q38_embedding_near_dup,
    )

    # a tiny bound makes the real sf0.001 tables oversized
    for fn in (q24_ngram_jaccard, q25_cosine_topk, q38_embedding_near_dup):
        with pytest.raises(ValueError, match="brute-force bound"):
            fn(spark, SF_DIR, max_rows=3)


def test_politeness_partial_topk_before_shuffle(spark):
    """select_round must rank against a CONSTANT cap so Catalyst plants
    a partial WindowGroupLimit before the host exchange — the shuffle
    carries O(hosts x cap) rows, not the whole open frontier."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import select_round

    frontier = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7)).alias("host"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(False).alias("requires_manual_check"),
        F.col("id").cast("int").alias("document_number"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("completed"),
        F.lit(0).cast("int").alias("attempts"),
        F.lit("d").alias("doc_id"),
    )
    pol = spark.createDataFrame([("h0", 4)], "host string, budget_per_round int")
    out = select_round(frontier, pol, default_budget=2)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    partials = [
        b for b in plan.split("\n\n") if "WindowGroupLimit" in b and "Partial" in b
    ]
    assert partials, "no partial WindowGroupLimit before the politeness shuffle"


def test_q50_word_count_shape(spark):
    """Repetition rules must keep the canonical word-count shape:
    partial aggregation before every exchange, no window over the
    exploded grams, and exactly one gram-keyed + one doc-keyed
    aggregation (max-per-n fused into conditional aggregates, not a
    pivot's extra shuffle)."""
    plan = plan_of(spark, "q50_repetition_rules")
    assert "partial_count" in plan or "partial" in plan
    assert "Window" not in plan
    # gram-keyed agg + doc-keyed agg + broadcast for the join (the
    # formatted pre-AQE plan also lists each exchange's detail block);
    # a pivot or window would push this past 6
    assert plan.count("Exchange") <= 6


def test_q52_benchmark_grams_broadcast(spark):
    """Decontamination must stream corpus grams past a BROADCAST of
    the (tiny) benchmark gram set — a shuffled semi-join here would
    re-shuffle the whole corpus by 13-gram at 100 TB."""
    plan = plan_of(spark, "q52_decontamination")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the benchmark side, not the corpus, builds the broadcast
    assert "BroadcastExchange" in plan


def test_q53_frequent_lines_broadcast_anti(spark):
    """Line-level boilerplate removal: the >=min_docs frequent-line
    set is tiny, so it must come back as a broadcast LEFT ANTI join —
    never a corpus-sized shuffle keyed on raw line text."""
    plan = plan_of(spark, "q53_line_boilerplate")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Window" not in plan


def test_no_heavy_expressions_under_generate(spark):
    """Spark re-evaluates a Generate's input expression once per
    OUTPUT element (CollapseProject inlines the projection), so an
    explode over a string-building transform costs O(elements²) string
    work per row — q50/q52/q53 regressed 6-15x this way. Gate: no
    Generate input in these plans may contain string builders; the
    heavy work must sit ABOVE the explode."""
    for q in (
        "q50_repetition_rules",
        "q52_decontamination",
        "q53_line_boilerplate",
        "q22_minhash_lsh_pairs",
        "q24_ngram_jaccard",
        "q48_minhash_production",
    ):
        plan = plan_of(spark, q)
        gen_lines = [l for l in plan.splitlines() if "explode(" in l]
        assert gen_lines, q
        for line in gen_lines:
            assert "concat_ws" not in line and "xxhash64" not in line, (q, line)


def test_q60_single_dedup_shuffle(spark):
    """The composed preprocessing pipeline must keep its gates map-side
    so the ONLY round-trip shuffle is the md5-keyed dedup window: one
    hashpartitioning Exchange total (the union and scrub are map-only).
    At 100 TB an extra corpus shuffle here doubles the job's IO."""
    plan = plan_of(spark, "q60_preprocess_pipeline")
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, plan
    assert "hashpartitioning(text_hash" in plan
    assert "SinglePartition" not in plan
