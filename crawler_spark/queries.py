"""Operator-coverage query library (driver harness `__spark_entry__.py`).

One entry per operator family from SURVEY §2 plus the training-data
pipeline ops (dedup / similarity / text analysis), each expressed twice:

  * a PySpark DataFrame callable ``(spark, sf_dir) -> DataFrame``
    (declarative — Catalyst does pushdown/pruning/broadcast);
  * an ANSI-SQL oracle string DuckDB runs on the same parquet.

Parity rules (the driver hash-compares values after sorting columns by
name): every computed column is aliased identically on both sides;
float aggregates are rounded (sums → 2dp, ratios → 6dp, similarities →
4-6dp) because summation order differs between engines; counts are cast
to bigint; timestamps are emitted as formatted strings (Spark session
TZ is pinned UTC to match DuckDB's naive timestamps).

Reference-semantics mapping (file:line into /root/reference):
  q01  A3-A7 corpus totals/ratios        analyze.ts:87-154
  q02  A8/O6 top-k per group             analyze.ts:202-204
  q03  O1/O2 priority sort               sortUtils.ts:9-39
  q04  D1 first-wins dedup               getMetadataList.ts:197
  q05  Anti candidate−seen               checkpoint.ts:100-114
  q06  J8 broadcast dim joins            schemaMapping.ts:12-21
  q07  J4 semi-join lookup               getPageContent.ts:140-175
  q08  U1/U3 unions                      getMetadataList.ts:83-192
  q09  U4 flatMap/explode + A5 counts    crawler.ts:387-408, analyze.ts:62-74
  q10  A4 rollup with shares             analyze.ts:102-142
  q11  O7/O8 sequence numbering          getMetadataList.ts:80,187
  q12  C18/C19 date ops                  treeUtils.ts:45-57
  q13  J7 theta join                     process-proper-name.ts:46-67
  q14  J1/K6 latest-state upsert         checkpoint.ts:203-288
  q15  O9 stateful sessionization        getPageContentDaily.ts:62-91
  q16  O9 running aggregates             getPageContentDaily.ts:62-91
  q17  C1 image extract                  mdUtils.ts:5,23-44
  q18  C1-C9 cleanup chain               mdUtils.ts:238-243
  q19  ID grammar format/parse           getId.ts:30-107
  q20  C20/C21 key/title rewrites        treeUtils.ts:175-183, fileUtils.ts:26
  q21-q29 graft training-data ops (dedup/similarity/text analysis)
  q30  streaming window agg (batch-equivalent)
  q31  distinct cardinalities (frontier metrics analog)
  q32  extraAttributes extraction        schema.ts:233-235
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from crawler_spark.functions.text import md_images_col


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


BRUTE_FORCE_MAX_ROWS = 10_000


def _guard_brute_force(
    df: DataFrame, what: str, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> DataFrame:
    """Size gate for the brute-force (all-pairs / crossJoin) verify
    tier: candidate count grows quadratically, so these shapes are
    refused beyond ``max_rows`` input rows instead of silently melting
    a cluster — the bucketed siblings (q22 MinHash-LSH, q26
    sign-buckets, q39 IVF) are the 100 TB path. Callers pass filtered
    frames, so the count() scans the (pruned) input once — a linear
    pre-pass that is negligible next to the quadratic stage it gates."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{what}: input has {n} rows > brute-force bound {max_rows}; "
            "use the LSH/IVF tier (q22/q26/q39 shapes) or raise max_rows "
            "explicitly for a verify run"
        )
    return df


# ---------------------------------------------------------------------------
# q01 — flagship: pricing rollup (TPC-H Q1 shape; A3-A7 corpus-stat analog)
# ---------------------------------------------------------------------------


def q01_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 4).alias("avg_qty"),
            F.round(F.sum("l_discount") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(sum(l_quantity) / count(*), 4)                             AS avg_qty,
       round(sum(l_discount) / count(*), 6)                             AS avg_disc,
       count(*)::BIGINT                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# q02 — top-k per group (window rank ≤ 5)
# ---------------------------------------------------------------------------


def q02_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


Q02_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey)::BIGINT AS rk
      FROM part)
WHERE rk <= 5
"""

# ---------------------------------------------------------------------------
# q03 — frontier priority ordering (requiresManualCheck-style key + limit)
# ---------------------------------------------------------------------------


def q03_priority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # distributed top-k (TakeOrderedAndProject), NOT a global window —
    # a partition-less window funnels the whole table into one task;
    # rank only the k survivors
    top = o.orderBy(
        F.col("o_orderpriority"), F.col("o_orderdate"), F.col("o_orderkey")
    ).limit(100)
    w = W.orderBy(F.col("o_orderpriority"), F.col("o_orderdate"), F.col("o_orderkey"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rk"),
        "o_orderkey",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
    )


Q03_SQL = """
SELECT rk, o_orderkey, o_orderpriority, order_date
FROM (SELECT row_number() OVER (ORDER BY o_orderpriority, o_orderdate, o_orderkey)::BIGINT AS rk,
             o_orderkey, o_orderpriority,
             strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM orders)
WHERE rk <= 100
"""

# ---------------------------------------------------------------------------
# q04 — first-wins dedup (uniqBy semantics, NOT dropDuplicates)
# ---------------------------------------------------------------------------


def q04_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
        )
    )


Q04_SQL = """
SELECT user_id, event_id AS first_event_id, event_type AS first_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# q05 — anti-join (candidate − seen)
# ---------------------------------------------------------------------------


def q05_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


Q05_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
"""

# ---------------------------------------------------------------------------
# q06 — broadcast dimension joins (star join to region)
# ---------------------------------------------------------------------------


def q06_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


Q06_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

# ---------------------------------------------------------------------------
# q07 — semi join (EXISTS lookup)
# ---------------------------------------------------------------------------


def q07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts_with_sales"))
    )


Q07_SQL = """
SELECT p_brand, count(*)::BIGINT AS n_parts_with_sales
FROM part WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
GROUP BY p_brand
"""

# ---------------------------------------------------------------------------
# q08 — union of section scans + distinct
# ---------------------------------------------------------------------------


def q08_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    a = e.filter((F.col("event_type") == "view") & (F.col("value") > 90)).select(
        "user_id", "event_type"
    )
    b = e.filter(F.col("event_type") == "purchase").select("user_id", "event_type")
    return (
        a.unionByName(b)
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


Q08_SQL = """
SELECT event_type, count(*)::BIGINT AS n_users FROM (
  SELECT DISTINCT user_id, event_type FROM (
    SELECT user_id, event_type FROM events WHERE event_type = 'view' AND value > 90
    UNION ALL
    SELECT user_id, event_type FROM events WHERE event_type = 'purchase')
) GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# q09 — explode/flatten + counts (word frequency top-20)
# ---------------------------------------------------------------------------


def q09_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    counts = words.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # distributed top-k, then rank the 20 survivors (see q03 note)
    top = counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(20)
    w = W.orderBy(F.col("cnt").desc(), F.col("word"))
    return top.select(F.row_number().over(w).cast("bigint").alias("rk"), "word", "cnt")


Q09_SQL = """
SELECT rk, word, cnt FROM (
  SELECT word, cnt, row_number() OVER (ORDER BY cnt DESC, word)::BIGINT AS rk
  FROM (SELECT word, count(*)::BIGINT AS cnt
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word FROM documents)
        WHERE length(word) > 0 GROUP BY word))
WHERE rk <= 20
"""

# ---------------------------------------------------------------------------
# q10 — rollup with grand total (per-genre stats + share analog)
# ---------------------------------------------------------------------------


def q10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


Q10_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus)
"""

# ---------------------------------------------------------------------------
# q11 — deterministic sequence numbering (documentNumber assignment)
# ---------------------------------------------------------------------------


def q11_seq_numbering(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return d.select(
        "doc_id", "source", F.row_number().over(w).cast("bigint").alias("seq_in_source")
    )


Q11_SQL = """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id)::BIGINT AS seq_in_source
FROM documents
"""

# ---------------------------------------------------------------------------
# q12 — date parse/format/arithmetic
# ---------------------------------------------------------------------------


def q12_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


Q12_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""

# ---------------------------------------------------------------------------
# q13 — theta join (equi + range residual)
# ---------------------------------------------------------------------------


def q13_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(
        o,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60).cast("timestamp")),
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_late"),
        F.round(F.sum("l_extendedprice"), 2).alias("late_value"),
    )


Q13_SQL = """
SELECT l_returnflag, count(*)::BIGINT AS n_late,
       round(sum(l_extendedprice), 2) AS late_value
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""

# ---------------------------------------------------------------------------
# q14 — latest-state upsert view (MERGE INTO semantics, latest-wins)
# ---------------------------------------------------------------------------


def q14_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value"), 4).alias("last_value"),
        )
    )


Q14_SQL = """
SELECT user_id, event_type AS last_event_type, round(value, 4) AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# q15 — sessionization (lag + gap cumsum)
# ---------------------------------------------------------------------------

_SESSION_GAP_S = 1800


def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > _SESSION_GAP_S), F.lit(1)).otherwise(F.lit(0)),
    )
    return sess.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


Q15_SQL = f"""
SELECT user_id, sum(new_session)::BIGINT AS n_sessions, count(*)::BIGINT AS n_events
FROM (SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR date_diff('second', prev_ts, ts) > {_SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events WHERE user_id < 200))
GROUP BY user_id
"""

# ---------------------------------------------------------------------------
# q16 — running aggregates (stateful verse-order tracking analog)
# ---------------------------------------------------------------------------


def q16_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


Q16_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 4) AS running_value
FROM events WHERE user_id < 50
"""

# ---------------------------------------------------------------------------
# q17 — markdown image extraction (C1-as-extract; the graft payload op)
# ---------------------------------------------------------------------------


def q17_md_image_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    md = p.select(
        "p_partkey",
        F.concat(
            F.lit("Xem hình ![" ),
            F.col("p_name"),
            F.lit("](http://img.test/"),
            F.col("p_partkey"),
            F.lit(".png) ở đây."),
        ).alias("md"),
    )
    imgs = md.select(
        "p_partkey", F.explode(md_images_col(F.col("md"))).alias("img")
    )
    return imgs.select(
        "p_partkey",
        F.col("img.caption").alias("caption"),
        F.col("img.link").alias("link"),
    )


Q17_SQL = """
SELECT p_partkey,
       regexp_extract(md, '!\\[([^\\]]*)\\]\\(([^)]*)\\)', 1) AS caption,
       regexp_extract(md, '!\\[([^\\]]*)\\]\\(([^)]*)\\)', 2) AS link
FROM (SELECT p_partkey,
             'Xem hình ![' || p_name || '](http://img.test/' || p_partkey || '.png) ở đây.' AS md
      FROM part)
"""

# ---------------------------------------------------------------------------
# q18 — markdown cleanup chain (images→links→quotes→spacing)
# ---------------------------------------------------------------------------


def q18_md_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    md = d.select(
        "doc_id",
        F.concat(
            F.lit("“Trích” ![hình](http://x/i.png) [liên kết](http://y) "),
            F.substring(F.col("text"), 1, 80),
        ).alias("md"),
    )
    cleaned = (
        md.withColumn("c", F.regexp_replace(F.col("md"), r"!\[([^\]]*)\]\(([^)]*)\)", ""))
        .withColumn("c", F.regexp_replace(F.col("c"), r"\[([^\]]*)\]\(([^)]*)\)", "$1"))
        .withColumn("c", F.translate(F.col("c"), "“”‘’", "\"\"''"))
        .withColumn("c", F.regexp_replace(F.col("c"), r" {2,}", " "))
        .withColumn("c", F.trim(F.col("c")))
    )
    return cleaned.select("doc_id", F.col("c").alias("cleaned"))


Q18_SQL = """
SELECT doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(
      regexp_replace(
        regexp_replace(md, '!\\[([^\\]]*)\\]\\(([^)]*)\\)', '', 'g'),
        '\\[([^\\]]*)\\]\\(([^)]*)\\)', '\\1', 'g'),
      '“', '"'), '”', '"'), '‘', ''''), '’', ''''),
    ' {2,}', ' ', 'g')) AS cleaned
FROM (SELECT doc_id,
             '“Trích” ![hình](http://x/i.png) [liên kết](http://y) ' || substr(text, 1, 80) AS md
      FROM documents WHERE doc_id < 100)
"""

# ---------------------------------------------------------------------------
# q19 — hierarchical ID grammar: format + parse roundtrip
# ---------------------------------------------------------------------------


def q19_id_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    ids = d.select(
        "doc_id",
        F.format_string(
            "DSG_%03d.%03d.%03d.%02d",
            (F.col("doc_id") % 1000).cast("int"),
            ((F.col("doc_id") * 7) % 1000).cast("int"),
            ((F.col("doc_id") * 13) % 1000).cast("int"),
            ((F.col("doc_id") * 3) % 100).cast("int"),
        ).alias("dsg_id"),
    )
    pat = r"^[A-Z]+_(\d{3})\.(\d{3})\.(\d{3})\.(\d{2})$"
    return ids.select(
        "doc_id",
        "dsg_id",
        F.regexp_extract("dsg_id", pat, 1).cast("bigint").alias("p_doc"),
        F.regexp_extract("dsg_id", pat, 2).cast("bigint").alias("p_chapter"),
        F.regexp_extract("dsg_id", pat, 3).cast("bigint").alias("p_page"),
        F.regexp_extract("dsg_id", pat, 4).cast("bigint").alias("p_sentence"),
    )


Q19_SQL = """
SELECT doc_id, dsg_id,
       regexp_extract(dsg_id, '^[A-Z]+_(\\d{3})\\.(\\d{3})\\.(\\d{3})\\.(\\d{2})$', 1)::BIGINT AS p_doc,
       regexp_extract(dsg_id, '^[A-Z]+_(\\d{3})\\.(\\d{3})\\.(\\d{3})\\.(\\d{2})$', 2)::BIGINT AS p_chapter,
       regexp_extract(dsg_id, '^[A-Z]+_(\\d{3})\\.(\\d{3})\\.(\\d{3})\\.(\\d{2})$', 3)::BIGINT AS p_page,
       regexp_extract(dsg_id, '^[A-Z]+_(\\d{3})\\.(\\d{3})\\.(\\d{3})\\.(\\d{2})$', 4)::BIGINT AS p_sentence
FROM (SELECT doc_id,
             printf('DSG_%03d.%03d.%03d.%02d',
                    doc_id % 1000, (doc_id * 7) % 1000,
                    (doc_id * 13) % 1000, (doc_id * 3) % 100) AS dsg_id
      FROM documents)
"""

# ---------------------------------------------------------------------------
# q20 — camelCase→SNAKE_UPPER + title sanitization
# ---------------------------------------------------------------------------


def q20_key_rewrites(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select("event_type").distinct()
    keyed = e.select(
        "event_type",
        F.concat(F.lit("extraAttr"), F.initcap("event_type"), F.lit("Value")).alias(
            "camel"
        ),
    )
    return keyed.select(
        "event_type",
        "camel",
        F.upper(F.regexp_replace("camel", r"([a-z0-9])([A-Z])", r"$1_$2")).alias("snake"),
        F.regexp_replace(
            F.concat(F.lit("a/b:c|"), F.col("event_type"), F.lit("?x")),
            r'[/\\?%*:|"<>]',
            "_",
        ).alias("sanitized"),
    )


Q20_SQL = """
SELECT event_type, camel,
       upper(regexp_replace(camel, '([a-z0-9])([A-Z])', '\\1_\\2', 'g')) AS snake,
       regexp_replace('a/b:c|' || event_type || '?x', '[/\\\\?%*:|"<>]', '_', 'g') AS sanitized
FROM (SELECT DISTINCT event_type,
             'extraAttr' || upper(substr(event_type, 1, 1)) || lower(substr(event_type, 2)) || 'Value' AS camel
      FROM events)
"""

# ---------------------------------------------------------------------------
# q21 — exact dedup (hash-groupBy; self-union creates known duplicates)
# ---------------------------------------------------------------------------


def q21_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    dup = d.unionByName(d.filter(F.col("doc_id") % 5 == 0))  # deliberate dups
    return dup.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct(F.md5(F.col("text"))).cast("bigint").alias("n_unique_texts"),
    )


Q21_SQL = """
SELECT source, count(*)::BIGINT AS n_rows,
       count(DISTINCT md5(text))::BIGINT AS n_unique_texts
FROM (SELECT * FROM documents
      UNION ALL SELECT * FROM documents WHERE doc_id % 5 = 0)
GROUP BY source
"""

# ---------------------------------------------------------------------------
# q22 — MinHash + LSH near-duplicate pairs
#   shingle = word 3-gram; signature_j = min(md5(j||'|'||shingle));
#   band size 1 ⇒ candidate pair iff any signature position collides
# ---------------------------------------------------------------------------

_MINHASH_K = 4


def _shingles(d: DataFrame) -> DataFrame:
    # words materialized in their own projection: referencing the split
    # through a named column keeps CollapseProject from inlining the
    # split() into every lambda call site (an O(words²) blowup)
    dw = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    # when() guard: sequence(1, 0) is descending and slice start 0
    # throws — a <3-word doc must yield an empty shingle set, not abort.
    # Positions explode; the string builds ABOVE the Generate (whose
    # input re-evaluates per output element — the q52 trap).
    pos = F.when(F.size("w") >= 3, F.sequence(F.lit(1), F.size("w") - 2)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        dw.select("doc_id", "w", F.explode(pos).alias("i"))
        .select("doc_id", F.expr("concat_ws(' ', slice(w, i, 3))").alias("shingle"))
        .distinct()
    )


def q22_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = _shingles(d)
    # single-pass signatures: ONE groupBy computes all K mins (one
    # shuffle over the shingles instead of K), then posexplode fans the
    # signature row out to (band, sig) pairs for the bucket join
    sigrow = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"s{j}")
            for j in range(_MINHASH_K)
        ]
    )
    sigs = sigrow.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"s{j}") for j in range(_MINHASH_K)])).alias(
            "band", "sig"
        ),
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), F.col("band").alias("band_a"), F.col("sig").alias("s_a")
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("sig").alias("s_b")
    )
    pairs = (
        a.join(b, (F.col("s_a") == F.col("s_b")) & (F.col("band_a") == F.col("band_b")))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return pairs


Q22_SQL = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM docs),
shingles AS (
  SELECT DISTINCT doc_id,
         w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM words, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
sigs AS (
  SELECT doc_id, j AS band, min(md5(j || '|' || shingle)) AS sig
  FROM shingles, unnest(range(0, {_MINHASH_K})) AS u(j)
  GROUP BY doc_id, j)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""

# ---------------------------------------------------------------------------
# q23 — SimHash (16-bit) document fingerprints
#   bit b of token-hash = (hex digit b of md5 ≥ '8'); majority vote
# ---------------------------------------------------------------------------


def q23_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.length("tok") > 0).distinct()
    hashed = toks.withColumn("h", F.md5("tok"))
    bits = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.col("h").substr(F.col("b") + 1, F.lit(1)) >= "8", F.lit(1)).otherwise(
            F.lit(-1)
        ),
    )
    agg = bits.groupBy("doc_id", "b").agg(F.sum("vote").alias("v"))
    sim = agg.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") >= 0, F.expr("shiftleft(1, b)")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("simhash16")
    )
    return sim


Q23_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
    FROM documents WHERE doc_id < 100)
  WHERE length(tok) > 0),
bits AS (
  SELECT doc_id, b,
         CASE WHEN substr(md5(tok), b + 1, 1) >= '8' THEN 1 ELSE -1 END AS vote
  FROM toks, unnest(range(0, 16)) AS u(b)),
agg AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY doc_id, b)
SELECT doc_id,
       sum(CASE WHEN v >= 0 THEN 1 << b ELSE 0 END)::BIGINT AS simhash16
FROM agg GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# q24 — n-gram Jaccard near-dup scores (bounded pair set)
# ---------------------------------------------------------------------------


def q24_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> DataFrame:
    d = _guard_brute_force(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40),
        "q24_ngram_jaccard (all-pairs shingle join)",
        max_rows,
    )
    sh = _shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    jac = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= 0.02)
    )
    return jac.select(
        "doc_a", "doc_b", F.col("n_inter").cast("bigint").alias("n_inter"), "jaccard"
    )


Q24_SQL = """
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM docs),
shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM words, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter::BIGINT AS n_inter,
       round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 6) >= 0.02
"""

# ---------------------------------------------------------------------------
# q25 — brute-force cosine top-k neighbor search over embeddings
# ---------------------------------------------------------------------------


def q25_cosine_topk(
    spark: SparkSession, sf_dir: str, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> DataFrame:
    e = _guard_brute_force(
        _t(spark, sf_dir, "embeddings"),
        "q25_cosine_topk (brute-force crossJoin; q26/q39 are the scale tier)",
        max_rows,
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    dot = F.aggregate(
        F.zip_with("q_emb", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    sims = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn("sim", F.round(dot / (norm(F.col("q_emb")) * norm(F.col("c_emb"))), 6))
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        sims.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("q_id", "c_id", "sim", "rk")
    )


Q25_SQL = """
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS c_id, embedding AS c_emb FROM embeddings),
sims AS (
  SELECT q_id, c_id,
         round(
           list_sum(list_transform(range(1, 65), i -> q_emb[i]::DOUBLE * c_emb[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> q_emb[i]::DOUBLE * q_emb[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> c_emb[i]::DOUBLE * c_emb[i]::DOUBLE)))),
           6) AS sim
  FROM q, c WHERE q_id != c_id)
SELECT q_id, c_id, sim, rk FROM (
  SELECT q_id, c_id, sim,
         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id)::BIGINT AS rk
  FROM sims)
WHERE rk <= 3
"""

# ---------------------------------------------------------------------------
# q26 — LSH-style sign-bucket partitioning of the embedding space
# (the scale path for ANN: bucket once, search within bucket)
# ---------------------------------------------------------------------------

_BUCKET_DIMS = [1, 17, 33, 49]


def q26_embedding_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    bucket = None
    for k, j in enumerate(_BUCKET_DIMS):
        bit = F.when(F.element_at("embedding", j) > 0, F.lit(1 << k)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return (
        e.withColumn("bucket", bucket.cast("bigint"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.countDistinct("label").cast("bigint").alias("n_labels"),
        )
    )


Q26_SQL = f"""
SELECT bucket, count(*)::BIGINT AS n_vectors, count(DISTINCT label)::BIGINT AS n_labels
FROM (SELECT label,
             ({" + ".join(f"(CASE WHEN embedding[{j}] > 0 THEN {1 << k} ELSE 0 END)" for k, j in enumerate(_BUCKET_DIMS))})::BIGINT AS bucket
      FROM embeddings)
GROUP BY bucket
"""

# ---------------------------------------------------------------------------
# q27 — language-ID heuristic (diacritic + ascii-ratio n-gram-lite)
# ---------------------------------------------------------------------------

_VI_CHARS = "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợùúủũụưừứửữựỳýỷỹỵđ"


def q27_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_diac = F.length(low) - F.length(F.regexp_replace(low, f"[{_VI_CHARS}]", ""))
    n_ascii = F.length(low) - F.length(F.regexp_replace(low, "[a-z ]", ""))
    return d.select(
        "doc_id",
        "lang",
        n_diac.cast("bigint").alias("n_diacritics"),
        F.round(n_ascii / F.greatest(F.length(low), F.lit(1)), 6).alias("ascii_ratio"),
        F.when(n_diac > 0, F.lit("vi")).otherwise(F.lit("other")).alias("guess"),
    )


Q27_SQL = f"""
SELECT doc_id, lang,
       (length(lower(text)) - length(regexp_replace(lower(text), '[{_VI_CHARS}]', '', 'g')))::BIGINT AS n_diacritics,
       round((length(lower(text)) - length(regexp_replace(lower(text), '[a-z ]', '', 'g')))
             / greatest(length(lower(text)), 1), 6) AS ascii_ratio,
       CASE WHEN length(lower(text)) - length(regexp_replace(lower(text), '[{_VI_CHARS}]', '', 'g')) > 0
            THEN 'vi' ELSE 'other' END AS guess
FROM documents
"""

# ---------------------------------------------------------------------------
# q28 — quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to")


def q28_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.length(x) > 0)
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda x: F.lower(x).isin(*_STOPWORDS)))
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), r"[^\w\s]", "")
    )
    return d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio"),
        n_punct.cast("bigint").alias("n_punct"),
        F.round(F.col("n_chars") / F.greatest(n_words, F.lit(1)), 4).alias(
            "chars_per_word"
        ),
    )


Q28_SQL = f"""
SELECT doc_id, n_chars::BIGINT AS n_chars, n_words::BIGINT AS n_words,
       round(n_stop / greatest(n_words, 1), 6) AS stopword_ratio,
       n_punct::BIGINT AS n_punct,
       round(n_chars / greatest(n_words, 1), 4) AS chars_per_word
FROM (SELECT doc_id, n_chars,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> length(x) > 0)) AS n_words,
             len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> list_contains({list(_STOPWORDS)}, lower(x)))) AS n_stop,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
      FROM documents)
"""

# ---------------------------------------------------------------------------
# q29 — document fingerprinting (min-k of 5-gram hashes, winnowing-lite)
# ---------------------------------------------------------------------------


def q29_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # words in their own projection (see _shingles note) + fully
    # array-side min-4-of-hashes: no explode, no shuffle — each
    # document computes its fingerprint in place (15× over the window
    # formulation at sf0.1)
    dw = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w"))
    grams = F.when(
        F.size("w") >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - 4),
            lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    fp = F.array_join(
        F.slice(F.array_sort(F.array_distinct(F.transform(grams, F.md5))), 1, 4),
        ",",
    )
    return dw.select("doc_id", fp.alias("fingerprint"))


Q29_SQL = """
WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
grams AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(w) - 3, 1)),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) AS g
  FROM words)
SELECT doc_id,
       array_to_string(list_slice(list_sort(list_distinct(list_transform(g, x -> md5(x)))), 1, 4), ',') AS fingerprint
FROM grams
"""

# ---------------------------------------------------------------------------
# q30 — tumbling-window aggregation (streaming-equivalent batch form)
# ---------------------------------------------------------------------------


def q30_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00"))
        .filter(F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


Q30_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
       count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
FROM events WHERE ts < TIMESTAMP '2024-01-04'
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# q31 — distinct cardinalities (frontier-size metrics; exact twin of the
# approx_count_distinct the engine uses for monitoring)
# ---------------------------------------------------------------------------


def q31_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


Q31_SQL = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users, count(*)::BIGINT AS n_events
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# q32 — extraAttributes extraction (record<string,scalar> analog on props)
# ---------------------------------------------------------------------------


def q32_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.round(F.sum("k") / F.count(F.lit(1)), 4).alias("avg_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


Q32_SQL = """
SELECT event_type,
       round(sum(k) / count(*), 4) AS avg_k,
       max(k)::BIGINT AS max_k
FROM (SELECT event_type, regexp_extract(props, '"k":\\s*(\\d+)', 1)::BIGINT AS k FROM events)
GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_rollup": q01_pricing_rollup,
    "q02_topk_per_group": q02_topk_per_group,
    "q03_priority_order": q03_priority_order,
    "q04_first_wins_dedup": q04_first_wins_dedup,
    "q05_anti_join": q05_anti_join,
    "q06_broadcast_dim_join": q06_broadcast_dim_join,
    "q07_semi_join": q07_semi_join,
    "q08_union_distinct": q08_union_distinct,
    "q09_wordcount_topk": q09_wordcount_topk,
    "q10_rollup": q10_rollup,
    "q11_seq_numbering": q11_seq_numbering,
    "q12_date_ops": q12_date_ops,
    "q13_theta_join": q13_theta_join,
    "q14_latest_state": q14_latest_state,
    "q15_sessionize": q15_sessionize,
    "q16_running_sum": q16_running_sum,
    "q17_md_image_extract": q17_md_image_extract,
    "q18_md_cleanup": q18_md_cleanup,
    "q19_id_grammar": q19_id_grammar,
    "q20_key_rewrites": q20_key_rewrites,
    "q21_dedup_exact": q21_dedup_exact,
    "q22_minhash_lsh_pairs": q22_minhash_lsh_pairs,
    "q23_simhash": q23_simhash,
    "q24_ngram_jaccard": q24_ngram_jaccard,
    "q25_cosine_topk": q25_cosine_topk,
    "q26_embedding_buckets": q26_embedding_buckets,
    "q27_lang_id": q27_lang_id,
    "q28_quality_score": q28_quality_score,
    "q29_fingerprint": q29_fingerprint,
    "q30_hourly_windows": q30_hourly_windows,
    "q31_distinct_users": q31_distinct_users,
    "q32_props_extract": q32_props_extract,
}

ORACLE_SQL: dict[str, str] = {
    "q01_pricing_rollup": Q01_SQL,
    "q02_topk_per_group": Q02_SQL,
    "q03_priority_order": Q03_SQL,
    "q04_first_wins_dedup": Q04_SQL,
    "q05_anti_join": Q05_SQL,
    "q06_broadcast_dim_join": Q06_SQL,
    "q07_semi_join": Q07_SQL,
    "q08_union_distinct": Q08_SQL,
    "q09_wordcount_topk": Q09_SQL,
    "q10_rollup": Q10_SQL,
    "q11_seq_numbering": Q11_SQL,
    "q12_date_ops": Q12_SQL,
    "q13_theta_join": Q13_SQL,
    "q14_latest_state": Q14_SQL,
    "q15_sessionize": Q15_SQL,
    "q16_running_sum": Q16_SQL,
    "q17_md_image_extract": Q17_SQL,
    "q18_md_cleanup": Q18_SQL,
    "q19_id_grammar": Q19_SQL,
    "q20_key_rewrites": Q20_SQL,
    "q21_dedup_exact": Q21_SQL,
    "q22_minhash_lsh_pairs": Q22_SQL,
    "q23_simhash": Q23_SQL,
    "q24_ngram_jaccard": Q24_SQL,
    "q25_cosine_topk": Q25_SQL,
    "q26_embedding_buckets": Q26_SQL,
    "q27_lang_id": Q27_SQL,
    "q28_quality_score": Q28_SQL,
    "q29_fingerprint": Q29_SQL,
    "q30_hourly_windows": Q30_SQL,
    "q31_distinct_users": Q31_SQL,
    "q32_props_extract": Q32_SQL,
}

# ---------------------------------------------------------------------------
# q33 — cube / grouping sets (A4 rollup generalized)
# ---------------------------------------------------------------------------


def q33_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


Q33_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

# ---------------------------------------------------------------------------
# q34 — exact percentiles per group (continuous interpolation)
# ---------------------------------------------------------------------------


def q34_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


Q34_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# q35 — conditional pivot (CASE aggregation into columns)
# ---------------------------------------------------------------------------


def q35_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    cohort = (F.col("user_id") % 10).cast("bigint")
    return (
        e.withColumn("cohort", cohort)
        .groupBy("cohort")
        .agg(
            F.round(F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0)), 2).alias("view_value"),
            F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 2).alias("purchase_value"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).cast("bigint").alias("n_clicks"),
        )
    )


Q35_SQL = """
SELECT (user_id % 10)::BIGINT AS cohort,
       round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 2) AS view_value,
       round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_value,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_clicks
FROM events GROUP BY 1
"""

# ---------------------------------------------------------------------------
# q36 — correlated aggregate subquery, decorrelated (TPC-H Q17 shape)
# ---------------------------------------------------------------------------


def q36_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 1000)
    avg = li.groupBy("l_partkey").agg((F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"))
    j = li.join(avg, "l_partkey").filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_small"),
        F.round(F.sum("l_extendedprice"), 2).alias("small_revenue"),
    )


Q36_SQL = """
SELECT count(*)::BIGINT AS n_small, round(sum(l_extendedprice), 2) AS small_revenue
FROM lineitem l
WHERE l_partkey < 1000
  AND l_quantity < 0.5 * (SELECT sum(l_quantity) / count(*) FROM lineitem
                          WHERE l_partkey = l.l_partkey AND l_partkey < 1000)
"""

# ---------------------------------------------------------------------------
# q37 — token counting (whitespace words + BPE-ish regex tokens)
# ---------------------------------------------------------------------------

_TOK_PAT = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def q37_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_tokens = F.size(F.regexp_extract_all(low, F.lit(_TOK_PAT), F.lit(0)))
    n_words = F.size(F.filter(F.split(F.trim(low), r"\s+"), lambda x: F.length(x) > 0))
    return (
        d.withColumn("n_tokens", n_tokens)
        .withColumn("n_words", n_words)
        .groupBy("source")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.round(F.sum("n_tokens") / F.sum("n_words"), 4).alias("tokens_per_word"),
        )
    )


Q37_SQL = f"""
SELECT source,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(n_words)::BIGINT AS total_words,
       round(sum(n_tokens) / sum(n_words), 4) AS tokens_per_word
FROM (SELECT source,
             len(regexp_extract_all(lower(text), '{_TOK_PAT}')) AS n_tokens,
             len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             x -> length(x) > 0)) AS n_words
      FROM documents)
GROUP BY source
"""

# ---------------------------------------------------------------------------
# q38 — embedding-cosine near-duplicate pairs (threshold filter)
# ---------------------------------------------------------------------------


def q38_embedding_near_dup(
    spark: SparkSession, sf_dir: str, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> DataFrame:
    e = _guard_brute_force(
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150),
        "q38_embedding_near_dup (brute-force crossJoin; q26/q39 are the scale tier)",
        max_rows,
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("e_a"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("e_b"))
    dot = F.aggregate(
        F.zip_with("e_a", "e_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(dot / (nrm(F.col("e_a")) * nrm(F.col("e_b"))), 6))
        .filter(F.col("sim") >= 0.35)
        .select("id_a", "id_b", "sim")
    )


Q38_SQL = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
         6) AS sim
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(
        list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
        6) >= 0.35
"""

# ---------------------------------------------------------------------------
# q39 — IVF-style ANN: assign vectors to nearest of K centroids, then
# report per-cell occupancy (the bucket-then-search scale path; q26 is
# the LSH sibling)
# ---------------------------------------------------------------------------


def q39_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("c_emb")
    )
    vecs = e.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 600)).select(
        "vec_id", "embedding"
    )
    dot = F.aggregate(
        F.zip_with("embedding", "c_emb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "sim", F.round(dot / (nrm(F.col("embedding")) * nrm(F.col("c_emb"))), 6)
    )
    # best-centroid pick is a partial-aggregable max(struct), NOT a
    # row_number window: the window's sort-based exchange keyed on
    # vec_id is pure waste at 10^9 vectors (VERDICT r3). Struct order
    # (sim DESC, centroid_id ASC) == max of (sim, -centroid_id).
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.max(
                F.struct(F.col("sim"), (-F.col("centroid_id")).alias("neg_cid"))
            ).alias("best")
        )
        .select(
            F.col("best.sim").alias("sim"),
            (-F.col("best.neg_cid")).alias("centroid_id"),
        )
    )
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
        F.round(F.sum("sim") / F.count(F.lit(1)), 6).alias("avg_sim"),
    )


Q39_SQL = """
WITH cents AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings WHERE vec_id < 8),
vecs AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8 AND vec_id < 600),
scored AS (
  SELECT v.vec_id, c.centroid_id,
         round(
           list_sum(list_transform(range(1, 65), i -> v.embedding[i]::DOUBLE * c.c_emb[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, 65), i -> c.c_emb[i]::DOUBLE * c.c_emb[i]::DOUBLE)))),
           6) AS sim
  FROM vecs v, cents c),
assigned AS (
  SELECT vec_id, centroid_id, sim,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rk
  FROM scored)
SELECT centroid_id, count(*)::BIGINT AS n_assigned,
       round(sum(sim) / count(*), 6) AS avg_sim
FROM assigned WHERE rk = 1 GROUP BY centroid_id
"""

# ---------------------------------------------------------------------------
# q40 — as-of join (latest view at-or-before each purchase, per user)
# via the union+sort+forward-fill operator (no range explosion)
# ---------------------------------------------------------------------------


def q40_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_event_id"), "ts"
    )
    j = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        suffix="_v", tiebreak="view_event_id",
    )
    return j.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("view_event_id_v").alias("view_event_id"),
        F.date_format("ts_v", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


Q40_SQL = """
WITH purchases AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase' AND user_id < 100),
views AS (
  SELECT user_id, event_id AS view_event_id, ts FROM events WHERE event_type = 'view' AND user_id < 100),
ranked AS (
  SELECT p.user_id, p.event_id,
         strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
         v.view_event_id,
         strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY v.ts DESC, v.view_event_id DESC) AS rn
  FROM purchases p LEFT JOIN views v
    ON p.user_id = v.user_id AND v.ts <= p.ts)
SELECT user_id, event_id, purchase_ts, view_event_id, view_ts
FROM ranked WHERE rn = 1 OR rn IS NULL
"""

# ---------------------------------------------------------------------------
# q41 — range join via time-bucketing (equi-join + residual, not
# nested-loop): purchases within 30 min after a view, same user
# ---------------------------------------------------------------------------


def q41_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.operators.joins import range_join_bucketed

    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts_a")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("ts_b")
    )
    pairs = range_join_bucketed(
        views, purchases, on=["user_id"], left_ts="ts_a", right_ts="ts_b", width_s=1800
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view_purchase_pairs")
    )


Q41_SQL = """
SELECT v.user_id, count(*)::BIGINT AS n_view_purchase_pairs
FROM (SELECT user_id, ts FROM events WHERE event_type = 'view' AND user_id < 50) v
JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase' AND user_id < 50) p
  ON v.user_id = p.user_id
 AND p.ts > v.ts
 AND date_diff('second', v.ts, p.ts) <= 1800
GROUP BY v.user_id
"""

# ---------------------------------------------------------------------------
# q42 — sliding windows (1 h window, 30 min slide) — Spark's built-in
# window() vs the explicit two-bucket expansion in SQL
# ---------------------------------------------------------------------------


def q42_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-03").cast("timestamp")
    )
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
        )
    )


Q42_SQL = """
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type, count(*)::BIGINT AS n
FROM (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, event_type
  FROM events WHERE ts < TIMESTAMP '2024-01-03'
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, event_type
  FROM events WHERE ts < TIMESTAMP '2024-01-03')
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# q43 — approximate distinct via the repo's OWN deterministic HLL
# sketch (r4). Engine-native approx_count_distinct sketches differ
# between engines, which forced a rows-only driver check through r3;
# this formulation computes the HyperLogLog registers from md5 hashes
# with pure string/integer SQL that evaluates IDENTICALLY in Spark and
# DuckDB (p=8 → 256 buckets from the first 2 hex digits; rho = 25 -
# bit_length of the next 24 hash bits via `trim(LEADING '0' FROM
# bin(v))` — same semantics both engines), so the estimate — and the
# raw register digests — hash-match exactly. Cross-engine determinism
# rules the formulation: every float op is IEEE +,×,/ on doubles
# (Spark decimal-literal arithmetic is cast away), and the
# LinearCounting small-range correction's ln(m/zeros) — whose last-ulp
# libm behavior would differ between the JVM and DuckDB — is a
# 256-entry constant table computed ONCE in Python and embedded in
# both SQL texts. Exact count and relative error ride along, so the
# driver row also verifies the sketch's accuracy at each sf. The
# engine's frontier monitoring keeps Spark's native
# approx_count_distinct; this is its value-checked twin.
# ---------------------------------------------------------------------------

# portable SQL fragments (identical text runs in Spark SQL and DuckDB)
_HLL_HEX = "(instr('0123456789abcdef', substr(h, {i}, 1)) - 1)"
_HLL_BUCKET = f"({_HLL_HEX.format(i=1)} * 16 + {_HLL_HEX.format(i=2)})"
_HLL_V24 = "(" + " + ".join(
    f"{_HLL_HEX.format(i=i)} * {16 ** (8 - i)}" for i in range(3, 9)
) + ")"
_HLL_RHO = f"(25 - length(trim(LEADING '0' FROM bin({_HLL_V24}))))"
_HLL_ALPHA_M2 = "(cast(0.7213 AS double) / (1 + cast(1.079 AS double) / 256)) * 65536"
# 256 * ln(256/zeros) for zeros = 1..256, pinned in Python
_HLL_LN = "__LN__"
_HLL_RAW = (
    f"({_HLL_ALPHA_M2} / "
    "((sum_present + (256 - n_present) * 16777216) / 16777216.0))"
)


def _hll_est_sql(ln_array: str) -> str:
    """Raw HLL with the table-driven LinearCounting branch (E ≤ 2.5m
    and zero registers present → m·ln(m/zeros))."""
    zeros = "(256 - n_present)"
    return (
        f"CASE WHEN {_HLL_RAW} <= 640 AND {zeros} > 0 "
        f"THEN {ln_array} ELSE {_HLL_RAW} END"
    )


def q43_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    hashed = e.select(
        "event_type", F.expr("md5(cast(user_id AS string))").alias("h")
    )
    regs = (
        hashed.select(
            "event_type",
            F.expr(_HLL_BUCKET).alias("bucket"),
            F.expr(_HLL_RHO).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    per_type = regs.groupBy("event_type").agg(
        F.sum(F.expr("cast(round(pow(2, 24 - m)) AS bigint)")).alias("sum_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    ln_arr = (
        f"element_at(cast(array({_HLL_LN}) AS array<double>), "
        "cast(256 - n_present AS int))"
    )
    est_sql = _hll_est_sql(ln_arr).replace(_HLL_LN, _HLL_LN_CONSTS)
    exact = _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            (F.col("sum_present") + (256 - F.col("n_present")) * 16777216)
            .cast("bigint")
            .alias("hll_sum"),
            (256 - F.col("n_present")).cast("bigint").alias("hll_zero_regs"),
            F.expr(f"round({est_sql}, 2)").alias("hll_est"),
            "exact_users",
            F.expr(f"round(abs({est_sql} - exact_users) / exact_users, 3)").alias(
                "rel_err"
            ),
        )
    )


_HLL_LN_CONSTS = "1419.565425786768, 1242.119747563422, 1138.3206798877318, 1064.674069340076, 1007.5493202036383, 960.8750016643859, 921.4124276286078, 887.22839111673, 857.0759339886959, 830.1036419802923, 805.7042359503852, 783.4293234410399, 762.9383902766147, 743.9667494052618, 726.3045743046022, 709.782712893384, 694.2628097083767, 679.6302557653498, 665.7890471201592, 652.6579637569463, 640.1676817295717, 628.2585577270391, 616.8789065089056, 605.983645217694, 595.5332146205086, 585.4927120532686, 575.8311880896597, 566.5210711819158, 557.5376933102307, 548.8588960812563, 540.4647014385705, 532.337034670038, 524.459490051349, 516.8171314850307, 509.3963220454781, 502.1845775420038, 495.17044014984657, 488.3433688968132, 481.6936443775785, 475.2122855336003, 468.8909767104652, 462.7220035062257, 456.69819616921603, 450.8128795036931, 445.0598284055661, 439.43322828555966, 433.927639748993, 428.5379669943479, 423.25942947044757, 418.0875363971626, 413.0180638093406, 408.0470338299226, 403.1706959174248, 398.3855098663137, 393.68813036725544, 389.07539295856975, 384.54430122112313, 380.09201508688466, 375.7158401469038, 371.41321785791024, 367.18171655840035, 363.01902321522454, 358.9229358305356, 354.891356446692, 350.9222846934849, 347.01381182800304, 343.16411522268066, 339.3714532616847, 335.6341606098696, 331.95064382213206, 328.31937726419125, 324.73889931865784, 321.20780885277986, 317.72476192650055, 314.28846872147255, 310.8976906734672, 307.5512377922249, 304.2479661542325, 300.9867755552105, 297.7666073102543, 294.58644219062364, 291.4452984871192, 288.34223019083896, 285.27632528287967, 282.246704125247, 279.25251794587, 276.2929474111946, 273.36720128034716, 270.4745151353402, 267.61415018222016, 264.7853921184544, 261.98755006221364, 259.2199555395345, 256.48196152564697, 253.77294153702954, 251.0922887710019, 248.43941528990197, 245.81375124710155, 243.214744152313, 240.64185817381662, 238.09457347540558, 235.5723855859946, 233.07480479998122, 230.60135560657662, 228.15157614644204, 225.7250176940788, 223.32124416451998, 220.93983164296773, 218.58036793610722, 216.24245214390942, 213.92569425081047, 211.62971473522379, 209.3541441964088, 207.09862299777714, 204.86280092577599, 202.64633686353864, 200.44889847854245, 198.27016192355782, 196.10981155021645, 193.96753963456422, 191.84304611400228, 189.73603833505433, 187.64623081142915, 185.57334499187854, 183.5171090373789, 181.4772576071896, 179.45353165336863, 177.445678223346, 175.45345027017993, 173.4766064701389, 171.5149110472732, 169.56813360465705, 167.63604896199902, 165.71843699933467, 163.81508250653008, 161.92577503833868, 160.050308774768, 158.1884823865236, 156.34009890531092, 154.50496559878607, 152.6828938499569, 150.87369904084525, 149.07720044023174, 147.29322109531182, 145.52158772710095, 143.76213062943384, 142.0146835714115, 140.27908370315455, 138.55517146473045, 136.84279049812653, 135.14178756214736, 133.45201245012123, 131.7733179103045, 130.10555956887896, 128.44859585544086, 126.80228793088651, 125.16649961760115, 123.54109733186449, 121.92595001838873, 120.32092908690832, 118.72590835074546, 117.14076396727765, 115.56537438023685, 113.99962026377321, 112.44338446821936, 110.89655196749294, 109.3590098080787, 107.83064705953369, 106.31135476646118, 104.80102590190099, 103.29955532208706, 101.80683972252402, 100.32277759533658, 98.84726918784855, 97.3802164623484, 95.92152305700114, 94.47109424786774, 93.02883691199419, 91.59465949153473, 90.16847195887415, 88.75018578271658, 87.3397138951084, 85.93697065936423, 84.54187183886766, 83.15433456671686, 81.77427731618849, 80.4016198719938, 79.03628330230099, 77.67818993149953, 76.32726331368353, 74.98342820683077, 73.6466105476559, 72.3167374271173, 70.993737066556, 69.67753879444881, 68.36807302375556, 67.06527122984292, 65.769065928967, 64.47939065729794, 63.19617995047061, 61.919369323644595, 60.64889525205958, 59.38469515207044, 58.126707362648595, 56.8748711273355, 55.629126576635215, 54.3894147108335, 53.1556773832306, 51.92785728377637, 50.70589792309603, 49.48974361689499, 48.27933947073279, 47.07463136515517, 45.875565941173996, 44.68209058608631, 43.49415341962174, 42.31170328041035, 41.13468971276122, 39.96306295374377, 38.796773920563425, 37.635774198223295, 36.48001602746445, 35.329452292977585, 34.18403651187778, 33.04372282243644, 31.908465973062807, 30.77822131152893, 29.65294477443114, 28.53259287688263, 27.41712270242998, 26.30649189318885, 25.200658640192643, 24.09958167394865, 23.003220255196453, 21.911534165863305, 20.824483700211815, 19.742029656174388, 18.66413332687046, 17.590756492301242, 16.521861411218218, 15.457410813160315, 14.397367890656284, 13.34169629158761, 12.29036011170833, 11.243323887317908, 10.200552588083143, 9.162011610005834, 8.12766676853255, 7.097484291802821, 6.0714308140329125, 5.049473369031315, 4.031579383843613, 3.017716672522796, 2.007853430022625, 1.0019582262108966, 0.0"

_Q43_DUCK_LN = (
    "((["
    + _HLL_LN_CONSTS
    + "])::DOUBLE[])[256 - n_present]"
)
_Q43_EST = _hll_est_sql(_HLL_LN).replace(_HLL_LN, _Q43_DUCK_LN)

Q43_SQL = f"""
WITH hashed AS (
  SELECT event_type, md5(user_id::VARCHAR) AS h FROM events),
regs AS (
  SELECT event_type, {_HLL_BUCKET} AS bucket, max({_HLL_RHO}) AS m
  FROM hashed GROUP BY 1, 2),
per_type AS (
  SELECT event_type,
         sum(cast(round(pow(2, 24 - m)) AS BIGINT)) AS sum_present,
         count(*) AS n_present
  FROM regs GROUP BY 1),
exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users
  FROM events GROUP BY 1)
SELECT p.event_type,
       (sum_present + (256 - n_present) * 16777216)::BIGINT AS hll_sum,
       (256 - n_present)::BIGINT AS hll_zero_regs,
       round({_Q43_EST}, 2) AS hll_est,
       exact_users,
       round(abs({_Q43_EST} - exact_users) / exact_users, 3) AS rel_err
FROM per_type p JOIN exact USING (event_type)
"""


QUERIES.update(
    {
        "q33_cube": q33_cube,
        "q34_percentiles": q34_percentiles,
        "q35_conditional_pivot": q35_conditional_pivot,
        "q36_correlated_avg": q36_correlated_avg,
        "q37_token_count": q37_token_count,
        "q38_embedding_near_dup": q38_embedding_near_dup,
        "q39_ivf_cells": q39_ivf_cells,
        "q40_asof_join": q40_asof_join,
        "q41_range_join": q41_range_join,
        "q42_sliding_windows": q42_sliding_windows,
        "q43_approx_distinct": q43_approx_distinct,
    }
)

ORACLE_SQL.update(
    {
        "q33_cube": Q33_SQL,
        "q34_percentiles": Q34_SQL,
        "q35_conditional_pivot": Q35_SQL,
        "q36_correlated_avg": Q36_SQL,
        "q37_token_count": Q37_SQL,
        "q38_embedding_near_dup": Q38_SQL,
        "q39_ivf_cells": Q39_SQL,
        "q40_asof_join": Q40_SQL,
        "q41_range_join": Q41_SQL,
        "q42_sliding_windows": Q42_SQL,
        "q43_approx_distinct": Q43_SQL,  # r4: own deterministic HLL
    }
)

# ---------------------------------------------------------------------------
# q44 — salted two-stage aggregation (skew-breaking pattern the frontier
# uses for dominant hosts: partial agg on (key, salt), final on key —
# the hot key's rows spread over 16 reducers instead of one)
# ---------------------------------------------------------------------------

_N_AGG_SALTS = 16


def q44_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(_N_AGG_SALTS)).alias("salt")
    partial = e.groupBy("event_type", salt).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("value").alias("vsum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.round(F.sum("vsum"), 2).alias("total_value"),
        F.round(F.sum("vsum") / F.sum("cnt"), 6).alias("avg_value"),
    )


Q44_SQL = """
SELECT event_type, count(*)::BIGINT AS n_events,
       round(sum(value), 2) AS total_value,
       round(sum(value) / count(*), 6) AS avg_value
FROM events GROUP BY event_type
"""

QUERIES["q44_salted_agg"] = q44_salted_agg
ORACLE_SQL["q44_salted_agg"] = Q44_SQL

# ---------------------------------------------------------------------------
# q45 — FULL reference cleanup chain incl. C5 normalizeAsterisk
# (mdUtils.ts:93-110) and C11 stripSymbols (mdUtils.ts:222-236), in the
# standard order of thanhlinh.net/getPageContent.ts:64-78 plus the
# post-split symbol strip (augustino.net/getPageContent.ts:192).
# The engine side runs cleanup_md_col (JVM regexp chain + the Arrow-
# batched normalizeAsterisk twin) and strip_symbols_col; the oracle
# replicates every step in RE2. The constructed markdown keeps emphasis
# words ≥2 chars so normalizeAsterisk stays on its SQL-expressible path
# (the trailing-*/space right-pad callback path is regexp-inexpressible;
# its parity is pinned by node-generated goldens in
# tests/test_text_functions.py).
# ---------------------------------------------------------------------------


def q45_full_cleanup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.functions.text import cleanup_md_col, strip_symbols_col

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    w = F.split(F.col("text"), " ")
    md = F.concat(
        F.lit("# Đề mục\n```js\nvar x = 1;\n```\n"),
        F.lit("“Trích” ![hình](http://x/i.png) xem [chú thích](http://y) với `mã nguồn` rồi ** "),
        w[1],
        F.lit("q **\nvà *** "),
        w[2],
        F.lit("q *** hết\n1."),
        w[3],
        F.lit("\n- mục * "),
        w[4],
        F.lit("q *\n> \"trích\" cuối"),
    )
    out = d.select("doc_id", cleanup_md_col(md).alias("cleaned"))
    return out.select("doc_id", "cleaned", strip_symbols_col(F.col("cleaned")).alias("stripped"))


Q45_SQL = r"""
WITH src AS (
  SELECT doc_id,
         '# Đề mục' || chr(10) || '```js' || chr(10) || 'var x = 1;' || chr(10) || '```' || chr(10) ||
         '“Trích” ![hình](http://x/i.png) xem [chú thích](http://y) với `mã nguồn` rồi ** ' || split_part(text,' ',2) || 'q **' || chr(10) ||
         'và *** ' || split_part(text,' ',3) || 'q *** hết' || chr(10) ||
         '1.' || split_part(text,' ',4) || chr(10) ||
         '- mục * ' || split_part(text,' ',5) || 'q *' || chr(10) ||
         '> "trích" cuối' AS md
  FROM documents WHERE doc_id < 100
), s1 AS (  -- removeMdImgs, removeMdLinks, removeMdHr
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(md,
    '!\[([^\]]*)\]\(([^)]*)\)', '', 'g'),
    '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
    '(?m)^[ \t]*(-{3,}|\*{3,}|_{3,})[ \t]*$', '', 'g') AS t
  FROM src
), s2 AS (  -- normalizeAsterisk: *** then ** then * (homogeneous form)
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(t,
    '(\*\*\*) *([^*_\n][^\n]*?[^*_\n]?) *\*\*\*', '***\2***', 'g'),
    '(\*\*) *([^*_\n][^\n]*?[^*_\n]?) *\*\*', '**\2**', 'g'),
    '(\*) *([^*_\n][^\n]*?[^*_\n]?) *\*', '*\2*', 'g') AS t
  FROM s1
), s3 AS (  -- quotes, numberBullet, normalizeMd, redundantSpaces, trim
  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        replace(replace(replace(replace(t, '“','"'), '”','"'), '‘',''''), '’',''''),
        '(?m)^(\d+)\.[ \t]*', '\1. ', 'g'),
      '(?m)^[ \t]+', '', 'g'),
      '(?m)^#+[ \t]*$', '', 'g'),
      '\\' || chr(10), chr(10) || chr(10), 'g'),
      '\n{3,}', chr(10) || chr(10), 'g'),
    '"\s+([^"]*?)\s+"', '"\1"', 'g'),
    '\(\s+([^)]*?)\s+\)', '(\1)', 'g'),
    '\[\s+([^\]]*?)\s+\]', '[\1]', 'g'),
    '^\s+|\s+$', '', 'g') AS cleaned
  FROM s2
)
SELECT doc_id, cleaned,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(cleaned,
    '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
    '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
    '\\`', chr(2), 'g'),
    '(?m)^```[^\n]*$', '', 'g'),
    '``([^`\n]+(?:`[^`\n]+)*)``', '\1', 'g'),
    '`([^`\n]+)`', '\1', 'g'),
    '(?m)^#{1,6}[ \t]+', '', 'g'),
    '(?m)^(?:> ?)+', '', 'g'),
    '(?m)^[ \t]*(-{3,}|\*{3,}|_{3,})[ \t]*$', '', 'g'),
    '(?m)^\\?[*-] *', '', 'g'),
    '\\\[', '[', 'g'),
    '\\\]', ']', 'g'),
    chr(2), '`', 'g'),
    '["''*_~\\]', '', 'g') AS stripped
FROM s3
"""

QUERIES["q45_full_cleanup_chain"] = q45_full_cleanup_chain
ORACLE_SQL["q45_full_cleanup_chain"] = Q45_SQL

# ---------------------------------------------------------------------------
# q46 — C22 verse-number tokens + O9 exact running verse-order track
# (augustino.net/getPageContentDaily.ts:26-110). The engine side is the
# chapter-sequential pandas UDF (functions/verses.py, node-golden-
# pinned); the oracle replicates the whole pipeline in RE2 SQL: verse
# split via a sentinel-prefix (RE2 has no lookahead), the running
# inherited number via last_value IGNORE NULLS, and the reset-on-change
# sub-index via gaps-and-islands (the initial island keeps the quirky
# +1 because the track starts at number=0 and equality increments).
# ---------------------------------------------------------------------------


def q46_verse_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.functions.verses import verses_col

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    w = F.split(F.col("text"), " ")
    k = (F.col("doc_id") % 5 + 3).cast("string")
    md = F.concat(
        F.lit("$1$ "), w[1], F.lit(" $2$ "), w[2], F.lit(" $2a$ "), w[3],
        F.lit(" $ $ "), w[4], F.lit(".\nHai $"), k, F.lit("-9$ "), w[5],
        F.lit(" [note] xong $"), k, F.lit("b$ cuối"),
    )
    rows = d.select("doc_id", F.inline(verses_col(md)))
    return rows.select(
        "doc_id", "paragraph_number", "paragraph_index",
        "number", "sub_verse_index", "label", "text",
    )


Q46_SQL = r"""
WITH src AS (
  SELECT doc_id,
    '$1$ ' || split_part(text,' ',2) || ' $2$ ' || split_part(text,' ',3) ||
    ' $2a$ ' || split_part(text,' ',4) || ' $ $ ' || split_part(text,' ',5) || '.' || chr(10) ||
    'Hai $' || (doc_id % 5 + 3) || '-9$ ' || split_part(text,' ',6) ||
    ' [note] xong $' || (doc_id % 5 + 3) || 'b$ cuối' AS md
  FROM documents WHERE doc_id < 60
), paras AS (
  SELECT doc_id,
         unnest(string_split(md, chr(10))) AS para,
         unnest(generate_series(1, len(string_split(md, chr(10))))) AS p1
  FROM src
), plist AS (
  SELECT doc_id, para, p1 - 1 AS p_idx FROM paras
  WHERE regexp_replace(para, '^\s+|\s+$', '', 'g') <> ''
), vsplit AS (
  SELECT doc_id, p_idx,
    CASE WHEN vl[1] = '' THEN vl[2:] ELSE vl END AS vl
  FROM (
    SELECT doc_id, p_idx,
      string_split(
        regexp_replace(para, '(\$(?:\d+\p{L}*| )(?:-\d+\p{L}*)?\$)', chr(1) || '\1', 'g'),
        chr(1)) AS vl
    FROM plist)
), verses AS (
  SELECT doc_id, p_idx,
         unnest(vl) AS verse,
         unnest(generate_series(1, len(vl))) - 1 AS v_idx
  FROM vsplit
), tok AS (
  SELECT doc_id, p_idx, v_idx, verse,
    regexp_extract(verse, '\$((?:\d+\p{L}*| )(?:-\d+\p{L}*)?)\$', 1) AS label_or_empty,
    regexp_extract(verse, '\$(\d+)', 1) AS n_str
  FROM verses
), resolved AS (
  SELECT *, coalesce(last_value(CASE WHEN n_str = '' THEN NULL ELSE n_str::INT END IGNORE NULLS)
            OVER (PARTITION BY doc_id ORDER BY p_idx, v_idx ROWS UNBOUNDED PRECEDING), 0) AS number
  FROM tok
), chg AS (
  SELECT *, CASE WHEN number <> coalesce(lag(number) OVER (PARTITION BY doc_id ORDER BY p_idx, v_idx), 0)
            THEN 1 ELSE 0 END AS changed
  FROM resolved
), grp AS (
  SELECT *, sum(changed) OVER (PARTITION BY doc_id ORDER BY p_idx, v_idx ROWS UNBOUNDED PRECEDING) AS g
  FROM chg
)
SELECT doc_id,
       p_idx::INT AS paragraph_number,
       v_idx::INT AS paragraph_index,
       number::INT AS number,
       (row_number() OVER (PARTITION BY doc_id, g ORDER BY p_idx, v_idx)
        - CASE WHEN g = 0 THEN 0 ELSE 1 END)::INT AS sub_verse_index,
       label_or_empty AS label,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(verse, '\$(?:\d+\p{L}*| )(?:-\d+\p{L}*)?\$', '', 'g'),
             '^\s+|\s+$', '', 'g'),
           '\\?\\?\[[a-zA-Z0-9@]+\]', '', 'g'),
         '^\s+|\s+$', '', 'g') AS text
FROM grp
"""

QUERIES["q46_verse_tracking"] = q46_verse_tracking
ORACLE_SQL["q46_verse_tracking"] = Q46_SQL

# ---------------------------------------------------------------------------
# q47 — pHash near-duplicate pairs: the banded-LSH operator vs a
# BRUTE-FORCE oracle. The Spark side runs near_duplicate_images
# (guaranteed-recall banding, n_bands > max_hamming); the DuckDB side
# enumerates ALL pairs with bit_count(xor) <= 7. Value equality is a
# per-round PROOF of the pigeonhole recall guarantee on live data (the
# r1 banding bug would fail this row). Input phashes are deterministic
# arithmetic over doc_id (same expression both engines): a base hash
# per doc plus a copy perturbed in <= 3 bit positions.
# ---------------------------------------------------------------------------


def q47_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.operators.images_pipeline import near_duplicate_images

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    iid = F.concat(F.lit("img"), F.lpad(F.col("doc_id").cast("string"), 4, "0"))
    base_hash = (F.col("doc_id") * F.lit(25214903917) + F.lit(11)).cast("bigint")
    # python F.shiftleft needs a literal bit count; the SQL form takes
    # column operands
    mask = F.expr(
        "shiftleft(1L, cast(doc_id % 61 as int)) "
        "| shiftleft(1L, cast((doc_id * 7) % 59 + 1 as int)) "
        "| shiftleft(1L, cast((doc_id * 13) % 53 + 2 as int))"
    )
    orig = d.select(iid.alias("image_id"), base_hash.alias("phash"))
    pert = d.select(
        F.concat(iid, F.lit("_v2")).alias("image_id"),
        base_hash.bitwiseXOR(mask).alias("phash"),
    )
    imgs = orig.unionByName(pert)
    pairs = near_duplicate_images(imgs, max_hamming=7)
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )


Q47_SQL = """
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < 100),
imgs AS (
  SELECT 'img' || lpad(doc_id::VARCHAR, 4, '0') AS image_id,
         (doc_id * 25214903917 + 11)::BIGINT AS phash
  FROM docs
  UNION ALL
  SELECT 'img' || lpad(doc_id::VARCHAR, 4, '0') || '_v2' AS image_id,
         xor((doc_id * 25214903917 + 11)::BIGINT,
             (1::BIGINT << (doc_id % 61)::INT)
             | (1::BIGINT << ((doc_id * 7) % 59 + 1)::INT)
             | (1::BIGINT << ((doc_id * 13) % 53 + 2)::INT)) AS phash
  FROM docs)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       bit_count(xor(a.phash, b.phash))::INT AS hamming
FROM imgs a JOIN imgs b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 7
"""

QUERIES["q47_phash_near_dup"] = q47_phash_near_dup
ORACLE_SQL["q47_phash_near_dup"] = Q47_SQL

# ---------------------------------------------------------------------------
# q48 — the PRODUCTION MinHash operator (operators/similarity.py, k=128,
# b=32, r=4) vs a brute-force DuckDB oracle (VERDICT r2 #3: only the toy
# k=4 shape had a correctness row). Near-dup docs are planted
# deterministically with SQL expressible both engines: each doc gets a
# twin with 5 appended words, so planted-pair Jaccard is m/(m+7) ≈ 0.93
# on 3-gram shingles. At (k=128, b=32, r=4) the S-curve miss
# probability at s=0.93 is (1 - 0.93^4)^32 ≈ 2e-22 and the hashes are
# deterministic, so the LSH tier MUST surface every pair the oracle's
# all-pairs scan finds at the 0.7 exact-Jaccard cut; the exact-verify
# tier then reproduces the oracle's scores bit-for-bit. A value match
# here is a per-round recall + precision proof of the operator a
# 100 TB sweep would run.
# ---------------------------------------------------------------------------


def q48_minhash_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.operators.similarity import (
        exact_jaccard_pairs,
        minhash_pairs,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    ids = F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 4, "0"))
    orig = d.select(ids.alias("doc_id"), "text")
    near = d.select(
        F.concat(ids, F.lit("_n")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz1 zz2 zz3 zz4 zz5")).alias("text"),
    )
    docs = orig.unionByName(near)
    cand = minhash_pairs(
        docs, "doc_id", "text", k=128, bands=32, min_est_jaccard=0.5
    )
    verified = exact_jaccard_pairs(
        docs, "doc_id", "text", cand.select("doc_a", "doc_b")
    )
    return verified.filter(F.col("jaccard") >= 0.7).select(
        "doc_a", "doc_b", "jaccard"
    )


Q48_SQL = r"""
WITH docs0 AS (SELECT doc_id, text FROM documents WHERE doc_id < 40),
docs AS (
  SELECT 'd' || lpad(doc_id::VARCHAR, 4, '0') AS doc_id, text FROM docs0
  UNION ALL
  SELECT 'd' || lpad(doc_id::VARCHAR, 4, '0') || '_n' AS doc_id,
         text || ' zz1 zz2 zz3 zz4 zz5' AS text
  FROM docs0),
words AS (
  SELECT doc_id,
         regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+') AS w
  FROM docs),
shingles AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM words, unnest(range(1, greatest(len(w) - 1, 1))) AS t(i)),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_inter / (sa.sz + sb.sz - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.7
"""

QUERIES["q48_minhash_production"] = q48_minhash_production
ORACLE_SQL["q48_minhash_production"] = Q48_SQL

# ---------------------------------------------------------------------------
# q49 — the full S8 surface inside the correctness gate: per-document
# ENCRYPTED PDF bytes are synthesized in an Arrow UDF (mode rotates
# through RC4-40/RC4-128/AESV2/AESV3 by doc_id), then decrypted,
# filter-decoded, tokenized and assembled back to text by the real
# pdf_text path (operators/pdf_decode.py + operators/pdf.py,
# reference: src/lib/processPDf.ts:13-97). The rendered page text is a
# deterministic label, so a DuckDB oracle is value-EXACT: any drift in
# crypto, filters, tokenizing or assembly breaks the hash match.
# ---------------------------------------------------------------------------


def q49_pdf_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    from crawler_spark.operators.pdf_decode import make_pdf, pdf_text

    @pandas_udf("binary")
    def _mk(ids):
        modes = ["rc4-40", "rc4-128", "aes-128", "aes-256"]

        def mk(i):
            i = int(i)
            return make_pdf(
                [[(700.0, f"DOC_{i:05d}")]],
                filters=["FlateDecode"],
                encrypt=modes[i % 4],
            )

        return ids.map(mk)

    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", _mk(F.col("doc_id")).alias("data"))
    )
    return pdf_text(d, "data", "doc_id").select("doc_id", "page", "text")


Q49_SQL = r"""
SELECT doc_id,
       CAST(1 AS INTEGER) AS page,
       'DOC_' || lpad(doc_id::VARCHAR, 5, '0') AS text
FROM documents
WHERE doc_id < 60
"""

QUERIES["q49_pdf_decode_roundtrip"] = q49_pdf_decode_roundtrip
ORACLE_SQL["q49_pdf_decode_roundtrip"] = Q49_SQL

# ---------------------------------------------------------------------------
# q50 — Gopher-style repetition quality rules (Rae et al. 2021 §A1.1,
# the standard pretraining-corpus repetition filters): per document,
# the fraction of words covered by the most-frequent 1/2/3-gram and
# the duplicate-word fraction, plus the keep/drop verdict. Scale shape
# is the canonical word-count pipeline: one explode of (n, gram)
# structs -> partial-aggregated count -> per-(doc, n) max -> pivot —
# two doc-keyed shuffles regardless of corpus size; the word-level
# ratios are shuffle-free higher-order functions. Short-doc guards per
# the ADVICE shingle lesson (sequence() turns descending when the
# upper bound crosses the start).
# ---------------------------------------------------------------------------


def q50_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("w")
    )
    base = d.select(
        "doc_id",
        "w",
        F.size("w").alias("n_words"),
        (F.lit(1.0) - F.size(F.array_distinct("w")) / F.size("w")).alias("dwf"),
    )
    # explode cheap (n, i) INT structs and build the gram string ABOVE
    # the Generate: Spark re-evaluates a Generate's input expression
    # per OUTPUT element (CollapseProject inlines it), so exploding the
    # string-building transform directly costs O(grams²) string work
    # per doc — measured 3-5 s vs <1 s at sf0.1 (same trap as q52/q53)
    gram_pos = """
        CASE WHEN size(w) >= 1 THEN
          transform(sequence(1, size(w)), i -> struct(1 AS n, i AS i))
          ELSE array() END
        || CASE WHEN size(w) >= 2 THEN
          transform(sequence(1, size(w) - 1), i -> struct(2 AS n, i AS i))
          ELSE array() END
        || CASE WHEN size(w) >= 3 THEN
          transform(sequence(1, size(w) - 2), i -> struct(3 AS n, i AS i))
          ELSE array() END
    """
    counts = (
        base.select("doc_id", "w", F.explode(F.expr(gram_pos)).alias("g"))
        .select(
            "doc_id",
            F.col("g.n").alias("n"),
            F.expr("concat_ws(' ', slice(w, g.i, g.n))").alias("gram"),
        )
        .groupBy("doc_id", "n", "gram")
        .count()
    )
    # one conditional agg instead of max-per-(doc,n) + pivot: same
    # result, one fewer doc-keyed shuffle
    piv = counts.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("count"))).alias(str(n))
            for n in (1, 2, 3)
        ]
    )
    out = base.join(piv, "doc_id", "left")
    top = lambda n: F.round(  # noqa: E731
        F.coalesce(F.col(str(n)), F.lit(0)) * n / F.col("n_words"), 6
    )
    return out.select(
        "doc_id",
        "n_words",
        F.round("dwf", 6).alias("dup_word_frac"),
        top(1).alias("top_word_frac"),
        top(2).alias("top2gram_frac"),
        top(3).alias("top3gram_frac"),
    ).withColumn(
        "keep",
        (F.col("top2gram_frac") <= 0.20) & (F.col("top3gram_frac") <= 0.18),
    )


Q50_SQL = r"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
  FROM documents),
base AS (
  SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
         1.0 - len(list_distinct(w)) * 1.0 / len(w) AS dwf
  FROM d),
grams AS (
  SELECT doc_id, 1 AS n, unnest(w) AS gram FROM d
  UNION ALL
  SELECT doc_id, 2, w[i] || ' ' || w[i+1]
  FROM d, unnest(range(1, len(w))) t(i) WHERE len(w) >= 2
  UNION ALL
  SELECT doc_id, 3, w[i] || ' ' || w[i+1] || ' ' || w[i+2]
  FROM d, unnest(range(1, len(w) - 1)) t(i) WHERE len(w) >= 3),
mx AS (
  SELECT doc_id, n, max(c) AS m
  FROM (SELECT doc_id, n, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
piv AS (
  SELECT doc_id,
         max(CASE WHEN n = 1 THEN m END) AS m1,
         max(CASE WHEN n = 2 THEN m END) AS m2,
         max(CASE WHEN n = 3 THEN m END) AS m3
  FROM mx GROUP BY 1)
SELECT b.doc_id, b.n_words,
       round(b.dwf, 6) AS dup_word_frac,
       round(coalesce(m1, 0) * 1.0 / b.n_words, 6) AS top_word_frac,
       round(coalesce(m2, 0) * 2.0 / b.n_words, 6) AS top2gram_frac,
       round(coalesce(m3, 0) * 3.0 / b.n_words, 6) AS top3gram_frac,
       (round(coalesce(m2, 0) * 2.0 / b.n_words, 6) <= 0.20
        AND round(coalesce(m3, 0) * 3.0 / b.n_words, 6) <= 0.18) AS keep
FROM base b LEFT JOIN piv USING (doc_id)
"""

QUERIES["q50_repetition_rules"] = q50_repetition_rules
ORACLE_SQL["q50_repetition_rules"] = Q50_SQL

# ---------------------------------------------------------------------------
# q51 — PII scrubbing (functions/pii.py): the standard pre-training
# redaction pass (emails / SSN-shaped ids / phones), pure JVM
# regexp_replace chain with an RE2-compatible shared pattern table so
# the DuckDB oracle replays the exact same rules. PII is injected
# deterministically from doc_id in both engines, so the value match
# proves pattern semantics AND precedence (emails before ids before
# phones — an SSN also matches the looser phone pattern).
# ---------------------------------------------------------------------------


def q51_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.functions.pii import pii_counts_col, scrub_pii_col

    inj = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" ssn 123-45-6789 end"),
    )
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", inj.alias("t"))
    )
    counts = pii_counts_col("t")
    return d.select(
        "doc_id",
        scrub_pii_col("t").alias("scrubbed"),
        counts["emails"].alias("n_emails"),
        counts["ids"].alias("n_ids"),
        counts["phones"].alias("n_phones"),
    )


Q51_SQL = r"""
WITH inj AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR || '@example.com or +1-555-01'
              || lpad((doc_id % 100)::VARCHAR, 2, '0') || ' ssn 123-45-6789 end' AS t
  FROM documents WHERE doc_id < 200),
m1 AS (
  SELECT doc_id, t,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t1
  FROM inj),
m2 AS (SELECT *, regexp_replace(t1, '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g') AS t2 FROM m1)
SELECT doc_id,
       regexp_replace(t2, '\+?\d[\d \-()]{7,}\d', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(t,  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t1, '\b\d{3}-\d{2}-\d{4}\b')) AS INTEGER) AS n_ids,
       CAST(len(regexp_extract_all(t2, '\+?\d[\d \-()]{7,}\d')) AS INTEGER) AS n_phones
FROM m2
"""

QUERIES["q51_pii_scrub"] = q51_pii_scrub
ORACLE_SQL["q51_pii_scrub"] = Q51_SQL

# ---------------------------------------------------------------------------
# q52 — benchmark decontamination: the standard pre-training hygiene
# pass (GPT-3 appendix-C / PaLM style) — flag any document sharing a
# 13-gram with an evaluation benchmark. Scale shape: the benchmark
# gram set is tiny next to the corpus, so it BROADCASTS into the
# doc-gram stream (one map-side join, no corpus shuffle besides the
# per-doc count agg). Benchmark passages are synthesized inline and
# injected into doc_id % 7 == 0 rows identically in both engines, so
# the value match proves gram extraction + overlap semantics exactly.
# Short-doc guards per the ADVICE shingle lesson.
# ---------------------------------------------------------------------------

_Q52_GREEK = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
)


def q52_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = 13
    # explode POSITIONS (a cheap int sequence) and hash the 13-gram
    # above the Generate: Spark re-evaluates a Generate's input per
    # output element, so exploding the hash-building transform itself
    # re-runs the whole string pipeline O(positions) times per doc —
    # measured 9 s vs 0.5 s at sf0.1. Grams travel as xxhash64 longs,
    # never strings, so the join exchange carries 8 bytes per gram.
    pos = (
        f"CASE WHEN size(w) >= {n} THEN sequence(1, size(w) - {n - 1}) "
        "ELSE array() END"
    )
    gram = f"xxhash64(concat_ws(' ', slice(w, i, {n})))"
    bench = spark.range(3).select(
        F.concat(
            F.lit("eval item "), F.col("id").cast("string"), F.lit(" " + _Q52_GREEK)
        ).alias("p")
    )
    bgrams = (
        bench.select(F.split(F.trim("p"), r"\s+").alias("w"))
        .select("w", F.explode(F.expr(pos)).alias("i"))
        .select(F.expr(gram).alias("gram"))
        .distinct()
    )
    inj = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" eval item "),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(" " + _Q52_GREEK),
        ),
    ).otherwise(F.col("text"))
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(inj), r"\s+").alias("w")
    )
    hits = (
        d.select("doc_id", "w", F.explode(F.expr(pos)).alias("i"))
        .select("doc_id", F.expr(gram).alias("gram"))
        .join(F.broadcast(bgrams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    tot = d.select(
        "doc_id",
        F.greatest(F.size("w") - (n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    return tot.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
    )


Q52_SQL = rf"""
WITH bench AS (
  SELECT 'eval item ' || j::VARCHAR || ' {_Q52_GREEK}' AS p FROM range(3) t(j)),
bw AS (SELECT regexp_split_to_array(trim(p), '\s+') AS w FROM bench),
bg AS (
  SELECT DISTINCT array_to_string(w[i : i + 12], ' ') AS gram
  FROM bw, unnest(range(1, len(w) - 11)) t(i) WHERE len(w) >= 13),
inj AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' eval item ' || (doc_id % 3)::VARCHAR || ' {_Q52_GREEK}'
              ELSE text END AS t
  FROM documents),
dw AS (SELECT doc_id, regexp_split_to_array(trim(t), '\s+') AS w FROM inj),
dg AS (SELECT doc_id, CAST(greatest(len(w) - 12, 0) AS BIGINT) AS n_grams, w FROM dw),
ex AS (
  SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS gram
  FROM dg, unnest(range(1, len(w) - 11)) t(i) WHERE len(w) >= 13),
hits AS (
  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM ex e JOIN bg b USING (gram) GROUP BY 1)
SELECT d.doc_id, d.n_grams,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM dg d LEFT JOIN hits h USING (doc_id)
"""

QUERIES["q52_decontamination"] = q52_decontamination
ORACLE_SQL["q52_decontamination"] = Q52_SQL

# ---------------------------------------------------------------------------
# q53 — cross-corpus line-level boilerplate removal (CCNet / RefinedWeb
# style): drop any LINE that appears in >= min_docs distinct documents
# (nav bars, cookie banners, footers), keep everything else in
# original order. Scale shape: the corpus-wide frequent-line set is
# tiny after the >= min_docs filter, so it comes back as a BROADCAST
# left-anti join — the only corpus-sized shuffles are the line-hash
# count and the per-doc reassembly. The fixture has no newlines, so
# "lines" are deterministic 8-word chunks plus injected boilerplate
# (5 header variants + a global footer), identical in both engines.
# ---------------------------------------------------------------------------


def q53_line_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    min_docs = 10
    # explode a cheap position sequence and build each line string
    # ABOVE the Generate (the input expression re-evaluates per output
    # element — exploding the line-building transform directly costs
    # O(lines²) string work per doc, the q50/q52 trap). Position 0 is
    # the header, nc + 1 the footer, 1..nc the 8-word chunks.
    line_expr = """
      CASE WHEN pos = 0
             THEN concat('promo banner variant ', cast(doc_id % 5 AS string))
           WHEN pos = nc + 1
             THEN 'copyright footer all rights reserved'
           ELSE concat_ws(' ', slice(w, (pos - 1) * 8 + 1, 8)) END
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+").alias("w"),
    )
    lines = (
        d.select(
            "doc_id",
            "w",
            F.expr(
                "CASE WHEN size(w) >= 1 THEN cast(ceil(size(w) / 8.0) AS int) "
                "ELSE 0 END"
            ).alias("nc"),
        )
        .select(
            "doc_id", "w", "nc",
            (F.col("nc") + 2).cast("long").alias("n_lines"),
            F.explode(F.expr("sequence(0, nc + 1)")).alias("pos"),
        )
        .select("doc_id", "n_lines", "pos", F.expr(line_expr).alias("line"))
    )
    freq = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("line")
    )
    kept = lines.join(F.broadcast(freq), "line", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("cleaned"),
    )
    tot = lines.groupBy("doc_id").agg(F.first("n_lines").alias("n_lines"))
    return tot.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


Q53_SQL = r"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
  FROM documents),
lines0 AS (
  SELECT doc_id, 0 AS pos,
         'promo banner variant ' || (doc_id % 5)::VARCHAR AS line FROM d
  UNION ALL
  SELECT doc_id, i AS pos,
         array_to_string(w[(i - 1) * 8 + 1 : least(i * 8, len(w))], ' ')
  FROM d, unnest(range(1, CAST(ceil(len(w) / 8.0) AS BIGINT) + 1)) t(i)
  WHERE len(w) >= 1
  UNION ALL
  SELECT doc_id, 1000000, 'copyright footer all rights reserved' FROM d),
freq AS (
  SELECT line FROM (
    SELECT line, count(DISTINCT doc_id) AS nd FROM lines0 GROUP BY 1)
  WHERE nd >= 10),
kept AS (
  SELECT l.* FROM lines0 l LEFT JOIN freq f USING (line) WHERE f.line IS NULL),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS cleaned
  FROM kept GROUP BY 1),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM lines0 GROUP BY 1)
SELECT t.doc_id, t.n_lines,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(a.cleaned, '') AS cleaned
FROM tot t LEFT JOIN agg a USING (doc_id)
"""

QUERIES["q53_line_boilerplate"] = q53_line_boilerplate
ORACLE_SQL["q53_line_boilerplate"] = Q53_SQL

# ---------------------------------------------------------------------------
# q54 — duplicate-cluster canonicalization (operators/components.py):
# near-dup PAIRS (the q22/q47/q38 output shape) collapse into
# transitive clusters and each cluster elects min-doc_id as the copy
# a dedup sweep keeps. Iterative min-label propagation + pointer
# jumping with per-iteration lineage cuts — the missing step between
# "pairs found" and "rows dropped" in every real pipeline. The oracle
# computes the same closure with a recursive CTE. Pairs are
# deterministic doc_id arithmetic (chains + long-range merges), so
# transitivity across >1 hop is actually exercised.
# ---------------------------------------------------------------------------


def q54_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawler_spark.operators.components import duplicate_clusters

    d = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = d.alias("a"), d.alias("b")
    chain = a.join(
        b, F.expr("b.doc_id = a.doc_id + 1 AND a.doc_id % 10 < 3")
    ).select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
    longrange = a.join(
        b, F.expr("b.doc_id = a.doc_id + 50 AND a.doc_id % 97 = 0")
    ).select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
    return duplicate_clusters(chain.union(longrange))


Q54_SQL = r"""
WITH RECURSIVE d AS (SELECT doc_id FROM documents),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 10 < 3
  UNION ALL
  SELECT a.doc_id, b.doc_id
  FROM d a JOIN d b ON b.doc_id = a.doc_id + 50 AND a.doc_id % 97 = 0),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
comp AS (SELECT node, min(lbl) AS component FROM reach GROUP BY 1),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY 1)
SELECT c.node AS doc_id, c.component, s.cluster_size,
       c.node = c.component AS is_canonical
FROM comp c JOIN sizes s USING (component)
"""

QUERIES["q54_dup_clusters"] = q54_dup_clusters
ORACLE_SQL["q54_dup_clusters"] = Q54_SQL

# ---------------------------------------------------------------------------
# q55 — token-budget sequence packing: greedy first-fit-in-order of
# documents into fixed token-budget bins (the batch-packing step of an
# SFT/pre-training loader). Packing is inherently sequential, so the
# parallel unit is a PACK GROUP (here doc_id // 50): groups pack
# concurrently via applyInPandas (one Arrow batch per group, whole
# group materialized and sorted — the stateful-chunk lesson from
# ADVICE r2), while within a group the fill loop is exact greedy
# semantics. The oracle replays the same loop as a recursive CTE
# stepping one row per recursion level. An oversized doc (> budget)
# gets a bin of its own; order is doc_id within group.
# ---------------------------------------------------------------------------


def q55_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    budget = 128

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fill, cur = [], 0, 0
        for tok in pdf["tok"]:
            if fill > 0 and fill + tok > budget:
                cur += 1
                fill = 0
            fill += int(tok)
            bins.append(cur)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "pack_group": pdf["grp"],
                "bin_idx": bins,
                "n_tokens": pdf["tok"],
            }
        )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") / 50).cast("long").alias("grp"),
        F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
        .cast("long")
        .alias("tok"),
    )
    return d.groupBy("grp").applyInPandas(
        pack, "doc_id long, pack_group long, bin_idx long, n_tokens long"
    )


Q55_SQL = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id // 50 AS grp,
         CAST(len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS BIGINT) AS tok,
         row_number() OVER (PARTITION BY doc_id // 50 ORDER BY doc_id) AS rn
  FROM documents),
pack(grp, rn, doc_id, tok, bin_idx, fill) AS (
  SELECT grp, rn, doc_id, tok, CAST(0 AS BIGINT), tok FROM t WHERE rn = 1
  UNION ALL
  SELECT t.grp, t.rn, t.doc_id, t.tok,
         CASE WHEN p.fill + t.tok <= 128 THEN p.bin_idx ELSE p.bin_idx + 1 END,
         CASE WHEN p.fill + t.tok <= 128 THEN p.fill + t.tok ELSE t.tok END
  FROM pack p JOIN t ON t.grp = p.grp AND t.rn = p.rn + 1)
SELECT doc_id, CAST(grp AS BIGINT) AS pack_group,
       CAST(bin_idx AS BIGINT) AS bin_idx, tok AS n_tokens
FROM pack
"""

QUERIES["q55_sequence_packing"] = q55_sequence_packing
ORACLE_SQL["q55_sequence_packing"] = Q55_SQL


# ---------------------------------------------------------------------------
# q56 — distributed image decode validation (the graft payload axis).
# Synthesizes the input_hint images table deterministically from doc_id
# (no external data), then runs the REAL codecs — including the
# baseline JFIF JPEG of functions/jpeg.py and the T.800 JPEG 2000 of
# functions/jpeg2000.py (lossless 5/3+RCT) — through one mapInPandas
# pass: encode → decode → PSNR vs the source pixels → the per-row
# invariant verdict (exact round-trip for lossless formats, ≥ 40 dB
# for lossy; BASELINE.json input_hint). The jpg rows additionally walk
# the EXIF leg (r4, functions/exif.py): an APP1 with orientation + GPS
# is planted, parsed back exactly, GPS-scrubbed with byte-identical
# decoded pixels, and the orientation display transform must produce
# the transposed dims — all folded into the same `ok` verdict. The
# DuckDB oracle pins every SQL-derivable output column (id, fmt, dims,
# verdict): if a codec, the EXIF path, or the Arrow plumbing breaks,
# `ok` flips (or decode raises) and the row set diverges. The
# reference drops images outright (src/lib/md/mdUtils.ts:23-44); this
# is the graft's replacement.
# ---------------------------------------------------------------------------

_Q56_FMTS = ["ppm", "bmp", "png", "qjpg", "jpg", "jp2", "webp", "tiff", "gif", "ico", "svg"]  # mirrored in Q56_SQL


def q56_image_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import images as im

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 60)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def validate(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                fmt = _Q56_FMTS[doc_id % len(_Q56_FMTS)]
                w = 16 + (doc_id % 4) * 16
                h = 16 + ((doc_id * 3) % 4) * 16
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (doc_id * 7 + yy * 3 + xx * 5) % 256,
                        (doc_id * 11 + yy * 2 + xx * 7) % 256,
                        (doc_id * 13 + yy * 5 + xx * 2) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                if fmt in ("gif", "svg"):
                    # GIF is palettized; SVG is run-length vector —
                    # quantize to ≤64 colors (GIF: palette bound; SVG:
                    # full-variance noise is the pathological case for
                    # a vector format, not its envelope)
                    arr = (arr // 64 * 64).astype(np.uint8)
                data = im.encode_image(arr, fmt)
                if fmt == "jpg":  # EXIF leg: plant → parse → scrub
                    from crawler_spark.functions import exif as exif_mod

                    orient = 1 + (doc_id % 8)
                    data = exif_mod.insert_exif(
                        data,
                        orientation=orient,
                        make="SparkCam",
                        gps=(10.0 + doc_id / 100.0, 106.0 + doc_id / 100.0),
                    )
                back = im.decode_image(data, fmt)
                if fmt in im.LOSSY_FMTS:
                    ok = bool(im.psnr(arr, back) >= 40.0)
                else:
                    ok = bool(np.array_equal(arr, back))
                if fmt == "jpg":
                    f = exif_mod.exif_fields(data)
                    scrubbed, had_gps = exif_mod.strip_gps(data)
                    f2 = exif_mod.exif_fields(scrubbed)
                    disp = exif_mod.auto_orient(back, orient)
                    want = (w, h) if orient >= 5 else (h, w)
                    ok = bool(
                        ok
                        and f is not None
                        and f["orientation"] == orient
                        and f["has_gps"]
                        and abs(f["gps_lat"] - (10.0 + doc_id / 100.0)) < 1e-6
                        and had_gps
                        and not f2["has_gps"]
                        and f2["make"] == "SparkCam"
                        and np.array_equal(
                            im.decode_image(scrubbed, "jpg"), back
                        )
                        and disp.shape[:2] == want
                    )
                rows.append((f"img{doc_id:04d}", fmt, w, h, ok))
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "w", "h", "ok"]
            )

    return d.mapInPandas(
        validate, "image_id string, fmt string, w int, h int, ok boolean"
    )


Q56_SQL = """
SELECT 'img' || lpad(doc_id::VARCHAR, 4, '0') AS image_id,
       CASE doc_id % 11 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
            WHEN 2 THEN 'png' WHEN 3 THEN 'qjpg' WHEN 4 THEN 'jpg'
            WHEN 5 THEN 'jp2' WHEN 6 THEN 'webp' WHEN 7 THEN 'tiff'
            WHEN 8 THEN 'gif' WHEN 9 THEN 'ico' ELSE 'svg' END AS fmt,
       (16 + (doc_id % 4) * 16)::INT AS w,
       (16 + ((doc_id * 3) % 4) * 16)::INT AS h,
       true AS ok
FROM documents WHERE doc_id < 60
"""

QUERIES["q56_image_validate"] = q56_image_validate
ORACLE_SQL["q56_image_validate"] = Q56_SQL


# ---------------------------------------------------------------------------
# q57 — image-embedding retrieval with PLANTED ground truth. Each
# doc_id seeds a deterministic noise image; the probe set is a real
# JPEG re-encode of each base (functions/jpeg.py, lossy). The engine
# decodes both sets, extracts the low-band DCT embedding
# (images_pipeline.embed_images), and retrieves each probe's top-1
# base by cosine. Noise images from different seeds are
# near-orthogonal while a JPEG re-encode lands at cosine ≈ 1, so the
# expected answer is knowable WITHOUT computing embeddings: probe i
# must retrieve base i with high similarity — which is exactly what
# the DuckDB oracle pins. A broken codec, embedding kernel, or ANN
# join flips the match and the row diverges.
# ---------------------------------------------------------------------------


def q57_image_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import images as im
    from crawler_spark.operators.images_pipeline import embed_images

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 40)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rng = np.random.default_rng(doc_id)
                arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                rows.append(
                    (f"base{doc_id:04d}", im.encode_image(arr, "png"), "png", "base")
                )
                rows.append(
                    (f"probe{doc_id:04d}", im.encode_image(arr, "jpg"), "jpg", "probe")
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt", "role"])

    imgs = d.mapInPandas(
        synth, "image_id string, bytes binary, fmt string, role string"
    )
    emb = embed_images(imgs)
    base = emb.filter(F.col("role") == "base").select(
        F.col("image_id").alias("match_id"), F.col("embedding").alias("e_b")
    )
    probe = emb.filter(F.col("role") == "probe").select(
        F.col("image_id").alias("probe_id"), F.col("embedding").alias("e_p")
    )
    # brute tier by design: 40×40 pairs; q26/q39 are the scale path
    cos = F.aggregate(
        F.zip_with("e_p", "e_b", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = probe.crossJoin(base).withColumn("cos", cos)
    w = W.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("match_id"))
    top = pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return top.select(
        "probe_id", "match_id", (F.col("cos") > F.lit(0.95)).alias("high_sim")
    )


Q57_SQL = """
SELECT 'probe' || lpad(doc_id::VARCHAR, 4, '0') AS probe_id,
       'base' || lpad(doc_id::VARCHAR, 4, '0') AS match_id,
       true AS high_sim
FROM documents WHERE doc_id < 40
"""

QUERIES["q57_image_embed_topk"] = q57_image_embed_topk
ORACLE_SQL["q57_image_embed_topk"] = Q57_SQL


# ---------------------------------------------------------------------------
# q58 — PDF embedded-image extraction (pdf × image cross-axis). The
# reference reads PDFs text-only (processPDf.ts:13-97); the graft also
# pulls /Subtype /Image XObjects and decodes them for real: DCTDecode
# through the baseline JPEG codec, raw /DeviceRGB directly, prefix
# filters + standard-handler encryption applied first
# (operators/pdf_decode.py::extract_pdf_images). Each doc embeds one
# deterministic image; the extracted phash must equal the expected
# phash computed INDEPENDENTLY from the source pixels (carried through
# the plan, compared JVM-side), and the oracle pins id/dims/fmt/
# verdict. Mode rotation: plain DCT / Flate-wrapped DCT / raw RGB /
# AES-128-encrypted DCT / CCITT G4 / mixed G3 / JBIG2 / JPX
# (lossless JPEG 2000 through functions/jpeg2000.py). Within the DCT
# modes the JPEG shape itself rotates over the real-web envelope —
# progressive SOF2, 4:2:0/4:2:2/4:4:0 subsampling, grayscale, and the
# Adobe APP14 color spaces (CMYK/YCCK/stored-RGB) — with exp_phash
# always computed from the same bytes, so the oracle row is
# shape-invariant while the driver gate walks every decode path.
# ---------------------------------------------------------------------------


def q58_pdf_image_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import images as im
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from crawler_spark.operators.pdf_decode import make_pdf_with_images, pdf_images

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 30)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def build(batches):
        for pdf_batch in batches:
            rows = []
            for doc_id in pdf_batch["doc_id"]:
                doc_id = int(doc_id)
                w = 16 + (doc_id % 3) * 8
                h = 16 + ((doc_id * 5) % 3) * 8
                yy, xx = np.mgrid[0:h, 0:w]
                arr = np.stack(
                    [
                        (doc_id * 3 + yy * 5 + xx * 7) % 256,
                        (doc_id * 5 + yy * 7 + xx * 3) % 256,
                        (doc_id * 7 + yy * 3 + xx * 5) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                mode = doc_id % 8
                if mode == 7:
                    # JPEG 2000: reversible 5/3 + RCT → bit-exact, so
                    # the expected phash comes from the source pixels.
                    # The codestream STRUCTURE rotates too (plain /
                    # PPM packed headers / POC progression change) —
                    # identical pixels, so the oracle row is untouched
                    # while the driver gate exercises the new paths.
                    from crawler_spark.functions.jpeg2000 import encode_j2k

                    extra = (
                        {},
                        {"ppm": True},
                        {"poc": [(0, 0, 1, 1, 256, 0),
                                 (0, 0, 1, 2, 256, 1)]},
                    )[(doc_id // 8) % 3]
                    spec = {"data": encode_j2k(arr, levels=1, **extra),
                            "w": w, "h": h, "filter": "JPXDecode"}
                    doc = make_pdf_with_images([spec])
                    exp_ph, fmt = im.phash64(arr), "jpx"
                elif mode >= 4:
                    # scanned-document shapes: bilevel XObjects, gray→RGB;
                    # mode 4 = CCITT G4 (K=-1), mode 5 = mixed G3 (K=4)
                    # (ITU-T T.4/T.6, functions/ccitt.py), mode 6 =
                    # JBIG2 MMR generic region (T.88, functions/jbig2.py)
                    from crawler_spark.functions.ccitt import (
                        encode_g3_mixed,
                        encode_g4,
                    )
                    from crawler_spark.functions.jbig2 import encode_jbig2_mmr

                    bil = arr[:, :, 0] >= 128
                    if mode == 6:
                        # alternate §7.2.7 unknown-length framing so
                        # the driver gate covers that wire shape too
                        spec = {"data": encode_jbig2_mmr(
                                    bil,
                                    unknown_length=(doc_id // 8) % 2 == 1,
                                ), "w": w, "h": h,
                                "filter": "JBIG2Decode",
                                "colorspace": "DeviceGray", "bpc": 1}
                        fmt = "jbig2"
                    else:
                        kval = -1 if mode == 4 else 4
                        data = (
                            encode_g4(bil) if mode == 4 else encode_g3_mixed(bil, 4)
                        )
                        parms = b"<< /K %d /Columns %d /Rows %d >>" % (kval, w, h)
                        spec = {"data": data, "w": w, "h": h,
                                "filter": "CCITTFaxDecode",
                                "colorspace": "DeviceGray", "bpc": 1,
                                "decode_parms": parms}
                        fmt = "ccitt"
                    doc = make_pdf_with_images([spec])
                    gray = np.where(bil, 0, 255).astype(np.uint8)
                    exp_ph = im.phash64(np.repeat(gray[:, :, None], 3, axis=2))
                elif mode == 3:
                    # the JPEG shape under encryption rotates across the
                    # real-web envelope (444 / progressive / 4:2:0 /
                    # progressive 4:2:0) — exp_phash is computed from the
                    # SAME bytes, so the oracle row never changes while
                    # the driver gate exercises every decode path
                    sub, prog = (
                        ("444", False), ("444", True),
                        ("420", False), ("420", True),
                    )[(doc_id // 8) % 4]
                    spec = {"data": encode_jpeg(arr, subsampling=sub,
                                                progressive=prog),
                            "w": w, "h": h, "filter": "DCTDecode"}
                    doc = make_pdf_with_images([spec], encrypt="aes-128")
                    exp_ph, fmt = im.phash64(decode_jpeg(spec["data"])), "jpg"
                elif mode == 2:
                    doc = make_pdf_with_images(
                        [{"data": arr.tobytes(), "w": w, "h": h, "filter": None}]
                    )
                    exp_ph, fmt = im.phash64(arr), "raw"
                else:
                    if mode == 0:
                        # plain DCT rotation: 4:2:2 / 4:4:0 / grayscale /
                        # progressive grayscale (single-component scans)
                        variant = (doc_id // 8) % 4
                        src = arr[:, :, 0] if variant >= 2 else arr
                        jp = encode_jpeg(
                            src,
                            subsampling=("422", "440", "444", "444")[variant],
                            progressive=variant == 3,
                        )
                    else:
                        # Flate-wrapped DCT rotation additionally walks the
                        # Adobe APP14 color spaces (print-world DCTDecode):
                        # JFIF YCbCr / CMYK / progressive YCCK / stored RGB
                        cs, prog = (
                            ("auto", True), ("cmyk", False),
                            ("ycck", True), ("rgb", False),
                        )[(doc_id // 8) % 4]
                        jp = encode_jpeg(arr, colorspace=cs, progressive=prog)
                    doc = make_pdf_with_images(
                        [{"data": jp, "w": w, "h": h, "filter": "DCTDecode",
                          "prefix": ["FlateDecode"] if mode == 1 else None}]
                    )
                    exp_ph, fmt = im.phash64(decode_jpeg(jp)), "jpg"
                rows.append((doc_id, doc, exp_ph, fmt))
            yield pd.DataFrame(
                rows, columns=["doc_id", "pdf", "exp_phash", "exp_fmt"]
            )

    pdfs = d.mapInPandas(
        build, "doc_id long, pdf binary, exp_phash long, exp_fmt string"
    )
    imgs = pdf_images(pdfs, "pdf", "doc_id", "exp_phash", "exp_fmt")
    return imgs.select(
        "doc_id",
        "img_idx",
        "w",
        "h",
        "fmt",
        (
            F.col("img_ok")
            & (F.col("phash") == F.col("exp_phash"))
            & (F.col("fmt") == F.col("exp_fmt"))
        ).alias("ok"),
    )


Q58_SQL = """
SELECT doc_id,
       0 AS img_idx,
       (16 + (doc_id % 3) * 8)::INT AS w,
       (16 + ((doc_id * 5) % 3) * 8)::INT AS h,
       CASE WHEN doc_id % 8 = 2 THEN 'raw'
            WHEN doc_id % 8 IN (4, 5) THEN 'ccitt'
            WHEN doc_id % 8 = 6 THEN 'jbig2'
            WHEN doc_id % 8 = 7 THEN 'jpx'
            ELSE 'jpg' END AS fmt,
       true AS ok
FROM documents WHERE doc_id < 30
"""

QUERIES["q58_pdf_image_extract"] = q58_pdf_image_extract
ORACLE_SQL["q58_pdf_image_extract"] = Q58_SQL


# ---------------------------------------------------------------------------
# q59 — pHash near-dup over REAL decoded pixels. q47 proves the
# banding recall guarantee on synthetic hashes; this row drives the
# whole physical path: per-doc noise image → PNG (base) + real-JPEG
# re-encode (probe) → decode bytes → phash64 of the decoded pixels →
# near_duplicate_images banded LSH. Measured: twin hamming ≤ 2,
# cross-pair hamming ≥ 20, so at max_hamming=7 the pair set is exactly
# {base_i ↔ probe_i} — which the oracle pins without computing a
# single hash. A codec regression, phash drift, or banding bug changes
# the pair set.
# ---------------------------------------------------------------------------


def q59_phash_real_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import images as im
    from crawler_spark.operators.images_pipeline import near_duplicate_images

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 40)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rng = np.random.default_rng(doc_id)
                arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                rows.append((f"base{doc_id:04d}", im.encode_image(arr, "png"), "png"))
                rows.append(
                    (f"probe{doc_id:04d}", im.encode_image(arr, "jpg"), "jpg")
                )
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"])

    raw = d.mapInPandas(synth, "image_id string, bytes binary, fmt string")

    def hash_batch(batches):
        for pdf in batches:
            stats = im.decode_stats_batch(pdf["bytes"], pdf["fmt"])
            yield pd.DataFrame(
                {"image_id": pdf["image_id"].values, "phash": stats["dec_phash"]}
            )

    hashed = raw.mapInPandas(hash_batch, "image_id string, phash long")
    pairs = near_duplicate_images(hashed, max_hamming=7)
    return pairs.select("id_a", "id_b")


Q59_SQL = """
SELECT 'base' || lpad(doc_id::VARCHAR, 4, '0') AS id_a,
       'probe' || lpad(doc_id::VARCHAR, 4, '0') AS id_b
FROM documents WHERE doc_id < 40
"""

QUERIES["q59_phash_real_pixels"] = q59_phash_real_pixels
ORACLE_SQL["q59_phash_real_pixels"] = Q59_SQL


# ---------------------------------------------------------------------------
# q60 — the COMPOSED preprocessing pipeline: language gate → quality
# floor → exact dedup (first-wins per content hash) → PII scrub, one
# DataFrame chain. Each stage is oracle-checked alone (q27/q28/q21/
# q51); this row proves the COMPOSITION — the shape a real corpus
# cleanup job runs. Duplicates are PLANTED (every doc unioned again
# under doc_id+10000) so the dedup stage provably removes rows: only
# original doc_ids may survive. Plan-wise the gates are map-side
# (pruning BEFORE the single md5-keyed dedup shuffle) and the scrub is
# a JVM regexp projection after it.
# ---------------------------------------------------------------------------


def q60_preprocess_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed preprocess: gates → exact dedup → PII scrub → final
    deterministic WEIGHTED MIXING (operators/mixing.py): three synth
    domains get rates {0.5, 1.0, 2.5} — one downsampled, one kept,
    one UPSAMPLED (2 whole epochs + a 0.5 Bernoulli third) — selection
    by md5 row-hash so the DuckDB oracle replays the exact sample."""
    from crawler_spark.functions.pii import scrub_pii_col
    from crawler_spark.operators.mixing import weighted_sample

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = base.unionByName(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: F.length(x) > 0)
    staged = (
        corpus.select("doc_id", "text", words.alias("w"))
        .filter(F.array_contains(F.col("w"), "the"))  # token lang gate (en)
        .filter(F.size("w") >= 40)  # quality floor
        .withColumn("n_words", F.size("w").cast("bigint"))
        .withColumn("text_hash", F.md5("text"))
        .drop("w")
    )
    win = W.partitionBy("text_hash").orderBy("doc_id")
    cleaned = (
        staged.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)  # exact dedup, first-wins
        .select(
            "doc_id",
            "n_words",
            "text_hash",
            F.length(scrub_pii_col("text")).cast("bigint").alias("scrubbed_len"),
        )
        .withColumn(
            "domain",
            F.concat(F.lit("d"), (F.col("doc_id") % 3).cast("string")),
        )
    )
    return weighted_sample(
        cleaned,
        domain_col="domain",
        key_col="doc_id",
        weights={"d0": 0.5, "d1": 1.0, "d2": 2.5},
        seed=60,
    )


Q60_SQL = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents),
staged AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> length(x) > 0) AS w
  FROM corpus),
gated AS (
  SELECT doc_id, text, len(w)::BIGINT AS n_words, md5(text) AS text_hash
  FROM staged
  WHERE list_contains(w, 'the') AND len(w) >= 40),
dd AS (
  SELECT *, row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
  FROM gated),
cleaned AS (
  SELECT doc_id, n_words, text_hash,
         length(
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
             '\+?\d[\d \-()]{7,}\d', '<PHONE>', 'g'))::BIGINT AS scrubbed_len,
         'd' || (doc_id % 3)::VARCHAR AS domain
  FROM dd WHERE rn = 1),
-- deterministic weighted mixing twin (operators/mixing.py): md5
-- row-hash uniform, floor(w) whole epochs + fractional Bernoulli
mixed AS (
  SELECT *,
         CASE domain WHEN 'd0' THEN 0.5::DOUBLE
                     WHEN 'd1' THEN 1.0::DOUBLE ELSE 2.5::DOUBLE END AS w,
         ('0x' || substr(md5(doc_id::VARCHAR || '|60'), 1, 8))::UBIGINT
           / 4294967296.0 AS u
  FROM cleaned),
counted AS (
  SELECT * EXCLUDE (w, u),
         (floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END)::INT AS n
  FROM mixed)
SELECT * EXCLUDE (n), unnest(generate_series(1, n))::INT AS epoch
FROM counted WHERE n > 0
"""

QUERIES["q60_preprocess_pipeline"] = q60_preprocess_pipeline
ORACLE_SQL["q60_preprocess_pipeline"] = Q60_SQL


# ---------------------------------------------------------------------------
# q61 — audio near-dup via spectral fingerprints: the audio twin of
# q59. Each doc_id seeds a deterministic 16-tone clip; the probe is a
# real re-encode rotating by parity: even ids → G.711 µ-law (lossy,
# twin hamming ≤ 4), odd ids → FLAC (functions/flac.py, lossless over
# the pcm16 quantization, twin hamming = 0). The engine decodes all
# three codecs, computes the 64-bit spectral-delta fingerprint
# (media.audio_fingerprint), and the SAME banded-LSH operator that
# pairs images pairs the fingerprints (exact-equal fingerprints pair
# through its full-hash self-join tier). Cross-pair hamming ≥ 9, so
# max_hamming=7 yields exactly {base_i ↔ probe_i} — which the oracle
# pins without computing a single FFT.
# ---------------------------------------------------------------------------


def q61_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import media as M
    from crawler_spark.operators.images_pipeline import near_duplicate_images

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 40)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                r = np.random.default_rng(doc_id)
                t = np.arange(8000) / 8000
                x = sum(
                    a * np.sin(2 * np.pi * f * t + p)
                    for f, a, p in zip(
                        r.uniform(60, 3800, 16),
                        r.uniform(0.05, 0.3, 16),
                        r.uniform(0, 6.28, 16),
                    )
                )
                x = np.clip(x + 0.02 * r.standard_normal(8000), -1, 1)
                rows.append(
                    (f"base{doc_id:04d}", M.encode_audio_pcm16(x), "pcm16", 8000, 1)
                )
                if doc_id % 2:
                    probe = (M.encode_audio_flac(x, 8000), "flac")
                else:
                    probe = (M.encode_audio_ulaw(x), "ulaw")
                rows.append((f"probe{doc_id:04d}", probe[0], probe[1], 8000, 1))
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "bytes", "codec", "sample_rate", "n_channels"],
            )

    audio = d.mapInPandas(
        synth,
        "audio_id string, bytes binary, codec string, sample_rate int, n_channels int",
    )
    fps = M.fingerprint_audio(audio).select(
        F.col("audio_id").alias("image_id"), F.col("fingerprint").alias("phash")
    )
    pairs = near_duplicate_images(fps, max_hamming=7)
    return pairs.select("id_a", "id_b")


Q61_SQL = """
SELECT 'base' || lpad(doc_id::VARCHAR, 4, '0') AS id_a,
       'probe' || lpad(doc_id::VARCHAR, 4, '0') AS id_b
FROM documents WHERE doc_id < 40
"""

QUERIES["q61_audio_near_dup"] = q61_audio_near_dup
ORACLE_SQL["q61_audio_near_dup"] = Q61_SQL


# ---------------------------------------------------------------------------
# q62 — video near-dup: the third leg of the multimodal triangle
# (q59 images, q61 audio). Each doc_id seeds a deterministic drifting
# clip; the probe re-encodes EVERY frame through the real JPEG codec
# and repacks as rawrgb. Fingerprint = per-frame phash64 majority
# vote (media.video_fingerprint; measured twin hamming ≤ 1 vs cross
# ≥ 16), paired by the SAME banded-LSH operator. The oracle pins the
# planted pair set.
# ---------------------------------------------------------------------------


def q62_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from crawler_spark.functions import media as M
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from crawler_spark.operators.images_pipeline import near_duplicate_images

    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") < 30)
        # the tiny filtered slice is ONE input split; spread the
        # codec-bound synth/decode stage across workers
        .repartition(16)
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                r = np.random.default_rng(doc_id)
                base = r.integers(0, 256, (24, 32, 3)).astype(np.int16)
                frames = []
                for _ in range(12):
                    base = np.clip(base + r.integers(-6, 7, (24, 32, 3)), 0, 255)
                    frames.append(base.astype(np.uint8))
                clip = np.stack(frames)
                probe = np.stack(
                    [decode_jpeg(encode_jpeg(f, quality=90)) for f in clip]
                )
                rows.append(
                    (f"base{doc_id:04d}", M.encode_rawrgb(clip), "rawrgb")
                )
                rows.append(
                    (f"probe{doc_id:04d}", M.encode_rawrgb(probe), "rawrgb")
                )
            yield pd.DataFrame(rows, columns=["video_id", "bytes", "codec"])

    video = d.mapInPandas(synth, "video_id string, bytes binary, codec string")
    fps = M.fingerprint_video(video).select(
        F.col("video_id").alias("image_id"), F.col("fingerprint").alias("phash")
    )
    return near_duplicate_images(fps, max_hamming=7).select("id_a", "id_b")


Q62_SQL = """
SELECT 'base' || lpad(doc_id::VARCHAR, 4, '0') AS id_a,
       'probe' || lpad(doc_id::VARCHAR, 4, '0') AS id_b
FROM documents WHERE doc_id < 30
"""

QUERIES["q62_video_near_dup"] = q62_video_near_dup
ORACLE_SQL["q62_video_near_dup"] = Q62_SQL


# ===========================================================================
# Registry consolidation — suite entries
#
# The driver's CORRECTNESS harness records at most 50 rows per round
# (round 3 registered 62 queries and q51-q62 silently got no driver
# row). Closely-related operator variants are therefore value-checked
# through ONE suite entry each: the suite unions the variants with an
# aligned schema + a `variant` discriminator column, and its oracle
# mirrors the union with UNION ALL over the component SQLs, so EVERY
# variant's values still hash-compare against DuckDB — nothing drops
# to rows-only. The component functions above stay importable and are
# exercised individually by tests/ and tools/check_oracle.py.
# ===========================================================================


def q02_topk_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (window rank over parts) + explode/flatten
    word-frequency top-k, one suite row per ranked item."""
    a = q02_topk_per_group(spark, sf_dir).select(
        F.lit("brand_price").alias("variant"),
        F.col("p_brand").alias("grp"),
        F.col("p_partkey").cast("string").alias("item"),
        F.col("p_retailprice").cast("double").alias("metric"),
        "rk",
    )
    b = q09_wordcount_topk(spark, sf_dir).select(
        F.lit("wordcount").alias("variant"),
        F.lit("*").alias("grp"),
        F.col("word").alias("item"),
        F.col("cnt").cast("double").alias("metric"),
        "rk",
    )
    return a.unionByName(b)


Q02_SUITE_SQL = f"""
SELECT 'brand_price' AS variant, p_brand AS grp, p_partkey::VARCHAR AS item,
       p_retailprice::DOUBLE AS metric, rk
FROM ({Q02_SQL})
UNION ALL
SELECT 'wordcount' AS variant, '*' AS grp, word AS item, cnt::DOUBLE AS metric, rk
FROM ({Q09_SQL})
"""


def q03_order_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering suite: distributed top-100 priority ordering (O1/O2,
    TakeOrderedAndProject) + per-source sequence numbering (O7/O8)."""
    a = q03_priority_order(spark, sf_dir).select(
        F.lit("priority_top100").alias("variant"),
        F.col("o_orderkey").cast("string").alias("item"),
        F.col("o_orderpriority").alias("grp"),
        F.col("order_date").alias("tag"),
        F.col("rk").alias("pos"),
    )
    b = q11_seq_numbering(spark, sf_dir).select(
        F.lit("seq_in_source").alias("variant"),
        F.col("doc_id").cast("string").alias("item"),
        F.col("source").alias("grp"),
        F.lit("*").alias("tag"),
        F.col("seq_in_source").alias("pos"),
    )
    return a.unionByName(b)


Q03_SUITE_SQL = f"""
SELECT 'priority_top100' AS variant, o_orderkey::VARCHAR AS item,
       o_orderpriority AS grp, order_date AS tag, rk AS pos
FROM ({Q03_SQL})
UNION ALL
SELECT 'seq_in_source' AS variant, doc_id::VARCHAR AS item, source AS grp,
       '*' AS tag, seq_in_source AS pos
FROM ({Q11_SQL})
"""


def q05_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence-join suite: left-anti (customers with no big order)
    + left-semi (brands with sales), both hash joins — plan-gated
    against nested-loop fallbacks in tests/test_plans.py."""
    a = q05_anti_join(spark, sf_dir).select(
        F.lit("anti_no_big_order").alias("variant"),
        F.col("c_name").alias("key"),
        F.col("c_custkey").alias("n"),
    )
    b = q07_semi_join(spark, sf_dir).select(
        F.lit("semi_brand_sales").alias("variant"),
        F.col("p_brand").alias("key"),
        F.col("n_parts_with_sales").alias("n"),
    )
    return a.unionByName(b)


Q05_SUITE_SQL = f"""
SELECT 'anti_no_big_order' AS variant, c_name AS key, c_custkey AS n
FROM ({Q05_SQL})
UNION ALL
SELECT 'semi_brand_sales' AS variant, p_brand AS key, n_parts_with_sales AS n
FROM ({Q07_SQL})
"""


def q10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-analytics suite: ROLLUP with grand total + two-dim
    CUBE, sharing one aligned (status, priority) shape."""
    a = q10_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("variant"),
        "status",
        F.lit("*").alias("priority"),
        "n_orders",
        "total_price",
    )
    b = q33_cube(spark, sf_dir).select(
        F.lit("cube").alias("variant"), "status", "priority", "n_orders", "total_price"
    )
    return a.unionByName(b)


Q10_SUITE_SQL = f"""
SELECT 'rollup' AS variant, status, '*' AS priority, n_orders, total_price
FROM ({Q10_SQL})
UNION ALL
SELECT 'cube' AS variant, status, priority, n_orders, total_price
FROM ({Q33_SQL})
"""


def q12_time_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed + cardinality metrics suite: monthly order
    rollups (date parse/format/arith), hourly tumbling windows (the
    batch twin of the streaming agg), and exact distinct-user counts
    (the exact twin of the engine's approx frontier monitoring)."""
    a = q12_date_ops(spark, sf_dir).select(
        F.lit("monthly_orders").alias("variant"),
        F.col("month").alias("bucket"),
        F.lit("*").alias("grp"),
        F.col("n_orders").alias("n"),
        F.col("total"),
    )
    b = q30_hourly_windows(spark, sf_dir).select(
        F.lit("hourly_events").alias("variant"),
        F.col("hour").alias("bucket"),
        F.col("event_type").alias("grp"),
        F.col("n"),
        F.col("total_value").alias("total"),
    )
    c = q31_distinct_users(spark, sf_dir).select(
        F.lit("distinct_users").alias("variant"),
        F.lit("*").alias("bucket"),
        F.col("event_type").alias("grp"),
        F.col("n_users").alias("n"),
        F.col("n_events").cast("double").alias("total"),
    )
    return a.unionByName(b).unionByName(c)


Q12_SUITE_SQL = f"""
SELECT 'monthly_orders' AS variant, month AS bucket, '*' AS grp,
       n_orders AS n, total
FROM ({Q12_SQL})
UNION ALL
SELECT 'hourly_events' AS variant, hour AS bucket, event_type AS grp,
       n, total_value AS total
FROM ({Q30_SQL})
UNION ALL
SELECT 'distinct_users' AS variant, '*' AS bucket, event_type AS grp,
       n_users AS n, n_events::DOUBLE AS total
FROM ({Q31_SQL})
"""


def q16_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite: per-user running sums (partitioned
    frame window) + 1h/30min sliding windows (Spark window() vs the
    two-bucket SQL expansion)."""
    a = q16_running_sum(spark, sf_dir).select(
        F.lit("running_sum").alias("variant"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("event_id").cast("string").alias("k2"),
        F.col("running_value").alias("val"),
    )
    b = q42_sliding_windows(spark, sf_dir).select(
        F.lit("sliding_window").alias("variant"),
        F.col("window_start").alias("k1"),
        F.col("event_type").alias("k2"),
        F.col("n").cast("double").alias("val"),
    )
    return a.unionByName(b)


Q16_SUITE_SQL = f"""
SELECT 'running_sum' AS variant, user_id::VARCHAR AS k1,
       event_id::VARCHAR AS k2, running_value AS val
FROM ({Q16_SQL})
UNION ALL
SELECT 'sliding_window' AS variant, window_start AS k1, event_type AS k2,
       n::DOUBLE AS val
FROM ({Q42_SQL})
"""


def q23_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-fingerprint suite: 16-bit SimHash (majority-vote bit
    aggregation) + min-4-of-hashes rolling 5-gram sketch (the fully
    array-side, shuffle-free formulation)."""
    a = q23_simhash(spark, sf_dir).select(
        F.lit("simhash16").alias("variant"),
        "doc_id",
        F.col("simhash16").cast("string").alias("fp"),
    )
    b = q29_fingerprint(spark, sf_dir).select(
        F.lit("minhash_sketch").alias("variant"),
        "doc_id",
        F.col("fingerprint").alias("fp"),
    )
    return a.unionByName(b)


Q23_SUITE_SQL = f"""
SELECT 'simhash16' AS variant, doc_id, simhash16::VARCHAR AS fp
FROM ({Q23_SQL})
UNION ALL
SELECT 'minhash_sketch' AS variant, doc_id, fingerprint AS fp
FROM ({Q29_SQL})
"""


def q25_cosine_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine tier (guarded; q26_ann_cells is the scale
    path): per-query top-3 neighbors + thresholded near-dup pairs,
    both over F.zip_with/F.aggregate JVM-side dot products."""
    a = q25_cosine_topk(spark, sf_dir).select(
        F.lit("topk").alias("variant"),
        F.col("q_id").alias("id_a"),
        F.col("c_id").alias("id_b"),
        "sim",
        "rk",
    )
    b = q38_embedding_near_dup(spark, sf_dir).select(
        F.lit("near_dup").alias("variant"),
        "id_a",
        "id_b",
        "sim",
        F.lit(0).cast("bigint").alias("rk"),
    )
    return a.unionByName(b)


Q25_SUITE_SQL = f"""
SELECT 'topk' AS variant, q_id AS id_a, c_id AS id_b, sim, rk
FROM ({Q25_SQL})
UNION ALL
SELECT 'near_dup' AS variant, id_a, id_b, sim, 0::BIGINT AS rk
FROM ({Q38_SQL})
"""


def q26_ann_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN bucketing suite (the 100 TB path: partition the embedding
    space once, search within cells): LSH sign-bucket occupancy +
    IVF nearest-centroid assignment via broadcast centroids and a
    partial-aggregable max(struct) — no Window exchange (plan-gated)."""
    a = q26_embedding_buckets(spark, sf_dir).select(
        F.lit("sign_bucket").alias("variant"),
        F.col("bucket").alias("cell"),
        "n_vectors",
        F.col("n_labels").cast("double").alias("metric"),
    )
    b = q39_ivf_cells(spark, sf_dir).select(
        F.lit("ivf").alias("variant"),
        F.col("centroid_id").alias("cell"),
        F.col("n_assigned").alias("n_vectors"),
        F.col("avg_sim").alias("metric"),
    )
    return a.unionByName(b)


Q26_SUITE_SQL = f"""
SELECT 'sign_bucket' AS variant, bucket AS cell, n_vectors, n_labels::DOUBLE AS metric
FROM ({Q26_SQL})
UNION ALL
SELECT 'ivf' AS variant, centroid_id AS cell, n_assigned AS n_vectors,
       avg_sim AS metric
FROM ({Q39_SQL})
"""


def q40_temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-join suite: as-of join (union+sort+forward-fill, no
    range explosion) + bucketed range join (equi-join + residual)."""
    a = q40_asof_join(spark, sf_dir).select(
        F.lit("asof").alias("variant"),
        "user_id",
        "event_id",
        F.col("purchase_ts").alias("ts_a"),
        F.col("view_ts").alias("ts_b"),
        F.col("view_event_id").alias("n"),
    )
    b = q41_range_join(spark, sf_dir).select(
        F.lit("range_30min").alias("variant"),
        "user_id",
        F.lit(-1).cast("bigint").alias("event_id"),
        F.lit("*").alias("ts_a"),
        F.lit("*").alias("ts_b"),
        F.col("n_view_purchase_pairs").alias("n"),
    )
    return a.unionByName(b)


Q40_SUITE_SQL = f"""
SELECT 'asof' AS variant, user_id, event_id, purchase_ts AS ts_a,
       view_ts AS ts_b, view_event_id AS n
FROM ({Q40_SQL})
UNION ALL
SELECT 'range_30min' AS variant, user_id, -1::BIGINT AS event_id,
       '*' AS ts_a, '*' AS ts_b, n_view_purchase_pairs AS n
FROM ({Q41_SQL})
"""

# Component entries whose semantics are now value-checked through a
# suite row (or, for q22, through its production superset q48):
_FOLDED = [
    "q02_topk_per_group",
    "q09_wordcount_topk",
    "q03_priority_order",
    "q11_seq_numbering",
    "q05_anti_join",
    "q07_semi_join",
    "q10_rollup",
    "q33_cube",
    "q12_date_ops",
    "q30_hourly_windows",
    "q31_distinct_users",
    "q16_running_sum",
    "q42_sliding_windows",
    "q23_simhash",
    "q29_fingerprint",
    "q25_cosine_topk",
    "q38_embedding_near_dup",
    "q26_embedding_buckets",
    "q39_ivf_cells",
    "q40_asof_join",
    "q41_range_join",
    "q22_minhash_lsh_pairs",  # toy tier of q48_minhash_production
]
for _k in _FOLDED:
    QUERIES.pop(_k)
    ORACLE_SQL.pop(_k, None)

QUERIES.update(
    {
        "q02_topk_suite": q02_topk_suite,
        "q03_order_seq": q03_order_seq,
        "q05_semi_anti_join": q05_semi_anti_join,
        "q10_grouping_sets": q10_grouping_sets,
        "q12_time_rollups": q12_time_rollups,
        "q16_window_funcs": q16_window_funcs,
        "q23_doc_fingerprints": q23_doc_fingerprints,
        "q25_cosine_brute": q25_cosine_brute,
        "q26_ann_cells": q26_ann_cells,
        "q40_temporal_joins": q40_temporal_joins,
    }
)
ORACLE_SQL.update(
    {
        "q02_topk_suite": Q02_SUITE_SQL,
        "q03_order_seq": Q03_SUITE_SQL,
        "q05_semi_anti_join": Q05_SUITE_SQL,
        "q10_grouping_sets": Q10_SUITE_SQL,
        "q12_time_rollups": Q12_SUITE_SQL,
        "q16_window_funcs": Q16_SUITE_SQL,
        "q23_doc_fingerprints": Q23_SUITE_SQL,
        "q25_cosine_brute": Q25_SUITE_SQL,
        "q26_ann_cells": Q26_SUITE_SQL,
        "q40_temporal_joins": Q40_SUITE_SQL,
    }
)

# numeric key order + the hard 50-entry driver budget
QUERIES = dict(sorted(QUERIES.items()))
ORACLE_SQL = dict(sorted(ORACLE_SQL.items()))
assert len(QUERIES) == 50, f"driver budget is 50 entries, got {len(QUERIES)}"
