"""Materialize the synthetic :class:`~crawler_spark.oracle.fixtures.World`
as parquet tables with explicit schemas (never inferSchema — the
reference validates every boundary with zod, SURVEY §1.4; we declare
StructTypes)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from crawler_spark.oracle.fixtures import World

SEED_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("document_number", T.IntegerType(), True),
        T.StructField("document_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("genre_code", T.StringType(), True),
        T.StructField("genre_category", T.StringType(), True),
        T.StructField("tag_category", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("author", T.StringType(), True),
        T.StructField("source_type", T.StringType(), True),
        T.StructField("source_url", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("has_chapters", T.BooleanType(), True),
        T.StructField("published_time", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("requires_manual_check", T.BooleanType(), True),
    ]
)

WEB_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("body", T.StringType(), True),
        T.StructField("fail_rounds", T.IntegerType(), False),
        T.StructField("latency_ms", T.IntegerType(), False),
    ]
)

ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path_prefix", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
    ]
)

POLITENESS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget_per_round", T.IntegerType(), False),
    ]
)

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        # linkage + golden-pixel columns (beyond input_hint, used by tests)
        T.StructField("url", T.StringType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def write_world(spark: SparkSession, world: World, out_dir: str) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}

    def _w(name: str, rows: list, schema: T.StructType) -> None:
        p = os.path.join(out_dir, f"{name}.parquet")
        spark.createDataFrame(rows, schema=schema).write.mode("overwrite").parquet(p)
        paths[name] = p

    _w("seeds", [tuple(r.get(f.name) for f in SEED_SCHEMA.fields) for r in world.seeds], SEED_SCHEMA)
    _w(
        "web_graph",
        [(p.url, p.host, p.body, p.fail_rounds, p.latency_ms) for p in world.pages.values()],
        WEB_GRAPH_SCHEMA,
    )
    _w("robots", [(r["host"], r["path_prefix"], r["allow"]) for r in world.robots], ROBOTS_SCHEMA)
    _w(
        "politeness",
        [(h, b) for h, b in world.politeness.items()],
        POLITENESS_SCHEMA,
    )
    _w(
        "images",
        [
            (s.image_id, s.data, s.w, s.h, s.fmt, s.caption, s.phash, s.url, s.pixels)
            for s in world.images.values()
        ],
        IMAGES_SCHEMA,
    )
    return paths


def read_table(spark: SparkSession, fixture_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(fixture_dir, f"{name}.parquet"))
