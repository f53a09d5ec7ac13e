"""F10: flat seed rows → nested Metadata shape
(`src/lib/crawler/schemaMapping.ts:4-24`).

The reference maps the TSV's flat columns into a nested object: a
``genre`` struct from the three genre columns, and ``tags`` as an
array of {category, vietnamese} structs where the vietnamese label is
a dimension lookup (``tagCategories``, `src/mapping.ts`) defaulting to
'' when the category is unknown. Here the dimension is a broadcast
literal map (dims are static config, `SURVEY §1.1` "category tables"),
the tag split uses the reference's ``" | "`` separator
(`schema.ts:10`), and everything stays in one JVM projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# static dimension (src/mapping.ts tagCategories) — representative subset;
# extend freely, unknown categories map to '' exactly like the reference
TAG_VIETNAMESE: dict[str, str] = {
    "t1": "thể loại một",
    "t2": "thể loại hai",
    "prayer": "kinh nguyện",
    "bible": "kinh thánh",
    "history": "lịch sử",
}

TAG_SEPARATOR = " | "  # schema.ts:10


def _tag_map() -> Column:
    pairs: list[Column] = []
    for k, v in TAG_VIETNAMESE.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def to_nested_metadata(seeds: DataFrame) -> DataFrame:
    """Flat seed frame → nested Metadata rows (genre struct + tags
    array-of-struct). Unknown tag categories get vietnamese ''."""
    tag_map = _tag_map()
    tags = F.transform(
        F.filter(
            F.split(F.coalesce(F.col("tag_category"), F.lit("")), r"\s*\|\s*"),
            lambda t: F.length(t) > 0,
        ),
        lambda t: F.struct(
            t.alias("category"),
            F.coalesce(tag_map[t], F.lit("")).alias("vietnamese"),
        ),
    )
    return seeds.select(
        "document_id",
        "document_number",
        "title",
        F.struct(
            F.col("genre_code").alias("code"),
            F.col("genre_category").alias("category"),
        ).alias("genre"),
        tags.alias("tags"),
        "author",
        "source_type",
        "source_url",
        "source",
        "has_chapters",
        "published_time",
        "language",
        "requires_manual_check",
    )
