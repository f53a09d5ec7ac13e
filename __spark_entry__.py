"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-rollup query on sf0.001;
``queries()`` exposes one callable per implemented operator family from
SURVEY.md §2 plus the training-data dedup/similarity/ANN/text-analysis
and multimodal ops (exactly 50 entries — the driver's CORRECTNESS
budget; ALL 50 have DuckDB value oracles as of r4 — q43 switched from
engine-native HLL to the repo's own cross-engine-deterministic
HyperLogLog sketch, so even the approximate op hash-matches). Closely-related variants are
value-checked through suite entries that union the variants with a
``variant`` discriminator and mirror it in the oracle SQL (see the
"Registry consolidation" section of ``crawler_spark/queries.py``), so
every operator family lands a driver row.
Highlights: q45/q46 cover the full reference cleanup chain and
verse-order tracking; q47 proves the banded pHash recall guarantee
against a brute-force oracle; q48 the production MinHash operator;
q49 round-trips ENCRYPTED PDF bytes through decrypt/decode/assemble;
q50-q53 Gopher rules / PII / decontamination / boilerplate; q54/q55
dup-cluster canonicalization and sequence packing; q56-q62 the image/
audio/video payload axis — distributed codec validation (incl. the
real baseline JPEG), embedding retrieval, PDF image extraction, and
the multimodal near-dup triangle, each against planted-ground-truth
oracles. The full registry lives in ``crawler_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawler_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every query."""
    return dict(ORACLE_SQL)
