"""Sharded cuckoo filter — the deletion-capable alternative to the
bloom tier (north rule names "bloom/cuckoo"; SURVEY §2.4 D3a).

Why a cuckoo filter at all: a bloom filter cannot *remove* keys, so a
frontier that re-crawls (freshness revisits, purge-by-policy) would
accumulate dead keys until rebuild. A cuckoo filter supports delete
with the same ~2-tier layout: candidate keys meet their shard's table
via ``cogroup`` (bitsets/buckets never replicated onto key rows — the
same OOM lesson the bloom tier learned, see dedup.py).

Design (standard partial-key cuckoo hashing):
  * per shard: ``n_buckets`` buckets × 4 slots of 16-bit fingerprints
    (0 = empty; fingerprints are forced non-zero);
  * fp = mix(key) & 0xFFFF (|1 if 0); bucket1 = mix2(key) %
    n_buckets; bucket2 = bucket1 XOR (mix3(fp) % n_buckets) — XOR
    partial-key displacement, so bucket2(bucket1, fp) is an involution
    and relocation never needs the original key;
  * insert: try both buckets vectorized; leftovers go through the
    classic eviction loop (max 500 kicks); a full table raises —
    size shards for ≤ 95 % load;
  * false-positive rate ≈ 2·4/2^16 ≈ 0.012 %; no false negatives for
    inserted keys PROVIDED the standard cuckoo precondition holds:
    :meth:`ShardedCuckoo.delete` may only be called with keys that were
    previously inserted (and at most as many times as inserted).
    Deleting a never-inserted key whose fingerprint/bucket collides
    with a resident key clears that other key's slot — a false
    negative that breaks the filter_unseen contract. The engine
    guarantees this by deleting only keys read back from the frontier
    (always a subset of inserts); callers outside that path should
    gate deletes behind an exact-tier membership check.

Same public surface as :class:`~crawler_spark.operators.dedup.ShardedBloom`
(update / probe / filter_unseen) plus :meth:`delete`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.operators.dedup import _mix, anti_join_seen

_SLOTS = 4
_MAX_KICKS = 500

_CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType(), False),
        T.StructField("buckets", T.BinaryType(), False),
        T.StructField("n_buckets", T.LongType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)


def _fingerprints(keys: np.ndarray) -> np.ndarray:
    fp = (_mix(keys.view(np.uint64), np.uint64(0x5BD1E995)) & np.uint64(0xFFFF)).astype(
        np.uint16
    )
    fp[fp == 0] = 1
    return fp


def _bucket1(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    return (_mix(keys.view(np.uint64), np.uint64(0xC2B2AE35)) % np.uint64(n_buckets)).astype(
        np.int64
    )


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    disp = _mix(fp.astype(np.uint64), np.uint64(0x27D4EB2F)) % np.uint64(n_buckets)
    return (bucket.astype(np.uint64) ^ disp).astype(np.int64) % n_buckets


def _insert_batch(table: np.ndarray, keys: np.ndarray, rng_seed: int) -> int:
    """table: (n_buckets, SLOTS) uint16, mutated in place. Returns #inserted
    (duplicates insert again — like bloom, the filter is a multiset)."""
    n_buckets = table.shape[0]
    fps = _fingerprints(keys)
    b1 = _bucket1(keys, n_buckets)
    rng = np.random.default_rng(rng_seed)
    inserted = 0
    for fp, b in zip(fps, b1):
        placed = False
        for cand in (b, _alt_bucket(np.array([b]), np.array([fp]), n_buckets)[0]):
            row = table[cand]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                placed = True
                break
        if not placed:
            cur_b, cur_fp = b, fp
            for _ in range(_MAX_KICKS):
                slot = rng.integers(0, _SLOTS)
                cur_fp, table[cur_b, slot] = table[cur_b, slot], cur_fp
                cur_b = _alt_bucket(np.array([cur_b]), np.array([cur_fp]), n_buckets)[0]
                row = table[cur_b]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = cur_fp
                    placed = True
                    break
            if not placed:
                raise RuntimeError(
                    f"cuckoo shard full (n_buckets={n_buckets}); resize shards"
                )
        inserted += 1
    return inserted


def _contains_batch(table: np.ndarray, keys: np.ndarray) -> np.ndarray:
    n_buckets = table.shape[0]
    fps = _fingerprints(keys)
    b1 = _bucket1(keys, n_buckets)
    b2 = _alt_bucket(b1, fps, n_buckets)
    hit1 = (table[b1] == fps[:, None]).any(axis=1)
    hit2 = (table[b2] == fps[:, None]).any(axis=1)
    return hit1 | hit2


def _delete_batch(table: np.ndarray, keys: np.ndarray) -> int:
    n_buckets = table.shape[0]
    fps = _fingerprints(keys)
    b1 = _bucket1(keys, n_buckets)
    b2 = _alt_bucket(b1, fps, n_buckets)
    removed = 0
    for fp, a, b in zip(fps, b1, b2):
        for cand in (a, b):
            row = table[cand]
            idx = np.flatnonzero(row == fp)
            if len(idx):
                row[idx[0]] = 0
                removed += 1
                break
    return removed


class ShardedCuckoo:
    """Partitioned cuckoo filter persisted via a SnapshotStore table."""

    TABLE = "url_seen_cuckoo"

    def __init__(
        self,
        spark: SparkSession,
        store,
        n_shards: int = 8,
        buckets_per_shard: int = 1 << 16,
    ):
        if buckets_per_shard & (buckets_per_shard - 1):
            raise ValueError("buckets_per_shard must be a power of two "
                             "(XOR displacement needs a closed domain)")
        self.spark = spark
        self.store = store
        self.n_shards = n_shards
        self.buckets_per_shard = buckets_per_shard

    # ------------------------------------------------------------- internals
    def _empty(self) -> DataFrame:
        rows = [
            (s, bytes(self.buckets_per_shard * _SLOTS * 2), self.buckets_per_shard, 0)
            for s in range(self.n_shards)
        ]
        return self.spark.createDataFrame(rows, schema=_CUCKOO_SCHEMA)

    def ensure(self) -> None:
        if not self.store.exists(self.TABLE):
            self.store.commit(self.TABLE, self._empty(), lineage={"op": "init"})

    def _tagged(self, keys: DataFrame, key_col: str) -> DataFrame:
        # null keys would form a null-shard group with no filter-side
        # frame (executor IndexError) and cannot be member-tested
        return (
            keys.select(F.col(key_col).alias("key"))
            .filter(F.col("key").isNotNull())
            .withColumn(
                "shard_id", F.pmod(F.col("key"), F.lit(self.n_shards)).cast("int")
            )
        )

    def _apply(self, keys: DataFrame, key_col: str, op: str) -> None:
        self.ensure()
        filt = self.store.read(self.TABLE)

        def _upd(f_pdf: pd.DataFrame, k_pdf: pd.DataFrame) -> pd.DataFrame:
            if f_pdf.empty:  # no shard state for this group — no-op
                return pd.DataFrame({f.name: [] for f in _CUCKOO_SCHEMA.fields})
            head = f_pdf.iloc[0]
            nb = int(head["n_buckets"])
            table = (
                np.frombuffer(bytes(head["buckets"]), np.uint16)
                .reshape(nb, _SLOTS)
                .copy()
            )
            ks = k_pdf["key"].to_numpy(np.int64) if len(k_pdf) else np.array([], np.int64)
            delta = 0
            if len(ks):
                if op == "insert":
                    delta = _insert_batch(table, ks, rng_seed=int(head["shard_id"]) + 1)
                else:
                    delta = -_delete_batch(table, ks)
            return pd.DataFrame(
                {
                    "shard_id": [int(head["shard_id"])],
                    "buckets": [table.tobytes()],
                    "n_buckets": [nb],
                    "n_keys": [int(head["n_keys"]) + delta],
                }
            )

        merged = (
            filt.groupBy("shard_id")
            .cogroup(self._tagged(keys, key_col).groupBy("shard_id"))
            .applyInPandas(_upd, _CUCKOO_SCHEMA)
        )
        self.store.commit(self.TABLE, merged, lineage={"op": f"cuckoo_{op}"})

    # ------------------------------------------------------------------- api
    def update(self, keys: DataFrame, key_col: str = "url_key") -> None:
        self._apply(keys, key_col, "insert")

    def delete(self, keys: DataFrame, key_col: str = "url_key") -> None:
        """Remove keys. PRECONDITION (standard cuckoo contract): every
        key must have been inserted before, at most as many times as it
        was inserted — deleting a never-inserted key can clear a
        colliding resident fingerprint and create a false negative.
        Gate unverified deletes behind an exact-tier membership check
        (module docstring)."""
        self._apply(keys, key_col, "delete")

    def probe(self, candidates: DataFrame, key_col: str = "url_key") -> DataFrame:
        self.ensure()
        filt = self.store.read(self.TABLE).withColumnRenamed("shard_id", "_shard_id")
        out_schema = T.StructType(
            candidates.schema.fields
            + [T.StructField("maybe_seen", T.BooleanType(), False)]
        )
        tagged = candidates.withColumn(
            "_shard_id", F.pmod(F.col(key_col), F.lit(self.n_shards)).cast("int")
        )
        cand_cols = candidates.columns

        def _probe(f_pdf: pd.DataFrame, c_pdf: pd.DataFrame) -> pd.DataFrame:
            if c_pdf.empty:
                return pd.DataFrame({c: [] for c in [*cand_cols, "maybe_seen"]})
            if f_pdf.empty:
                # no shard state (e.g. a null key's null-shard group):
                # conservatively maybe_seen — the exact tier resolves it
                out = c_pdf[cand_cols].copy()
                out["maybe_seen"] = True
                return out
            head = f_pdf.iloc[0]
            nb = int(head["n_buckets"])
            table = np.frombuffer(bytes(head["buckets"]), np.uint16).reshape(nb, _SLOTS)
            ks = c_pdf[key_col].to_numpy(np.int64)
            out = c_pdf[cand_cols].copy()
            out["maybe_seen"] = _contains_batch(table, ks)
            return out

        return (
            filt.groupBy("_shard_id")
            .cogroup(tagged.groupBy("_shard_id"))
            .applyInPandas(_probe, out_schema)
        )

    def filter_unseen(
        self,
        candidates: DataFrame,
        seen: DataFrame,
        key_col: str = "url_key",
        url_col: str = "url",
    ) -> DataFrame:
        """Two-tier dedup, identical contract to ShardedBloom."""
        probed = self.probe(candidates, key_col)
        unseen_fast = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        resolved = anti_join_seen(maybe, seen, key=url_col)
        return unseen_fast.unionByName(resolved)
