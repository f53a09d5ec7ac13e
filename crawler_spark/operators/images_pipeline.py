"""Image payload pipeline (BASELINE.json ``input_hint`` shape).

The crawl's extraction stage yields (page_url, caption, img_url,
img_order) rows — the graft's replacement for the reference's
``removeMdImgs`` drop (``src/lib/md/mdUtils.ts:23-44``: the named
groups ``alt``/``link`` it discards are exactly our caption/img_url).
This module turns those into the payload table

    images(image_id, bytes, w, h, fmt, caption, phash)

and validates every row with the vectorized decode kernel:

  * ``build_images_table`` — caption dedup (first-wins per img_url in
    crawl order), join to the byte store (the image-fetch stage; in
    tests the fixture CDN table), then one ``mapInPandas`` pass that
    decodes each Arrow batch and emits engine-computed (w, h, phash).
    Nothing is trusted from the source: dimensions and phash come from
    the decoded pixels.
  * ``validate_images`` — per-row invariant check against golden pixel
    buffers: PSNR (≥ 40 dB for lossy formats, exact/inf for lossless)
    and phash equality, returned as a DataFrame so violations are a
    filter away (quarantine pattern, SURVEY §1.4).

At 100 TB the byte store join is the heavy stage: both sides are
hash-partitioned on ``img_url`` (bytes never shuffle more than once)
and the decode is CPU-bound per partition with no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.images import (
    LOSSY_FMTS,
    decode_stats_batch,
    psnr_batch,
)
from crawler_spark.operators.dedup import first_wins

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("img_url", T.StringType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


#: decoded-pixel admission budget: 64 M px × 3 B ≈ 192 MB per row —
#: one oversized row cannot OOM an executor running several Arrow
#: batches concurrently. Real content tops out far below this; only
#: decompression bombs (tiny payload, huge header dims) live above it.
MAX_DECODE_PIXELS = 1 << 26


def build_images_table(
    extractions: DataFrame,
    byte_store: DataFrame,
    max_pixels: int = MAX_DECODE_PIXELS,
) -> DataFrame:
    """extractions(page_url, caption, img_url, img_order, round)
    ⨝ byte_store(url, image_id, bytes, fmt) → input_hint images table.

    Caption policy: first caption wins in crawl order (round, page_url,
    img_order) — the same uniqBy semantics as seed dedup (D1).

    Admission: every payload is header-probed first (probe_image — no
    pixel decode). Rows whose header CLAIMS more than ``max_pixels``
    quarantine as decode_ok=False without the decoder ever running —
    the decompression-bomb gate (a 1 KB payload claiming 60000×60000
    would otherwise allocate ~10 GB). The probe also supplies the true
    format when the declared label lies.
    """
    caps = first_wins(
        extractions,
        key="img_url",
        order_cols=[F.col("round"), F.col("page_url"), F.col("img_order")],
    ).select("img_url", "caption")

    src = byte_store.select(
        F.col("url").alias("img_url"), "image_id", "bytes", "fmt"
    )
    joined = caps.join(src, "img_url", "inner").select(
        "image_id", "bytes", "fmt", "caption", "img_url"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from crawler_spark.functions.images import probe_image, sniff_format

        for pdf in batches:
            # trust magic bytes over the declared label (real-web
            # Content-Type/extension lies): decode by the sniffed
            # format when one matches, and RECORD the true format;
            # header-claimed dims above the budget never reach decode
            probes = [
                probe_image(b) if b is not None else None for b in pdf["bytes"]
            ]
            fmts = pd.Series(
                [
                    (p[0] if p else sniff_format(b) or f) if b is not None else f
                    for p, b, f in zip(probes, pdf["bytes"], pdf["fmt"])
                ],
                index=pdf.index,
            )
            admitted = pd.Series(
                [
                    b if not (p and p[1] * p[2] > max_pixels) else None
                    for p, b in zip(probes, pdf["bytes"])
                ],
                index=pdf.index,
            )
            stats = decode_stats_batch(admitted, fmts)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "bytes": pdf["bytes"],
                    "w": stats["dec_w"],
                    "h": stats["dec_h"],
                    "fmt": fmts,
                    "caption": pdf["caption"],
                    "phash": stats["dec_phash"],
                    "img_url": pdf["img_url"],
                    "decode_ok": stats["ok"],
                }
            )

    return joined.repartition(F.col("img_url")).mapInPandas(_decode, IMAGES_SCHEMA)


BYTE_STORE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def ingest_data_uris(extractions: DataFrame) -> DataFrame:
    """Inline ``data:`` images → byte_store-shaped rows, NO fetch.

    The HTML→MD pass keeps a data URI only when its payload
    header-probes as a real image above the tracker floor
    (functions/html.py `_img_md`), so every row here is expected to
    parse; rows that still don't (truncated base64 etc.) are dropped —
    they have no bytes to quarantine. image_id is a content hash, so
    the same inline logo pasted on 10^6 pages is ONE image row.

    Scale shape: the payload already travels inside the extraction row
    (it was inline in the HTML), so this is one dropDuplicates shuffle
    on the URI string — the dedup the byte_store join needs anyway —
    then a map-only decode. No network stage, no driver state.
    """
    uris = (
        extractions.filter(F.col("img_url").startswith("data:"))
        .select("img_url")
        .dropDuplicates(["img_url"])
    )

    def _ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from crawler_spark.functions.html import parse_data_uri
        from crawler_spark.functions.images import sniff_format

        for pdf in batches:
            rows = []
            for url in pdf["img_url"]:
                parsed = parse_data_uri(url)
                if parsed is None:
                    continue
                payload = parsed[1]
                fmt = sniff_format(payload)
                if fmt is None:
                    continue
                iid = "duri" + hashlib.sha256(payload).hexdigest()[:16]
                rows.append((url, iid, payload, fmt))
            yield pd.DataFrame(rows, columns=["url", "image_id", "bytes", "fmt"])

    return uris.mapInPandas(_ingest, BYTE_STORE_SCHEMA)


_VALIDATE_FIELDS = [
    T.StructField("image_id", T.StringType(), False),
    T.StructField("fmt", T.StringType(), True),
    T.StructField("psnr_db", T.DoubleType(), False),
    T.StructField("phash_match", T.BooleanType(), False),
    T.StructField("dims_match", T.BooleanType(), False),
    T.StructField("passes", T.BooleanType(), False),
]
VALIDATE_SCHEMA = T.StructType(_VALIDATE_FIELDS)

PSNR_LOSSY_MIN_DB = 40.0


def validate_images(images: DataFrame, golden: DataFrame) -> DataFrame:
    """Per-row invariant: decoded pixels vs golden raw RGB buffers.

    golden(image_id, pixels, w, h, phash) — e.g. the fixture table or a
    prior snapshot. A row passes iff dims match, phash matches, and
    PSNR is inf (lossless) or ≥ 40 dB (lossy).
    """
    g = golden.select(
        "image_id",
        F.col("pixels").alias("g_pixels"),
        F.col("w").alias("g_w"),
        F.col("h").alias("g_h"),
        F.col("phash").alias("g_phash"),
    )
    j = images.join(g, "image_id", "inner").select(
        "image_id", "bytes", "fmt", "w", "h", "phash",
        "g_pixels", "g_w", "g_h", "g_phash",
    )

    def _val(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ps = psnr_batch(
                pdf["bytes"], pdf["fmt"], pdf["g_pixels"], pdf["g_w"], pdf["g_h"]
            )
            phash_ok = pdf["phash"] == pdf["g_phash"]
            dims_ok = (pdf["w"] == pdf["g_w"]) & (pdf["h"] == pdf["g_h"])
            lossy = pdf["fmt"].isin(LOSSY_FMTS)
            psnr_ok = ps.where(lossy, float("inf")) >= PSNR_LOSSY_MIN_DB
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "fmt": pdf["fmt"],
                    "psnr_db": ps,
                    "phash_match": phash_ok,
                    "dims_match": dims_ok,
                    "passes": phash_ok & dims_ok & psnr_ok,
                }
            )

    return j.mapInPandas(_val, VALIDATE_SCHEMA)


def near_duplicate_images(
    images: DataFrame, max_hamming: int = 7, n_bands: int | None = None
) -> DataFrame:
    """pHash near-dup pairs with a *guaranteed-recall* banding
    pre-filter: the 64-bit hash is split into ``n_bands`` equal bands;
    by pigeonhole a pair within Hamming distance d < n_bands shares at
    least one identical band, so candidate generation (a single
    equi-join on (band_idx, band_value)) misses nothing at the
    threshold. The exact Hamming check runs on candidates only — the
    LSH-then-verify shape, same as MinHash.

    ``n_bands`` defaults to the narrowest power-of-two banding that
    still guarantees recall (n_bands > max_hamming). Narrower bands →
    more collisions → more candidates, so keep ``max_hamming`` as tight
    as the use case allows: ≤3 runs on 16-bit bands, ≤7 on 8-bit
    bands. ``max_hamming >= n_bands`` is rejected rather than silently
    under-reporting (the r1 recall bug).
    """
    if n_bands is None:
        n_bands = next(p for p in (4, 8, 16, 32, 64) if p > max_hamming)
    if 64 % n_bands != 0:
        raise ValueError(f"n_bands must divide 64, got {n_bands}")
    if max_hamming >= n_bands:
        raise ValueError(
            f"banding guarantees recall only for max_hamming < n_bands "
            f"(pigeonhole); got max_hamming={max_hamming}, n_bands={n_bands}"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("band"),
                F.shiftrightunsigned(F.col("phash"), k * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for k in range(n_bands)
        ]
    )
    # Candidate generation runs over DISTINCT hashes, not image rows:
    # exact duplicates (the bulk of real corpora) never enter the
    # banded join, so each (band, val) bucket holds distinct hashes
    # only and the join size is governed by hash entropy, not corpus
    # size. Same-hash id pairs come from a cheap full-hash self-join;
    # cross-hash candidates expand back to ids afterwards.
    #
    # Scale economics (random-ish hashes, n = DISTINCT hash count):
    # expected candidates ~= n^2/2 * n_bands / 2^width, so
    #   max_hamming<=1 (2x32-bit bands)  ~ n^2 * 4.7e-10  -> any n
    #   max_hamming<=3 (4x16-bit bands)  ~ n^2 * 3.1e-5   -> n <~ 10^7
    #   max_hamming<=7 (8x8-bit bands)   ~ n^2 * 1.6e-2   -> n <~ 10^5
    # (tools/bench_phash.py measures this tier table). Past that,
    # tighten max_hamming or pre-cluster. Real phash corpora collapse
    # heavily under the distinct() (near-identical images share exact
    # hashes), which is what makes the 8-bit tier usable in practice.
    # the input is referenced FIVE times below (distinct hashes feeds a
    # self-join; ids expands candidates twice and feeds the full-hash
    # self-join). Fingerprint inputs are usually the product of an
    # expensive decode chain (real JPEG entropy decode in q59, FLAC +
    # FFT in q61) — without a materialization barrier every reference
    # re-runs that chain. localCheckpoint stores the 24 B/row
    # (id, phash) projection once (MEMORY_AND_DISK, cleaned with the
    # RDD): at 10^9 images that's ~24 GB cluster-wide, far cheaper
    # than 5× the decode. Lineage truncation is the documented trade,
    # stated precisely: checkpointed partitions live ONLY in executor
    # storage, so losing an executor mid-query fails the QUERY
    # ("checkpoint block not found") and the caller must resubmit —
    # there is no partition-level recompute path. On a long-lived
    # cluster where executor churn is expected, swap this for
    # reliable checkpoint() to a shared dir (setCheckpointDir) and
    # accept the write amplification, or persist() and accept that
    # recomputation re-enters the decode lineage.
    ids = images.select("image_id", "phash").localCheckpoint(eager=False)
    hashes = ids.select("phash").distinct()
    exploded = hashes.select("phash", F.explode(band_arr).alias("b")).select(
        "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val")
    )
    ha = exploded.select(F.col("phash").alias("ph_a"), "band", "val")
    hb = exploded.select(F.col("phash").alias("ph_b"), "band", "val")
    hash_pairs = (
        ha.join(hb, ["band", "val"])
        .filter(F.col("ph_a") < F.col("ph_b"))
        .select("ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    same = (
        ids.alias("x")
        .join(ids.alias("y"), "phash")
        .filter(F.col("x.image_id") < F.col("y.image_id"))
        .select(
            F.col("x.image_id").alias("id_a"),
            F.col("y.image_id").alias("id_b"),
            F.bit_count(F.lit(0)).alias("hamming"),
        )
    )
    cross = (
        hash_pairs.join(
            ids.select(F.col("phash").alias("ph_a"), F.col("image_id").alias("ia")),
            "ph_a",
        )
        .join(
            ids.select(F.col("phash").alias("ph_b"), F.col("image_id").alias("ib")),
            "ph_b",
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    return same.unionByName(cross)


def resize_images(
    images: DataFrame, out_w: int, out_h: int, out_fmt: str = "png"
) -> DataFrame:
    """Thumbnail stage: decode → deterministic resize (exact area
    averages on downscale, bilinear on upscale) → re-encode. One
    ``mapInPandas`` pass, map-only (no shuffle); rows that fail to
    decode come back with null bytes + ok=False so callers quarantine
    instead of losing the row."""
    from crawler_spark.functions.images import resize_batch

    cols = [c for c in images.columns if c not in ("bytes", "w", "h", "fmt")]
    schema = T.StructType(
        [images.schema[c] for c in cols]
        + [
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = resize_batch(pdf["bytes"], pdf["fmt"], out_w, out_h, out_fmt)
            out = pdf[cols].copy()
            out["bytes"] = res["bytes"]
            out["w"] = out_w
            out["h"] = out_h
            out["fmt"] = out_fmt
            out["ok"] = res["ok"]
            yield out

    return images.mapInPandas(_resize, schema)


def embed_images(images: DataFrame, band: int = 8) -> DataFrame:
    """Feature-extraction stage: decode → per-channel low-band DCT
    embedding (L2-normalized ``array<float>`` of length 3·band²).
    Map-only; the output column feeds the ANN/cosine operators
    (q25/q26/q39) unchanged. Decode failures yield null embeddings."""
    from crawler_spark.functions.images import embed_batch

    cols = [c for c in images.columns if c not in ("bytes",)]
    schema = T.StructType(
        [images.schema[c] for c in cols]
        + [T.StructField("embedding", T.ArrayType(T.FloatType()), True)]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            out["embedding"] = embed_batch(pdf["bytes"], pdf["fmt"], band)
            yield out

    return images.mapInPandas(_embed, schema)


# --------------------------------------------------------------------------
# EXIF: metadata extraction, orientation normalization, image-PII scrub
# --------------------------------------------------------------------------

EXIF_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("exif_ok", T.BooleanType(), False),
        T.StructField("has_exif", T.BooleanType(), False),
        T.StructField("orientation", T.IntegerType(), False),
        T.StructField("make", T.StringType(), True),
        T.StructField("model", T.StringType(), True),
        T.StructField("datetime_original", T.StringType(), True),
        T.StructField("has_gps", T.BooleanType(), False),
        T.StructField("gps_lat", T.DoubleType(), True),
        T.StructField("gps_lon", T.DoubleType(), True),
    ]
)


def extract_exif(images: DataFrame) -> DataFrame:
    """Per-image EXIF fields (jpg rows; other formats → no-exif rows).
    Map-only Arrow batches; structurally corrupt APP1 blocks surface as
    ``exif_ok=False`` (quarantine pattern) instead of failing the
    stage."""
    from crawler_spark.functions.exif import exif_fields

    def _ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw, fmt, iid in zip(
                pdf["bytes"].values, pdf["fmt"].values, pdf["image_id"].values
            ):
                rec = {
                    "image_id": iid, "exif_ok": True, "has_exif": False,
                    "orientation": 1, "make": None, "model": None,
                    "datetime_original": None, "has_gps": False,
                    "gps_lat": None, "gps_lon": None,
                }
                if fmt == "jpg" and raw is not None:
                    try:
                        f = exif_fields(bytes(raw))
                        if f is not None:
                            rec.update(
                                has_exif=True,
                                orientation=int(f["orientation"] or 1),
                                make=f["make"], model=f["model"],
                                datetime_original=f["datetime_original"],
                                has_gps=f["has_gps"],
                                gps_lat=f["gps_lat"], gps_lon=f["gps_lon"],
                            )
                    except ValueError:
                        rec["exif_ok"] = False
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in EXIF_SCHEMA.fields])

    return images.mapInPandas(_ex, EXIF_SCHEMA)


def scrub_image_pii(images: DataFrame) -> DataFrame:
    """Image-side PII scrub (the q51 twin for the payload axis): GPS
    IFDs, maker notes and unknown Exif tags are dropped by rebuilding
    each jpg's APP1 from the safe-tag allowlist
    (``functions/exif.py::strip_gps``); entropy-coded pixels are
    untouched, so decoded output is byte-identical. Non-jpg rows pass
    through. Adds ``had_gps`` (audit column). Map-only."""
    from crawler_spark.functions.exif import strip_gps

    cols = list(images.columns)
    schema = T.StructType(
        list(images.schema.fields) + [T.StructField("had_gps", T.BooleanType(), False)]
    )

    def _scrub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            new_bytes, had = [], []
            for raw, fmt in zip(pdf["bytes"].values, pdf["fmt"].values):
                if fmt == "jpg" and raw is not None:
                    try:
                        nb, hg = strip_gps(bytes(raw))
                    except ValueError:  # corrupt marker walk: keep bytes
                        nb, hg = bytes(raw), False
                    new_bytes.append(nb)
                    had.append(hg)
                else:
                    new_bytes.append(raw)
                    had.append(False)
            out["bytes"] = new_bytes
            out["had_gps"] = had
            yield out

    return images.mapInPandas(_scrub, schema)


def orient_images(images: DataFrame) -> DataFrame:
    """Orientation-normalized features: decode, apply the EXIF display
    transform (``auto_orient``), recompute (w, h, phash) in display
    space. Bytes stay as stored — no lossy re-encode; downstream
    near-dup/embedding stages read the corrected phash/dims plus the
    ``orientation`` audit column. Map-only Arrow batches."""
    from crawler_spark.functions.exif import auto_orient, exif_fields
    from crawler_spark.functions.images import decode_image, phash64

    cols = [c for c in images.columns if c not in ("w", "h", "phash")]
    schema = T.StructType(
        [images.schema[c] for c in cols]
        + [
            T.StructField("w", T.IntegerType(), True),
            T.StructField("h", T.IntegerType(), True),
            T.StructField("phash", T.LongType(), True),
            T.StructField("orientation", T.IntegerType(), False),
            T.StructField("orient_ok", T.BooleanType(), False),
        ]
    )

    def _orient(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[cols].copy()
            ws, hs, phs, ors, oks = [], [], [], [], []
            for raw, fmt in zip(pdf["bytes"].values, pdf["fmt"].values):
                w = h = ph = None
                o, ok = 1, False
                if raw is not None:
                    try:
                        arr = decode_image(bytes(raw), fmt)
                        if fmt == "jpg":
                            f = exif_fields(bytes(raw))
                            if f is not None:
                                o = int(f["orientation"] or 1)
                        arr = auto_orient(arr, o)
                        h, w = int(arr.shape[0]), int(arr.shape[1])
                        ph = int(phash64(arr))
                        ok = True
                    except Exception:
                        pass
                ws.append(w); hs.append(h); phs.append(ph)
                ors.append(o); oks.append(ok)
            out["w"] = pd.array(ws, dtype="Int32")
            out["h"] = pd.array(hs, dtype="Int32")
            out["phash"] = pd.array(phs, dtype="Int64")
            out["orientation"] = ors
            out["orient_ok"] = oks
            yield out

    return images.mapInPandas(_orient, schema)
