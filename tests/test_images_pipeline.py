"""Per-row image payload invariants (BASELINE.json input_hint):
decoded-pixel PSNR (≥40 dB lossy, exact for lossless), phash + caption
equality vs the reference extraction, and the codec round-trips the
engine-side kernel depends on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import images as im
from crawler_spark.operators.images_pipeline import (
    build_images_table,
    near_duplicate_images,
    validate_images,
)
from crawler_spark.sources.fixtures_io import read_table


# ---------------------------------------------------------------------------
# codec unit level (no Spark)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png"])
def test_lossless_roundtrip(fmt):
    rng = np.random.default_rng(7)
    for shape in [(16, 16, 3), (33, 17, 3), (64, 128, 3)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        back = im.decode_image(im.encode_image(arr, fmt), fmt)
        assert np.array_equal(arr, back), fmt


def test_lossy_psnr_above_40():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    back = im.decode_image(im.encode_image(arr, "qjpg"), "qjpg")
    p = im.psnr(arr, back)
    assert 40.0 <= p < 60.0  # quantization step 4 ⇒ ≈ 46.9 dB expected


def test_phash_stability_and_sensitivity():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    h1 = im.phash64(arr)
    # tiny perturbation → small hamming distance
    h2 = im.phash64(np.clip(arr.astype(np.int16) + 2, 0, 255).astype(np.uint8))
    assert im.hamming64(h1, h2) <= 8
    # different image → large distance
    other = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    assert im.hamming64(h1, im.phash64(other)) > 16


# ---------------------------------------------------------------------------
# Spark pipeline level
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def images_built(spark, fixture_dir, engine):
    byte_store = read_table(spark, fixture_dir, "images")
    return build_images_table(engine.extractions(), byte_store).cache()


def test_caption_equality_vs_reference(images_built, world):
    """North rule: exact caption equality against reference extraction —
    the oracle's caption for each crawled image URL must equal the
    engine images-table caption byte-for-byte."""
    got = {r["img_url"]: r["caption"] for r in images_built.collect()}
    assert got  # non-empty
    for url, caption in got.items():
        assert caption == world.images[url].caption


def test_dimensions_and_phash_from_decode(images_built, world):
    """w/h/phash are engine-decoded, never copied — they must match the
    fixture's golden values for every crawled image."""
    rows = images_built.collect()
    for r in rows:
        spec = world.images[r["img_url"]]
        assert r["decode_ok"]
        assert (r["w"], r["h"]) == (spec.w, spec.h)
        assert r["phash"] == spec.phash
        assert r["fmt"] == spec.fmt


def test_psnr_invariant(spark, images_built, fixture_dir):
    """PSNR vs golden pixels: +inf for lossless rows, ≥40 dB lossy."""
    golden = read_table(spark, fixture_dir, "images").select(
        "image_id", "pixels", "w", "h", "phash"
    )
    val = validate_images(images_built, golden).collect()
    assert val
    for r in val:
        assert r["passes"], (r["image_id"], r["fmt"], r["psnr_db"])
        if r["fmt"] in im.LOSSY_FMTS:
            # golden = decode(encode(.)) per fixture policy, so the
            # stored bytes round-trip exactly; ≥40 dB is the invariant
            # (the strictly-lossy case is covered at the codec level by
            # test_lossy_psnr_above_40)
            assert r["psnr_db"] >= 40.0
        else:
            assert r["psnr_db"] == float("inf")


def test_input_hint_schema(images_built):
    core = images_built.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    types = dict(core.dtypes)
    assert types == {
        "image_id": "string",
        "bytes": "binary",
        "w": "int",
        "h": "int",
        "fmt": "string",
        "caption": "string",
        "phash": "bigint",
    }


def test_near_duplicate_phash_banding(spark, world):
    """A re-encoded (lossy) copy of an image must surface as a phash
    near-dup pair; unrelated images must not."""
    specs = list(world.images.values())[:12]
    rows = []
    for s in specs:
        rows.append((s.image_id, s.phash))
        arr = np.frombuffer(s.pixels, np.uint8).reshape(s.h, s.w, 3)
        lossy = im.decode_image(im.encode_image(arr, "qjpg"), "qjpg")
        rows.append((s.image_id + "_copy", im.phash64(lossy)))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {
        (r["id_a"], r["id_b"]) for r in near_duplicate_images(df, max_hamming=8).collect()
    }
    for s in specs:
        a, b = sorted([s.image_id, s.image_id + "_copy"])
        assert (a, b) in pairs, f"missing near-dup pair for {s.image_id}"


def test_near_duplicate_recall_at_threshold(spark):
    """Adversarial recall case the r1 4×16-bit banding missed: a pair
    at Hamming distance 7 whose differing bits are spread so that EVERY
    16-bit band differs (bits 0,8,16,24,32,40,48 → 2+2+2+1 diffs per
    old band). With guaranteed banding (n_bands > max_hamming) the pair
    must surface."""
    ph_a = 0
    ph_b = sum(1 << p for p in (0, 8, 16, 24, 32, 40, 48))  # hamming 7
    df = spark.createDataFrame(
        [("a", ph_a), ("b", ph_b), ("far", -1)], "image_id string, phash long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in near_duplicate_images(df, max_hamming=7).collect()
    }
    assert ("a", "b", 7) in got
    assert all(p[:2] == ("a", "b") for p in got)


def test_near_duplicate_rejects_unsafe_banding(spark):
    df = spark.createDataFrame([("a", 0)], "image_id string, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        near_duplicate_images(df, max_hamming=4, n_bands=4)


def test_gif_roundtrip_and_features():
    """GIF87a/89a codec (r3): palette images round-trip LOSSLESSLY
    through real GIF LZW (variable-width LSB packing, 12-bit cap with
    table reset), interlace, local/global color tables, extension
    skipping; > 256 colors refuse to encode."""
    rng = np.random.default_rng(42)
    pal16 = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    arr = pal16[rng.integers(0, 16, (64, 64))]
    assert np.array_equal(im.decode_gif(im.encode_gif(arr)), arr)
    assert np.array_equal(im.decode_gif(im.encode_gif(arr, interlace=True)), arr)
    # dispatch through the CODECS table
    assert np.array_equal(im.decode_image(im.encode_image(arr, "gif"), "gif"), arr)
    # 256-color image forces 12-bit growth + encoder table reset
    pal256 = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    big = pal256[rng.integers(0, 256, (128, 128))]
    assert np.array_equal(im.decode_gif(im.encode_gif(big)), big)
    # comment extension between color table and image block is skipped
    two = np.where(
        rng.integers(0, 2, (33, 17, 1)).astype(bool), np.uint8(255), np.uint8(0)
    ).repeat(3, axis=2)
    g = bytearray(im.encode_gif(two))
    i = g.index(0x2C, 13 + 3 * 2)
    patched = bytes(g[:i]) + bytes([0x21, 0xFE, 5]) + b"hello" + b"\x00" + bytes(g[i:])
    assert np.array_equal(im.decode_gif(patched), two)
    with pytest.raises(ValueError, match="256 distinct"):
        im.encode_gif(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# resize + embedding kernels and operators (r3)
# ---------------------------------------------------------------------------


def test_resize_rgb_invariants():
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # identity
    assert np.array_equal(im.resize_rgb(arr, 64, 64), arr)
    # exact integer downscale == 2x2 block means
    half = im.resize_rgb(arr, 32, 32)
    blocks = arr.astype(np.float64).reshape(32, 2, 32, 2, 3).mean((1, 3))
    assert np.array_equal(half, np.clip(np.round(blocks), 0, 255).astype(np.uint8))
    # mixed up/down per axis + shape
    assert im.resize_rgb(arr, 128, 16).shape == (128, 16, 3)
    # constant image is resize-invariant in both directions
    const = np.full((16, 16, 3), 77, np.uint8)
    assert (im.resize_rgb(const, 40, 24) == 77).all()
    assert (im.resize_rgb(const, 5, 9) == 77).all()
    with pytest.raises(ValueError):
        im.resize_rgb(arr, 0, 10)


def test_dct_embedding_similarity():
    rng = np.random.default_rng(37)
    arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    v0 = im.dct_features(arr)
    assert v0.shape == (192,) and v0.dtype == np.float32
    assert abs(float(np.linalg.norm(v0)) - 1.0) < 1e-5
    # a REAL JPEG re-encode stays at cosine ~1
    jpg = im.decode_image(im.encode_image(arr, "jpg"), "jpg")
    assert float(v0 @ im.dct_features(jpg)) > 0.99
    # brightness shift is invariant (DC dropped)
    brighter = np.clip(arr.astype(np.int16) + 40, 0, 255).astype(np.uint8)
    assert float(v0 @ im.dct_features(brighter)) > 0.97
    # unrelated noise is near-orthogonal
    other = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    assert abs(float(v0 @ im.dct_features(other))) < 0.5


def test_resize_and_embed_operators(spark):
    from crawler_spark.operators.images_pipeline import embed_images, resize_images

    rng = np.random.default_rng(41)
    rows = []
    arrs = {}
    for i in range(6):
        arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        fmt = ["png", "jpg", "bmp"][i % 3]
        arrs[f"im{i}"] = arr
        rows.append((f"im{i}", im.encode_image(arr, fmt), fmt))
    rows.append(("bad", b"\x00garbage", "png"))  # quarantine path
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")

    out = {r["image_id"]: r for r in resize_images(df, 16, 12, "png").collect()}
    assert not out["bad"]["ok"] and out["bad"]["bytes"] is None
    for i in range(6):
        r = out[f"im{i}"]
        assert r["ok"] and (r["w"], r["h"], r["fmt"]) == (16, 12, "png")
        dec = im.decode_image(bytes(r["bytes"]), "png")
        assert dec.shape == (12, 16, 3)
    # lossless-path thumbnails are exactly the kernel's output
    ref = im.resize_rgb(arrs["im0"], 12, 16)
    assert np.array_equal(im.decode_image(bytes(out["im0"]["bytes"]), "png"), ref)

    emb = {r["image_id"]: r["embedding"] for r in embed_images(df).collect()}
    assert emb["bad"] is None
    v0 = np.array(emb["im0"], dtype=np.float32)
    assert v0.shape == (192,)
    assert np.allclose(v0, im.dct_features(arrs["im0"]), atol=1e-6)


def test_engine_materialize_images(spark, engine, fixture_dir, world):
    """The engine commits the input_hint images table to its snapshot
    store (north rule: image+caption pairs live in the table store),
    and the committed rows equal the pipeline's output with every row
    decode-validated."""
    byte_store = read_table(spark, fixture_dir, "images")
    counts = engine.materialize_images(byte_store)
    assert counts["images"] > 0
    assert counts["decode_ok"] == counts["images"]
    stored = engine.store.read("images")
    assert {f.name for f in stored.schema.fields} >= {
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    }
    # captions in the STORE still match the reference extraction
    got = {r["img_url"]: r["caption"] for r in stored.collect()}
    for url, caption in got.items():
        assert caption == world.images[url].caption


def test_near_duplicate_exact_dup_collapse_parity(spark):
    """The distinct-hash rework (r3 scale fix): with many EXACT
    duplicates in the corpus, the output pair set must still equal
    brute force — same-hash pairs at hamming 0, cross-hash pairs once
    each, nothing double-counted via multiple band collisions."""
    import itertools

    hashes = {
        "h0": 0x0123456789ABCDEF,
        "h1": 0x0123456789ABCDEE,  # hamming 1 from h0
        "far": 0x5555555555555555,
    }
    rows = []
    for i in range(4):  # 4 exact copies of h0
        rows.append((f"a{i}", hashes["h0"]))
    for i in range(3):  # 3 exact copies of h1
        rows.append((f"b{i}", hashes["h1"]))
    rows.append(("z", hashes["far"]))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in near_duplicate_images(df, max_hamming=7).collect()
    }
    # brute force over all pairs
    exp = {}
    for (ia, pa), (ib, pb) in itertools.combinations(rows, 2):
        h = bin((pa ^ pb) & 0xFFFFFFFFFFFFFFFF).count("1")
        if h <= 7:
            a, b = sorted([ia, ib])
            exp[(a, b)] = h
    assert got == exp
    assert len(got) == 6 + 3 + 12  # C(4,2) + C(3,2) + 4*3 cross
