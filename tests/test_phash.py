"""DCT perceptual hash: math oracle, robustness, Hamming near-dup over
64-bit signatures (the image analogue of simhash near-dup)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.codecs import decode_image, encode_png
from pic2vec_spark.ops.multimodal import _dct_matrix, compute_phash, phash64


def _gradient(seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    base = np.linspace(0, 255, 96, dtype=np.float64)
    img = (base[:, None] + base[None, :]) / 2 + rng.normal(0, 4, (96, 96))
    return np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=2)


def test_dct_matrix_is_orthonormal():
    d = _dct_matrix(32)
    assert np.allclose(d @ d.T, np.eye(32), atol=1e-12)


def test_phash_robust_to_brightness_far_from_random():
    img = _gradient(0)
    shifted = np.clip(img.astype(np.int32) + 8, 0, 255).astype(np.uint8)
    noise = (np.random.default_rng(99).integers(0, 256, img.shape)).astype(np.uint8)
    h, hs, hn = phash64(img), phash64(shifted), phash64(noise)
    def dist(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert dist(h, hs) <= 6          # perceptually same
    assert dist(h, hn) >= 16         # unrelated content
    assert phash64(img) == h         # deterministic


def test_spark_phash_matches_driver_oracle(spark):
    from pic2vec_spark.synth import synth_images_df

    images = synth_images_df(spark, 32, seed=42)
    got = compute_phash(images).select("image_id", "bytes", "fmt", "phash64", "phash64_ok").toPandas()
    for _, r in got.iterrows():
        try:
            img = decode_image(bytes(r["bytes"]), r["fmt"] or "")
        except Exception:
            assert not r.phash64_ok and r.phash64 == 0
            continue
        assert r.phash64_ok and r.phash64 == phash64(img), r.image_id
    assert got.phash64_ok.sum() >= 24


def test_hamming_neardup_64bit_signatures(spark):
    imgs = [
        ("a", _gradient(0)),
        ("b", np.clip(_gradient(0).astype(np.int32) + 8, 0, 255).astype(np.uint8)),
        ("c", np.random.default_rng(99).integers(0, 256, (96, 96, 3)).astype(np.uint8)),
    ]
    pdf = pd.DataFrame(
        {"image_id": [i for i, _ in imgs],
         "bytes": [encode_png(m) for _, m in imgs],
         "fmt": ["png"] * 3}
    )
    from pic2vec_spark.ops.dedup import hamming_neardup_pairs

    ph = compute_phash(spark.createDataFrame(pdf))
    pairs = hamming_neardup_pairs(
        ph.select("image_id", "phash64"), "image_id",
        max_distance=6, sig_col="phash64", bits=64,
    ).toPandas()
    got = {(r.id1, r.id2) for _, r in pairs.iterrows()}
    assert ("a", "b") in got
    assert ("a", "c") not in got and ("b", "c") not in got


def test_pigeonhole_complete_vs_all_pairs(spark):
    """Chunk-bucket candidates must find EXACTLY the all-pairs answer
    (pigeonhole guarantee), incl. with 64-bit remainder chunks."""
    rng = np.random.default_rng(5)
    sigs = rng.integers(-(2**63), 2**63, 60, dtype=np.int64)
    # plant near pairs: flip <=4 bits of some signatures
    planted = []
    for j in range(6):
        base = int(sigs[j])
        flipped = base
        for b in rng.integers(0, 64, rng.integers(1, 5)):
            flipped ^= 1 << int(b)
        flipped = flipped - (1 << 64) if flipped >= 1 << 63 else flipped
        planted.append(flipped)
    allsigs = [int(s) for s in sigs] + planted
    pdf = pd.DataFrame({"doc_id": range(len(allsigs)), "sig": pd.array(allsigs, dtype="int64")})
    from pic2vec_spark.ops.dedup import hamming_neardup_pairs

    got = hamming_neardup_pairs(
        spark.createDataFrame(pdf), "doc_id", max_distance=4, sig_col="sig", bits=64
    ).toPandas()
    got_pairs = {(r.id1, r.id2, r.hamming) for _, r in got.iterrows()}
    expect = set()
    for i in range(len(allsigs)):
        for j in range(i + 1, len(allsigs)):
            d = bin((allsigs[i] ^ allsigs[j]) & ((1 << 64) - 1)).count("1")
            if d <= 4:
                expect.add((i, j, d))
    assert got_pairs == expect and len(expect) >= 6


def test_hamming_sig_col_no_collision_with_existing_simhash(spark):
    """A non-default sig_col must work even when the input already has a
    'simhash' column (alias, not rename)."""
    import pandas as pd

    from pic2vec_spark.ops.dedup import hamming_neardup_pairs

    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "simhash": pd.array([999, 998, 997], dtype="int64"),
         "phash64": pd.array([0b1010, 0b1011, 0b110000], dtype="int64")}
    )
    out = hamming_neardup_pairs(
        spark.createDataFrame(pdf), "doc_id",
        max_distance=2, sig_col="phash64", bits=64,
    ).toPandas()
    got = {(r.id1, r.id2, r.hamming) for _, r in out.iterrows()}
    assert got == {(1, 2, 1)}  # 0b1010 vs 0b1011; others are 4+ bits apart


def test_dhash_closed_form_and_brightness_invariance():
    from pic2vec_spark.ops.multimodal import dhash64

    # strictly increasing columns -> every adjacent-column gradient is
    # positive -> all 64 bits set -> signed int64 -1
    ramp = np.tile(np.arange(0, 255, 255 // 10, dtype=np.uint8)[None, :, None], (9, 1, 3))
    assert dhash64(ramp) == -1
    # strictly decreasing -> no bits set
    assert dhash64(ramp[:, ::-1]) == 0
    # a global brightness shift preserves every gradient direction
    # (compress to [0,127] first so +40 never clips and every strict
    # inequality survives exactly)
    img = (_gradient(3) // 2).astype(np.uint8)
    shifted = (img.astype(np.int32) + 40).astype(np.uint8)
    assert dhash64(img) == dhash64(shifted)


def test_ahash_closed_form():
    from pic2vec_spark.ops.multimodal import ahash64

    # left half dark, right half bright: bits set exactly where col >= 4
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:] = 200
    expect = 0
    for r in range(8):
        for c in range(4, 8):
            expect |= 1 << (r * 8 + c)
    expect = expect - (1 << 64) if expect >= 1 << 63 else expect
    assert ahash64(img) == expect


def test_fused_fingerprints_equal_single_pass(spark):
    from pic2vec_spark.ops.multimodal import (
        ahash64,
        compute_fingerprints,
        dhash64,
    )
    from pic2vec_spark.synth import synth_images_df

    images = synth_images_df(spark, 32, seed=42)
    fused = (
        compute_fingerprints(images)
        .select("image_id", "bytes", "fmt", "phash64", "dhash64", "ahash64", "fp_ok")
        .toPandas()
    )
    single = compute_phash(images).select("image_id", "phash64").toPandas()
    merged = fused.merge(single, on="image_id", suffixes=("", "_single"))
    # fused phash == single-pass phash row for row (ok rows)
    ok = merged[merged.fp_ok]
    assert (ok.phash64 == ok.phash64_single).all()
    for _, r in fused.iterrows():
        try:
            img = decode_image(bytes(r["bytes"]), r["fmt"] or "")
        except Exception:
            assert not r.fp_ok and r.dhash64 == 0 and r.ahash64 == 0
            continue
        assert r.fp_ok
        assert r.dhash64 == dhash64(img)
        assert r.ahash64 == ahash64(img)
