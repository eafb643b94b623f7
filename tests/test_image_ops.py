"""Image quality-stats + deterministic augmentation (ops/multimodal.py).

Closed-form kernels first (constant / checkerboard images have known
brightness, entropy, and sharpness), then the Spark surface: missing
semantics on undecodable rows, determinism under repartitioning, and
lossless round-trips for the flip-family augmentations."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.codecs import decode_image, encode_png
from pic2vec_spark.ops.multimodal import (
    AUGMENT_OPS,
    _augment_kernel,
    augment_images,
    image_quality_stats,
    image_stats,
)
from pic2vec_spark.synth import synth_images_df


def _const(v: int, h: int = 8, w: int = 8) -> np.ndarray:
    return np.full((h, w, 3), v, dtype=np.uint8)


def _checker(h: int = 8, w: int = 8) -> np.ndarray:
    g = (np.indices((h, w)).sum(axis=0) % 2) * 255
    return np.stack([g] * 3, axis=-1).astype(np.uint8)


class TestQualityKernel:
    def test_constant_image(self):
        s = image_quality_stats(_const(77))
        assert s["brightness"] == 77.0
        assert s["contrast"] == 0.0
        assert s["dyn_range"] == 0.0
        assert s["entropy"] == 0.0
        assert s["sharpness"] == 0.0

    def test_checkerboard_has_structure(self):
        s = image_quality_stats(_checker())
        # two equally-likely gray levels -> exactly 1 bit of entropy
        assert abs(s["entropy"] - 1.0) < 1e-9
        assert s["dyn_range"] == 255.0
        assert s["sharpness"] > 1000.0  # maximal second derivative

    def test_blur_reduces_sharpness(self):
        img = _checker(16, 16).astype(np.float64)
        k = np.ones((2, 2, 1)) / 4.0
        blurred = img.copy()
        blurred[:-1, :-1] = (
            img[:-1, :-1] + img[1:, :-1] + img[:-1, 1:] + img[1:, 1:]
        ) / 4.0
        s_sharp = image_quality_stats(_checker(16, 16))
        s_blur = image_quality_stats(np.clip(blurred, 0, 255).astype(np.uint8))
        assert s_blur["sharpness"] < s_sharp["sharpness"]
        assert k.shape == (2, 2, 1)  # silence lint on helper


class TestAugmentKernel:
    def test_flips_are_involutions(self):
        img = _checker(6, 10)
        for op in ("hflip", "vflip", "rot180"):
            out = _augment_kernel(_augment_kernel(img, op), op)
            assert np.array_equal(out, img), op

    def test_rot180_is_both_flips(self):
        img = (np.arange(4 * 5 * 3, dtype=np.uint8)).reshape(4, 5, 3)
        assert np.array_equal(
            _augment_kernel(img, "rot180"),
            _augment_kernel(_augment_kernel(img, "hflip"), "vflip"),
        )

    def test_crop_is_size_stable(self):
        img = _checker(10, 14)
        assert _augment_kernel(img, "crop80").shape == img.shape

    def test_brightness_clips(self):
        img = _const(250)
        out = _augment_kernel(img, "bright120")
        assert out.max() == 255 and out.dtype == np.uint8

    def test_unknown_op_raises(self):
        with pytest.raises(ValueError, match="unknown augmentation"):
            _augment_kernel(_const(1), "zoom")


class TestSparkSurface:
    def test_image_stats_missing_semantics(self, spark):
        out = image_stats(synth_images_df(spark, 64, seed=42)).toPandas()
        assert len(out) == 64
        bad = out[~out["stats_ok"]]
        assert 1 <= len(bad) <= 10  # gif/corrupt/empty synth rows
        assert bad["brightness"].isna().all()
        good = out[out["stats_ok"]]
        assert good["brightness"].between(0, 255).all()
        assert (good["entropy"] >= 0).all()

    def test_augment_deterministic_and_partition_invariant(self, spark):
        images = synth_images_df(spark, 48, seed=42)
        a = augment_images(images, seed=7).select("image_id", "aug_op", "aug_ok")
        b = augment_images(images.repartition(13), seed=7).select(
            "image_id", "aug_op", "aug_ok"
        )
        pa = a.toPandas().sort_values("image_id").reset_index(drop=True)
        pb = b.toPandas().sort_values("image_id").reset_index(drop=True)
        assert pa.equals(pb)
        assert set(pa["aug_op"]).issubset(set(AUGMENT_OPS))

    def test_augment_lossless_flip_roundtrip(self, spark):
        # a PNG row: decode(aug) must equal the kernel output exactly
        img = _checker(12, 12)
        df = spark.createDataFrame(
            [("x1", bytearray(encode_png(img)), "png")],
            schema="image_id string, bytes binary, fmt string",
        )
        row = augment_images(df, ops=["hflip"], seed=0).collect()[0]
        assert row["aug_ok"] and row["aug_op"] == "hflip"
        assert np.array_equal(
            decode_image(bytes(row["aug"]), "png"), _augment_kernel(img, "hflip")
        )

    def test_augment_invalid_op_rejected(self, spark):
        df = synth_images_df(spark, 4, seed=42)
        with pytest.raises(ValueError, match="unknown augmentation"):
            augment_images(df, ops=["sepia"])
