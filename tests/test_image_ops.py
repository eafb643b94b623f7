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


class TestImageProfile:
    def test_profile_equals_stats_join_phash(self, spark):
        """image_profile (one decode pass) must be column-identical to
        the two-pass image_stats ⨝ compute_phash composition."""
        from pyspark.sql import functions as F

        from pic2vec_spark.ops.multimodal import compute_phash, image_profile

        images = synth_images_df(spark, 64, seed=42)
        prof = image_profile(images).select(
            "image_id", "stats_ok", "phash64", "phash64_ok",
            "brightness", "contrast", "dyn_range", "entropy", "sharpness",
        )
        two_pass = (
            image_stats(images)
            .select(
                "image_id", "stats_ok",
                "brightness", "contrast", "dyn_range", "entropy", "sharpness",
            )
            .join(
                compute_phash(images).select(
                    "image_id", "phash64", "phash64_ok"
                ),
                "image_id",
            )
        )
        a = prof.orderBy("image_id").toPandas().set_index("image_id")
        b = two_pass.orderBy("image_id").toPandas().set_index("image_id")
        assert a[["stats_ok", "phash64", "phash64_ok"]].equals(
            b[["stats_ok", "phash64", "phash64_ok"]]
        )
        for c in ("brightness", "contrast", "dyn_range", "entropy", "sharpness"):
            x, y = a[c].values, b[c].values
            assert ((np.isnan(x) & np.isnan(y)) | (x == y)).all(), c
        # decode failures degrade both families together
        assert (a["stats_ok"] == a["phash64_ok"]).all()
        assert (~a["stats_ok"]).sum() > 0
        # one decode pass: exactly one mapInPandas over the scan
        assert F is not None


class TestImageRules:
    def test_rules_closed_form(self, spark):
        """Hand-built rows hit each rule exactly: black (brightness+
        entropy+dyn_range+sharpness fail), checkerboard (passes), tiny
        (resolution fails), banner (aspect fails), corrupt (decode +
        all pixel rules fail)."""
        from pic2vec_spark.ops.multimodal import (
            IMAGE_RULE_COLS,
            image_quality_rules,
        )

        def row(iid, img):
            return (iid, encode_png(img), img.shape[1], img.shape[0], "png")

        rows = [
            row("black", _const(0, 64, 64)),
            row("checker", _checker(64, 64)),
            row("tiny", _checker(8, 8)),
            row("banner", _checker(16, 64)),
            ("corrupt", b"\x00\x01junk", 64, 64, "png"),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string"
        )
        got = {
            r["image_id"]: r.asDict()
            for r in image_quality_rules(df).collect()
        }
        assert got["checker"]["passes"]
        assert all(got["checker"][c] for c in IMAGE_RULE_COLS)
        black = got["black"]
        assert not black["passes"]
        assert black["rule_decodes"] and black["rule_resolution"]
        assert not black["rule_brightness"] and not black["rule_entropy"]
        assert not black["rule_sharpness"] and not black["rule_dyn_range"]
        assert not got["tiny"]["rule_resolution"] and got["tiny"]["rule_aspect"]
        assert not got["banner"]["rule_aspect"] and got["banner"]["rule_resolution"]
        corrupt = got["corrupt"]
        assert not corrupt["rule_decodes"] and not corrupt["passes"]
        # metadata rules (w/h columns) don't need decode and still pass
        assert corrupt["rule_resolution"] and corrupt["rule_aspect"]
        # NULL pixel metrics coalesce to hard False, not NULL
        for c in ("rule_brightness", "rule_entropy", "rule_sharpness",
                  "rule_dyn_range"):
            assert corrupt[c] is False

    def test_rules_on_synth_corpus(self, spark):
        from pic2vec_spark.ops.multimodal import image_quality_rules

        images = synth_images_df(spark, 64, seed=42)
        out = image_quality_rules(images).toPandas()
        assert len(out) == 64
        # the synth corpus plants corrupt rows and flat fills: the gate
        # must both pass and fail something
        assert 0 < out["passes"].sum() < 64
        assert (out.loc[~out["rule_decodes"], "passes"] == False).all()  # noqa: E712


class TestImageSurvivors:
    def test_best_quality_member_kept(self, spark):
        """A near-dup family (same pixels, one blurred copy) keeps the
        SHARPEST member, not the min id; singletons rank 1."""
        from pic2vec_spark.ops.multimodal import image_neardup_survivors

        # 8px blocks: a mild blur keeps the LOW-frequency layout (the
        # pHash DCT) intact while killing the Laplacian edge energy —
        # a 1px checkerboard would blur to a flat gray and un-pair
        g = ((np.indices((32, 32)) // 8).sum(axis=0) % 2) * 255
        sharp = np.stack([g] * 3, axis=-1).astype(np.uint8)
        f = sharp.astype(np.float64)
        blurred = f.copy()
        acc = np.zeros_like(f[1:-1, 1:-1])
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                acc += f[1 + dy:31 + dy, 1 + dx:31 + dx]
        blurred[1:-1, 1:-1] = acc / 9.0  # symmetric 3x3: no phase shift
        blurred = np.clip(blurred, 0, 255).astype(np.uint8)
        lone = _const(128, 32, 32) + np.indices((32, 32)).sum(0).astype(
            np.uint8
        )[..., None]
        rows = [
            ("a_blur", encode_png(blurred), 32, 32, "png"),
            ("b_sharp", encode_png(sharp), 32, 32, "png"),
            ("c_lone", encode_png(lone), 32, 32, "png"),
            ("d_corrupt", b"nope", 32, 32, "png"),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, bytes binary, w int, h int, fmt string"
        )
        got = {
            r["image_id"]: r.asDict()
            for r in image_neardup_survivors(df, max_distance=10).collect()
        }
        assert "d_corrupt" not in got  # unfingerprintable -> excluded
        assert got["b_sharp"]["kept"] and got["b_sharp"]["quality_rank"] == 1
        assert not got["a_blur"]["kept"] and got["a_blur"]["quality_rank"] == 2
        # min-id cluster label, quality-ranked member choice
        assert got["a_blur"]["cluster_id"] == "a_blur"
        assert got["b_sharp"]["cluster_id"] == "a_blur"
        assert got["a_blur"]["n_members"] == 2
        assert got["c_lone"]["kept"] and got["c_lone"]["n_members"] == 1
        assert got["c_lone"]["cluster_id"] == "c_lone"

    def test_partition_invariance(self, spark):
        from pic2vec_spark.ops.multimodal import image_neardup_survivors

        images = synth_images_df(spark, 48, seed=42)
        a = image_neardup_survivors(images).orderBy("image_id").collect()
        b = (
            image_neardup_survivors(images.repartition(13))
            .orderBy("image_id")
            .collect()
        )
        assert a == b
        kept = [r for r in a if r["kept"]]
        assert 0 < len(kept) <= len(a)


def test_image_color_metrics_closed_form():
    """Solid colors and pure gray have closed-form color metrics."""
    import numpy as np

    from pic2vec_spark.ops.multimodal import image_color_metrics

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[..., 0] = 200
    s = image_color_metrics(red)
    assert s["mean_r"] == 200.0 and s["mean_g"] == 0.0 and s["mean_b"] == 0.0
    assert abs(s["mean_sat"] - 1.0) < 1e-12          # (max-min)/max = 1
    # rg = 200, yb = 100 everywhere: var 0, colorfulness = 0.3*sqrt(200^2+100^2)
    assert abs(s["colorfulness"] - 0.3 * (200**2 + 100**2) ** 0.5) < 1e-9

    gray = np.full((8, 8, 3), 77, dtype=np.uint8)
    s = image_color_metrics(gray)
    assert s["mean_sat"] == 0.0 and s["colorfulness"] == 0.0

    black = np.zeros((8, 8, 3), dtype=np.uint8)
    assert image_color_metrics(black)["mean_sat"] == 0.0  # max=0 guard


def test_image_color_stats_grayscale_verdict(spark):
    """A saturated PNG reads is_grayscale=False, a gray PNG True, and
    junk bytes degrade to NULL metrics + color_ok=False."""
    import numpy as np

    from pic2vec_spark.codecs import encode_png
    from pic2vec_spark.ops.multimodal import image_color_stats

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[..., 0] = 200
    gray = np.full((8, 8, 3), 77, dtype=np.uint8)
    rows = [
        ("color", bytearray(encode_png(red)), "png"),
        ("gray", bytearray(encode_png(gray)), "png"),
        ("junk", bytearray(b"nope"), "png"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r["image_id"]: r for r in image_color_stats(df).collect()}
    assert out["color"]["color_ok"] and not out["color"]["is_grayscale"]
    assert out["gray"]["color_ok"] and out["gray"]["is_grayscale"]
    assert not out["junk"]["color_ok"] and out["junk"]["mean_r"] is None
