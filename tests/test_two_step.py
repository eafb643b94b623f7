"""Two-step entry point: decode_images (load_data) then
featurize_preloaded (featurize_preloaded_data) — the reference's
entry-point-3 (/root/reference/pic2vec/image_featurizer.py:182-344),
including the grayscale decode option
(feature_preprocessing.py:321,426: channels = 3 - 2*grayscale).
"""

import numpy as np
import pandas as pd
import pytest

from pic2vec_spark.featurize import (
    decode_images,
    featurize_images,
    featurize_preloaded,
)
from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.synth import synth_images_df


@pytest.fixture(scope="module")
def images(spark):
    return synth_images_df(spark, 48, seed=42).cache()


def test_two_step_equals_one_step(spark, images):
    """EP3 must equal EP2 on the same input — the reference asserts both
    paths against the same golden CSVs (tests/test_image_featurizer.py)."""
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    one = featurize_images(images, plan).select("image_id", "missing", "features")
    decoded = decode_images(
        images, size=plan.target_size, preprocess_mode=plan.preprocess_mode
    )
    two = featurize_preloaded(decoded, plan).select("image_id", "missing", "features")
    a = one.toPandas().sort_values("image_id").reset_index(drop=True)
    b = two.toPandas().sort_values("image_id").reset_index(drop=True)
    assert list(a.image_id) == list(b.image_id)
    assert list(a.missing) == list(b.missing)
    fa = np.stack(a.features.map(np.asarray))
    fb = np.stack(b.features.map(np.asarray))
    assert np.allclose(fa, fb, atol=1e-5)  # the reference's ATOL (enums.py:9)


def test_decode_grayscale_matches_luma_closed_form(spark, images):
    """grayscale=True == PIL 'L' truncated ITU-R 601-2 luma applied after
    the nearest resize, channels=1, zeros for missing rows."""
    from pic2vec_spark.codecs import decode_image
    from pic2vec_spark.preprocess import resize_nearest, to_grayscale

    out = decode_images(images, size=(64, 64), grayscale=True).toPandas()
    src = {r.image_id: (r.bytes, r.fmt) for r in images.collect()}
    assert (out.px_c == 1).all() and (out.px_h == 64).all()
    checked = 0
    for _, row in out.iterrows():
        data, fmt = src[row.image_id]
        try:
            img = decode_image(bytes(data), fmt or "")
        except Exception:
            assert row.missing
            assert not np.asarray(row.pixels).any()
            continue
        expect = to_grayscale(resize_nearest(img, (64, 64))).astype(np.float32)
        got = np.asarray(row.pixels, dtype=np.float32).reshape(64, 64, 1)
        assert np.array_equal(got, expect), row.image_id
        checked += 1
    assert checked >= 30  # most synth images decode


def test_preloaded_guards(spark, images):
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    gray = decode_images(images.limit(4), size=plan.target_size, grayscale=True)
    with pytest.raises(Exception, match="3-channel"):
        featurize_preloaded(gray, plan).collect()
    raw = decode_images(images.limit(4), size=plan.target_size)  # mode ''
    with pytest.raises(Exception, match="preprocess"):
        featurize_preloaded(raw, plan).collect()
    small = decode_images(
        images.limit(4), size=(32, 32), preprocess_mode=plan.preprocess_mode
    )
    with pytest.raises(Exception, match="target_size"):
        featurize_preloaded(small, plan).collect()
    with pytest.raises(ValueError, match="mutually exclusive"):
        decode_images(images, grayscale=True, preprocess_mode="caffe")


def test_decoded_pixels_roundtrip_through_parquet(spark, images, tmp_path):
    """The decode result must persist/rescan losslessly (the whole point
    of the two-step path: decode once, featurize many times)."""
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    decoded = decode_images(
        images.limit(8), size=plan.target_size, preprocess_mode=plan.preprocess_mode
    ).select("image_id", "missing", "pixels", "px_h", "px_w", "px_c", "px_mode")
    p = str(tmp_path / "decoded")
    decoded.write.parquet(p)
    back = spark.read.parquet(p)
    feats = featurize_preloaded(back, plan).toPandas()
    assert len(feats) == 8 and feats.features.map(len).eq(plan.num_features).all()
