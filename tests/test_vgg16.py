"""VGG16 NumPy forward pass: plan-width parity at all depths + a small
end-to-end Spark featurize vs the oracle (second executable model)."""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.featurize import featurize_images
from pic2vec_spark.model import vgg16_features, vgg16_weights
from pic2vec_spark.oracle import oracle_featurize
from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.synth import IMAGES_SCHEMA, synth_images_pdf


@pytest.mark.parametrize("depth,width", [(1, 4096), (2, 4096), (3, 512), (4, 512)])
def test_vgg16_widths_match_reference_matrix(depth, width):
    """Widths per depth from the reference's output-size matrix
    (tests/test_build_featurizer.py:280-287)."""
    x = np.random.default_rng(1).normal(0, 50, (1, 224, 224, 3)).astype(np.float32)
    f = vgg16_features(x, vgg16_weights(0, depth), depth)
    assert f.shape == (1, width)
    assert np.isfinite(f).all()


def test_vgg16_weights_pruned_by_depth():
    """depth>=3 must not materialize the ~520 MB fc blocks."""
    w3 = vgg16_weights(0, 3)
    assert "fc1/kernel" not in w3 and "fc2/kernel" not in w3
    w2 = vgg16_weights(0, 2)
    assert "fc1/kernel" in w2 and "fc2/kernel" not in w2


def test_vgg16_spark_matches_oracle(spark):
    """Small end-to-end run (VGG16 is ~20x squeezenet's FLOPs)."""
    pdf = synth_images_pdf(6, seed=7)
    plan = FeaturizerPlan.build("vgg16", depth=3, autosample=True)  # 256 feats
    got = (
        featurize_images(
            spark.createDataFrame(pdf, schema=IMAGES_SCHEMA), plan
        )
        .select("image_id", "missing", "features")
        .toPandas()
        .set_index("image_id")
    )
    expected = oracle_featurize(pdf, plan).set_index("image_id")
    for iid in expected.index:
        assert bool(got.loc[iid, "missing"]) == bool(expected.loc[iid, "missing"])
        assert np.allclose(
            np.array(got.loc[iid, "features"], dtype=np.float32),
            np.array(expected.loc[iid, "features"], dtype=np.float32),
            atol=1e-4,  # 15 GFLOP accumulation: slightly looser than 1e-5
        )
    assert all(len(f) == 256 for f in got["features"])


def test_vgg19_widths_and_conv_structure():
    """vgg19: blocks 2-2-4-4-4 (16 convs); depth map {1:1,2:2,3:4,4:9}
    lands on fc2/fc1/block5_pool/block4_pool -> widths 4096/4096/512/512
    (reference output-size matrix, tests/test_build_featurizer.py:284-290)."""
    from pic2vec_spark.model import (
        _vgg_convs,
        _vgg_n_convs,
        vgg19_features,
        vgg19_weights,
    )

    assert len(_vgg_convs(19)) == 16 and len(_vgg_convs(16)) == 13
    # depth 4 runs through block4_pool: 12 convs for vgg19, 10 for vgg16
    assert _vgg_n_convs(19, 4) == 12 and _vgg_n_convs(16, 4) == 10
    x = np.random.default_rng(2).normal(0, 50, (1, 224, 224, 3)).astype(np.float32)
    for depth, width in [(3, 512), (4, 512)]:
        f = vgg19_features(x, vgg19_weights(0, depth), depth)
        assert f.shape == (1, width) and np.isfinite(f).all()
    # d3 (after block5_pool) and d4 (after block4_pool) must differ
    f3 = vgg19_features(x, vgg19_weights(0, 3), 3)
    f4 = vgg19_features(x, vgg19_weights(0, 4), 4)
    assert not np.allclose(f3, f4)


def test_vgg19_spark_matches_oracle(spark):
    pdf = synth_images_pdf(4, seed=9)
    plan = FeaturizerPlan.build("vgg19", depth=4, autosample=True)  # 256 feats
    got = (
        featurize_images(
            spark.createDataFrame(pdf, schema=IMAGES_SCHEMA), plan
        )
        .select("image_id", "missing", "features")
        .toPandas()
        .set_index("image_id")
    )
    expected = oracle_featurize(pdf, plan).set_index("image_id")
    for iid in expected.index:
        assert bool(got.loc[iid, "missing"]) == bool(expected.loc[iid, "missing"])
        assert np.allclose(
            np.array(got.loc[iid, "features"], dtype=np.float32),
            np.array(expected.loc[iid, "features"], dtype=np.float32),
            atol=1e-4,
        )
    assert all(len(f) == 256 for f in got["features"])


def test_resnet50_structure_and_widths():
    """53 convs at depth 1 (conv1 + 16 bottlenecks x 3 + 4 shortcut
    convs); every depth's output is 2048-wide (the cut point moves, the
    channel width does not — reference output-size matrix)."""
    from pic2vec_spark.model import (
        _resnet_conv_specs,
        resnet50_features,
        resnet50_weights,
    )

    assert len(_resnet_conv_specs(1)) == 53
    assert len(_resnet_conv_specs(4)) == 53 - 2 * 3  # minus blocks 5b, 5c
    x = np.random.default_rng(3).normal(0, 50, (1, 224, 224, 3)).astype(np.float32)
    outs = {}
    for depth in (1, 2, 3, 4):
        f = resnet50_features(x, resnet50_weights(0, depth), depth)
        assert f.shape == (1, 2048) and np.isfinite(f).all()
        outs[depth] = f
    # the four decapitation points are genuinely different layers
    for a in (1, 2, 3, 4):
        for b in (1, 2, 3, 4):
            if a < b:
                assert not np.allclose(outs[a], outs[b]), (a, b)


def test_resnet50_weights_pruned_by_depth():
    from pic2vec_spark.model import resnet50_weights

    w4 = resnet50_weights(0, 4)
    assert "res5b_branch2a/kernel" not in w4 and "res5a_branch2a/kernel" in w4
    w3 = resnet50_weights(0, 3)
    assert "res5c_branch2a/kernel" not in w3 and "res5b_branch2a/kernel" in w3


def test_resnet50_spark_matches_oracle(spark):
    pdf = synth_images_pdf(4, seed=13)
    plan = FeaturizerPlan.build("resnet50", depth=3, autosample=True)  # 1024 feats
    got = (
        featurize_images(
            spark.createDataFrame(pdf, schema=IMAGES_SCHEMA), plan
        )
        .select("image_id", "missing", "features")
        .toPandas()
        .set_index("image_id")
    )
    expected = oracle_featurize(pdf, plan).set_index("image_id")
    for iid in expected.index:
        assert bool(got.loc[iid, "missing"]) == bool(expected.loc[iid, "missing"])
        ga = np.array(got.loc[iid, "features"], dtype=np.float64)
        ea = np.array(expected.loc[iid, "features"], dtype=np.float64)
        # activations reach ~1e4-1e5 after 40+ conv+BN layers, so compare
        # with a relative tolerance (atol alone is meaningless at that scale)
        assert np.allclose(ga, ea, rtol=1e-4, atol=1e-2)
    assert all(len(f) == 1024 for f in got["features"])
