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


def test_depthwise_conv_matches_naive():
    from pic2vec_spark.nn import depthwise_conv2d

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 9, 9, 5)).astype(np.float32)
    w = rng.normal(size=(3, 3, 5, 1)).astype(np.float32)
    got = depthwise_conv2d(x, w, padding="valid")
    # naive sliding window per channel
    exp = np.zeros((2, 7, 7, 5), dtype=np.float32)
    for n in range(2):
        for i in range(7):
            for j in range(7):
                for c in range(5):
                    exp[n, i, j, c] = (x[n, i:i+3, j:j+3, c] * w[:, :, c, 0]).sum()
    assert np.allclose(got, exp, atol=1e-5)


def test_maxpool_same_vs_valid():
    from pic2vec_spark.nn import maxpool2d

    x = np.arange(2 * 5 * 5 * 1, dtype=np.float32).reshape(2, 5, 5, 1)
    assert maxpool2d(x, 3, 2, "valid").shape == (2, 2, 2, 1)
    same = maxpool2d(x, 3, 2, "same")
    assert same.shape == (2, 3, 3, 1)
    assert np.isfinite(same).all()  # -inf padding never leaks out


def test_xception_widths_and_cuts():
    """Depth map {1:1,2:8,3:18,4:28} → avg_pool(2048) / block13 add
    (1024) / middle block 12 add (728) / block 11 add (728) — the
    reference's output-size matrix for xception."""
    from pic2vec_spark.model import xception_features, xception_weights

    x = np.random.default_rng(6).normal(0, 0.9, (1, 299, 299, 3)).astype(np.float32)
    outs = {}
    for depth, width in ((1, 2048), (2, 1024), (3, 728), (4, 728)):
        f = xception_features(x, xception_weights(0, depth), depth)
        assert f.shape == (1, width) and np.isfinite(f).all(), depth
        outs[depth] = f
    assert not np.allclose(outs[3], outs[4])  # block12 vs block11 cut
    w4 = xception_weights(0, 4)
    assert "block12_sepconv1/depthwise" not in w4 and "block13_res/kernel" not in w4
    assert "block13_res/kernel" in xception_weights(0, 2)
    # residual shortcuts are 1x1, stem convs 3x3
    assert xception_weights(0, 2)["block13_res/kernel"].shape[:2] == (1, 1)
    assert w4["block1_conv1/kernel"].shape[:2] == (3, 3)


def test_xception_spark_matches_oracle(spark):
    pdf = synth_images_pdf(4, seed=17)
    plan = FeaturizerPlan.build("xception", depth=3, autosample=True)  # 364 feats
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
        # atol scales with the activation magnitude: individual features
        # are differences of large pre-GAP terms, so float32 noise is
        # relative to the ACTIVATION scale, not the feature value
        assert np.allclose(ga, ea, rtol=1e-3, atol=1e-4 * np.abs(ea).mean() + 1e-6)
    assert all(len(f) == 364 for f in got["features"])


def test_avgpool_same_excludes_padding():
    from pic2vec_spark.nn import avgpool2d_same

    x = np.ones((1, 4, 4, 1), dtype=np.float32)
    out = avgpool2d_same(x)
    # all-ones input: every window averages to exactly 1 only if padded
    # zeros are excluded from the divisor (TF semantics)
    assert np.allclose(out, 1.0)
    assert out.shape == (1, 4, 4, 1)


def test_inceptionv3_widths_and_cuts():
    """Depth map {1:2,2:19,3:33,4:50} → mixed10 / in-block avgpool over
    mixed9 / mixed9 / in-block avgpool over mixed8 — widths
    {2048, 2048, 2048, 1280} per the reference's output-size matrix."""
    from pic2vec_spark.model import inceptionv3_features, inceptionv3_weights

    x = np.random.default_rng(8).normal(0, 0.9, (1, 299, 299, 3)).astype(np.float32)
    outs = {}
    for depth, width in ((1, 2048), (2, 2048), (3, 2048), (4, 1280)):
        f = inceptionv3_features(x, inceptionv3_weights(0, depth), depth)
        assert f.shape == (1, width) and np.isfinite(f).all(), depth
        outs[depth] = f
    # d2 is the smoothed (3x3 avgpool) version of d3's map — close in
    # mean, different per-feature
    assert not np.allclose(outs[2], outs[3])
    w4 = inceptionv3_weights(0, 4)
    assert "m9_1x1/kernel" not in w4 and "m8_3b/kernel" in w4
    w3 = inceptionv3_weights(0, 3)
    assert "m10_1x1/kernel" not in w3 and "m9_1x1/kernel" in w3


def test_inceptionv3_spark_matches_oracle(spark):
    pdf = synth_images_pdf(4, seed=21)
    plan = FeaturizerPlan.build("inceptionv3", depth=4, autosample=True)  # 640
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
        assert np.allclose(ga, ea, rtol=1e-3, atol=1e-4 * np.abs(ea).mean() + 1e-7)
    assert all(len(f) == 640 for f in got["features"])


def test_all_six_models_execute_through_plan():
    """The reference's full model registry is executable end-to-end (the
    'switch a user over' criterion): one tiny forward per model."""
    from pic2vec_spark.model import model_forward, model_weights
    from pic2vec_spark.plan import SUPPORTED_MODELS, FeaturizerPlan

    rng = np.random.default_rng(11)
    for name, meta in SUPPORTED_MODELS.items():
        plan = FeaturizerPlan.build(name, depth=4, autosample=False)
        h, w = meta["size"]
        x = rng.normal(0, 0.9, (1, h, w, 3)).astype(np.float32)
        f = model_forward(name, x, model_weights(name, 0, 4), 4)
        assert f.shape == (1, meta["widths"][4]), name
        assert np.isfinite(f).all(), name


def test_weights_npz_hook_round_trip(tmp_path, monkeypatch):
    """Pretrained-weights hook (release-notes item: the ImageNet h5 is
    stripped from the reference checkout): a saved weight set loads
    back through load_weights_npz shape-validated, model_weights picks
    it up via $PIC2VEC_SPARK_WEIGHTS_DIR, and the forward through the
    hook matches the oracle forward on the same weights bit-for-bit."""
    from pic2vec_spark.model import (
        load_weights_npz,
        model_forward,
        model_weights,
        save_weights_npz,
        squeezenet_weights,
    )

    # use a NON-default seed so a hook that silently fell back to the
    # seed-0 stand-ins would be caught
    w = squeezenet_weights(seed=99)
    blob = tmp_path / "squeezenet.npz"
    save_weights_npz(w, str(blob))

    loaded = load_weights_npz(str(blob), "squeezenet", depth=1)
    assert set(loaded) == set(w)
    for k in w:
        assert loaded[k].dtype == np.float32
        assert (loaded[k] == w[k]).all(), k

    rng = np.random.default_rng(3)
    x = rng.normal(0, 0.9, (2, 227, 227, 3)).astype(np.float32)
    want = model_forward("squeezenet", x, w, 1)

    monkeypatch.setenv("PIC2VEC_SPARK_WEIGHTS_DIR", str(tmp_path))
    hooked = model_weights("squeezenet", seed=0, depth=1)  # seed ignored
    got = model_forward("squeezenet", x, hooked, 1)
    assert (got == want).all()
    # models WITHOUT a blob installed still use the seeded stand-ins
    ref = model_weights("vgg16", seed=0, depth=1)
    assert (ref["block1_conv1/kernel"] == vgg16_weights(0, 1)["block1_conv1/kernel"]).all()

    # shape validation: a truncated/mangled blob is rejected per layer
    bad = dict(w)
    bad["conv1/kernel"] = bad["conv1/kernel"][..., :32]
    save_weights_npz(bad, str(tmp_path / "bad.npz"))
    with pytest.raises(ValueError, match="shape"):
        load_weights_npz(str(tmp_path / "bad.npz"), "squeezenet", depth=1)
    del bad["conv1/kernel"]
    save_weights_npz(bad, str(tmp_path / "missing.npz"))
    with pytest.raises(ValueError, match="missing"):
        load_weights_npz(str(tmp_path / "missing.npz"), "squeezenet", depth=1)


def test_weights_source_mismatch_guard(tmp_path, monkeypatch):
    """No-broadcast weights resolution is verified per-process: the
    driver's resolved source tag ships in the closure, and an executor
    that resolves a DIFFERENT source (env vars are not auto-propagated
    off local mode) raises instead of silently featurizing with the
    other weight set."""
    from pic2vec_spark.featurize import _get_weights, _weights_ref
    from pic2vec_spark.model import (
        save_weights_npz,
        squeezenet_weights,
        weights_source,
    )
    from pic2vec_spark.plan import FeaturizerPlan

    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)

    # driver resolved "seeded", worker process sees an installed blob
    monkeypatch.delenv("PIC2VEC_SPARK_WEIGHTS_DIR", raising=False)
    assert weights_source("squeezenet") == "seeded"
    tag = _weights_ref(None, plan, broadcast_weights=False)
    assert tag == ("expect", "seeded")
    save_weights_npz(squeezenet_weights(seed=99), str(tmp_path / "squeezenet.npz"))
    monkeypatch.setenv("PIC2VEC_SPARK_WEIGHTS_DIR", str(tmp_path))
    with pytest.raises(RuntimeError, match="weights source mismatch"):
        _get_weights(plan, tag)

    # and the matched case resolves fine (worker cache keyed per plan)
    tag_npz = _weights_ref(None, plan, broadcast_weights=False)
    assert tag_npz == ("expect", f"npz:{tmp_path}/squeezenet.npz")
    w = _get_weights(plan, tag_npz)
    assert (w["conv1/kernel"] == squeezenet_weights(seed=99)["conv1/kernel"]).all()
