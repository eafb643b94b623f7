"""Spark featurize pipeline vs the single-machine NumPy oracle.

Mirrors the reference's key invariants:
- result equals the sequential oracle per image_id, allclose atol=1e-5
  (the reference's golden-CSV checks, tests/test_image_featurizer.py);
- invariance to partitioning and dedup on/off (the reference's
  batch/no-batch equality, tests/test_image_featurizer.py:332-399);
- missing rows (gif / corrupt / empty) -> missing=True + f(0) vector
  (feature_preprocessing.py:318-323,443-446);
- captions ride through byte-equal (input_hint per-row invariant).
"""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.featurize import featurize_images
from pic2vec_spark.oracle import oracle_featurize
from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.synth import IMAGES_SCHEMA, synth_images_pdf

ATOL = 1e-5
N = 48


@pytest.fixture(scope="module")
def images_pdf():
    return synth_images_pdf(N, seed=42)


@pytest.fixture(scope="module")
def plan():
    return FeaturizerPlan.build(model="squeezenet", depth=1, autosample=True)


@pytest.fixture(scope="module")
def oracle_out(images_pdf, plan):
    return oracle_featurize(images_pdf, plan).set_index("image_id")


def _spark_featurize(spark, images_pdf, plan, partitions, dedup=True):
    df = spark.createDataFrame(images_pdf, schema=IMAGES_SCHEMA).repartition(partitions)
    out = featurize_images(df, plan, dedup=dedup).select(
        "image_id", "caption", "missing", "features"
    )
    return out.toPandas().set_index("image_id").sort_index()


def _assert_matches_oracle(got, oracle_out):
    assert sorted(got.index) == sorted(oracle_out.index)
    for iid in got.index:
        assert bool(got.loc[iid, "missing"]) == bool(oracle_out.loc[iid, "missing"]), iid
        assert np.allclose(
            np.array(got.loc[iid, "features"], dtype=np.float32),
            np.array(oracle_out.loc[iid, "features"], dtype=np.float32),
            atol=ATOL,
        ), iid


def test_matches_oracle(spark, images_pdf, plan, oracle_out):
    got = _spark_featurize(spark, images_pdf, plan, partitions=8)
    _assert_matches_oracle(got, oracle_out)
    # plan geometry: autosampled squeezenet d1 -> 256 features
    assert all(len(f) == 256 for f in got["features"])


def test_partition_invariance(spark, images_pdf, plan):
    one = _spark_featurize(spark, images_pdf, plan, partitions=1)
    many = _spark_featurize(spark, images_pdf, plan, partitions=7)
    for iid in one.index:
        assert np.allclose(
            np.array(one.loc[iid, "features"]),
            np.array(many.loc[iid, "features"]),
            atol=ATOL,
        )


def test_dedup_invariance(spark, images_pdf, plan, oracle_out):
    no_dedup = _spark_featurize(spark, images_pdf, plan, partitions=5, dedup=False)
    _assert_matches_oracle(no_dedup, oracle_out)


def test_missing_semantics(spark, images_pdf, plan, oracle_out):
    got = _spark_featurize(spark, images_pdf, plan, partitions=4)
    gifs = images_pdf[images_pdf.fmt == "gif"]["image_id"]
    assert len(gifs) > 0, "synth data should include gif rows"
    for iid in gifs:
        assert bool(got.loc[iid, "missing"])
    empties = images_pdf[[len(b or b"") == 0 for b in images_pdf["bytes"]]]["image_id"]
    for iid in empties:
        assert bool(got.loc[iid, "missing"])
    # at least some valid rows
    assert (~got["missing"]).sum() > N // 2


def test_caption_byte_equality(spark, images_pdf, plan):
    got = _spark_featurize(spark, images_pdf, plan, partitions=4)
    for iid, cap in zip(images_pdf["image_id"], images_pdf["caption"]):
        assert got.loc[iid, "caption"] == cap


def test_duplicate_rows_equal_features(spark, images_pdf, plan):
    """Hot-phash duplicate clusters (identical bytes) must all get the
    identical feature vector — the dedup join must not mix rows up."""
    got = _spark_featurize(spark, images_pdf, plan, partitions=4)
    hot = images_pdf[
        (images_pdf.phash >= 0x5EED0000) & (images_pdf.phash < 0x5EED0000 + 64)
    ]
    clusters = hot.groupby("phash")["image_id"].apply(list)
    checked = 0
    for ids in clusters:
        # corrupt/empty/gif rolls are per-row, so only compare the
        # cluster members that decoded successfully (identical bytes)
        ids = [i for i in ids if not bool(got.loc[i, "missing"])]
        if len(ids) < 2:
            continue
        ref = np.array(got.loc[ids[0], "features"])
        for other in ids[1:]:
            assert np.array_equal(ref, np.array(got.loc[other, "features"]))
            checked += 1
    assert checked > 0
