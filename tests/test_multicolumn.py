"""Multi-image-column featurize — the reference's testing_data.csv shape
(images_1, images_2, extra column, blank refs) re-expressed with keys.

Mirrors tests/test_image_featurizer.py's mult fixtures: 3 rows with two
image columns and blanks -> per-column {col}_missing + features (2 x
(1 + 256) for autosampled squeezenet d1), extra columns ride along.
"""

from __future__ import annotations

import numpy as np
import pytest

from pic2vec_spark.featurize import featurize_multi_column, widen_features
from pic2vec_spark.oracle import oracle_featurize
from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.synth import IMAGES_SCHEMA, synth_images_pdf


@pytest.fixture(scope="module")
def setup(spark):
    images_pdf = synth_images_pdf(12, seed=42)
    images = spark.createDataFrame(images_pdf, schema=IMAGES_SCHEMA)
    # testing_data.csv analogue: two image columns, blanks, a 'derp' col
    rows = [
        ("r0", "img_000000001", "img_000000002", 10),
        ("r1", None, "img_000000003", 20),          # blank in images_1
        ("r2", "img_000000004", None, 30),          # blank in images_2
    ]
    df = spark.createDataFrame(
        rows, "row_id string, images_1 string, images_2 string, derp int"
    )
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    out = featurize_multi_column(
        df, images, ["images_1", "images_2"], plan
    ).toPandas().set_index("row_id")
    return images_pdf, plan, out


def test_schema_and_missing(setup):
    _, plan, out = setup
    assert set(out.columns) >= {
        "images_1", "images_2", "derp",
        "images_1_missing", "images_1_features",
        "images_2_missing", "images_2_features",
    }
    assert not out.loc["r0", "images_1_missing"]
    assert out.loc["r1", "images_1_missing"]  # blank -> missing
    assert out.loc["r2", "images_2_missing"]
    assert all(len(f) == 256 for f in out["images_1_features"])
    assert out["derp"].tolist() == [10, 20, 30]


def test_features_match_oracle_per_column(setup):
    images_pdf, plan, out = setup
    oracle = oracle_featurize(images_pdf, plan).set_index("image_id")
    for rid, col in [("r0", "images_1"), ("r0", "images_2"), ("r1", "images_2")]:
        iid = out.loc[rid, col]
        assert np.allclose(
            np.array(out.loc[rid, f"{col}_features"], dtype=np.float32),
            np.array(oracle.loc[iid, "features"], dtype=np.float32),
            atol=1e-5,
        )


def test_blank_gets_zero_tensor_features(setup):
    """Blank refs get f(0) — with zero-bias seeded weights f(0) is the
    zero vector, matching the reference's golden CSV row True,0,0,..."""
    _, plan, out = setup
    blank = np.array(out.loc["r1", "images_1_features"], dtype=np.float32)
    assert np.allclose(blank, 0.0, atol=1e-6)


def test_widen_multi(spark, setup):
    _, plan, out_pdf = setup
    df = spark.createDataFrame(out_pdf.reset_index()).withColumnRenamed(
        "images_1_missing", "missing"
    ).withColumnRenamed("images_1_features", "features")
    wide = widen_features(
        df.select("row_id", "missing", "features"), column="images_1",
        num_features=256,
    )
    assert wide.columns[:2] == ["row_id", "images_1_missing"]
    assert len(wide.columns) == 2 + 256
