"""End-to-end flagship: featurize + as-of join vs a pandas/NumPy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.oracle import oracle_featurize
from pic2vec_spark.pipeline import point_in_time_features
from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.synth import (
    IMAGES_SCHEMA,
    TIMELINE_SCHEMA,
    synth_images_pdf,
    synth_timeline_pdf,
)

N_IMAGES = 40


@pytest.fixture(scope="module")
def data():
    images = synth_images_pdf(N_IMAGES, seed=42)
    timeline = synth_timeline_pdf(
        n_rows=800, n_images=N_IMAGES, n_entities=12, seed=5
    )
    return images, timeline


@pytest.fixture(scope="module")
def plan():
    return FeaturizerPlan.build("squeezenet", depth=2, autosample=True)


def _pandas_oracle(images, timeline, plan):
    """Sequential oracle: oracle_featurize + per-entity backward scan."""
    feats = oracle_featurize(images, plan).set_index("image_id")
    obs = timeline[(timeline.kind == "feature") & timeline.image_id.notna()]
    obs = obs.sort_values(["entity_id", "ts", "row_id"])
    queries = timeline[timeline.kind == "query"]
    rows = {}
    for _, q in queries.iterrows():
        cand = obs[(obs.entity_id == q.entity_id) & (obs.ts <= q.ts)]
        if len(cand):
            last = cand.iloc[-1]
            rows[q.row_id] = (
                last.image_id,
                bool(feats.loc[last.image_id, "missing"]),
                np.array(feats.loc[last.image_id, "features"], dtype=np.float32),
            )
        else:
            rows[q.row_id] = (None, None, None)
    return rows


def test_flagship_matches_oracle(spark, data, plan):
    images, timeline = data
    got = (
        point_in_time_features(
            spark.createDataFrame(images, schema=IMAGES_SCHEMA),
            spark.createDataFrame(timeline, schema=TIMELINE_SCHEMA),
            plan,
        )
        .select("row_id", "ts", "ts_asof", "image_id_asof", "missing_asof", "features_asof")
        .toPandas()
        .set_index("row_id")
    )
    expected = _pandas_oracle(images, timeline, plan)
    assert sorted(got.index) == sorted(expected)
    for rid, (img, miss, feat) in expected.items():
        g = got.loc[rid]
        assert g["image_id_asof"] == img, rid
        if img is None:
            assert pd.isna(g["features_asof"]) if not isinstance(g["features_asof"], (list, np.ndarray)) else False
        else:
            assert bool(g["missing_asof"]) == miss
            assert np.allclose(
                np.array(g["features_asof"], dtype=np.float32), feat, atol=1e-5
            ), rid


def test_flagship_zero_leakage(spark, data, plan):
    images, timeline = data
    out = point_in_time_features(
        spark.createDataFrame(images, schema=IMAGES_SCHEMA),
        spark.createDataFrame(timeline, schema=TIMELINE_SCHEMA),
        plan,
    )
    assert out.filter(F.col("ts_asof") > F.col("ts")).count() == 0


def test_entry_contract(spark):
    """entry() must return >0 rows with the flagship schema."""
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    names = [f.name for f in df.schema.fields]
    assert names == [
        "event_id", "user_id", "ts_us", "image_id_asof", "missing_asof", "features_asof",
    ]
