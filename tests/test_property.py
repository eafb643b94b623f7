"""Property-based tests (hypothesis): the as-of join and sessionize
operators hold their invariants on arbitrary generated timelines, not
just the fixture data.  Example counts are kept small — each example
runs real Spark jobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pic2vec_spark.ops.asof import asof_join


def _timeline(draw):
    n = draw(st.integers(10, 60))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    return pd.DataFrame(
        {
            "entity_id": rng.integers(0, 5, n),
            "ts": rng.uniform(0, 1000, n).round(3),
            "row_id": np.arange(n),
            "kind": rng.choice(["feature", "query"], n),
            "value": rng.normal(size=n).round(6),
        }
    )


timelines = st.builds(lambda seed: seed, st.integers(0, 2**31 - 1))


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_matches_merge_asof_on_random_timelines(spark, direction, data):
    pdf = _timeline(data.draw)
    # dedup (entity, ts) so tiebreak order is immaterial (merge_asof
    # resolves duplicate keys by input order, ours by tiebreak column)
    pdf = pdf.drop_duplicates(["entity_id", "ts"]).reset_index(drop=True)
    f = pdf[pdf.kind == "feature"][["entity_id", "ts", "row_id", "value"]]
    q = pdf[pdf.kind == "query"][["entity_id", "ts", "row_id"]]
    if f.empty or q.empty:
        return
    out = (
        asof_join(
            spark.createDataFrame(q),
            spark.createDataFrame(f),
            value_cols=["value"],
            tiebreak="row_id",
            direction=direction,
        )
        .select("row_id", "value_asof", "ts", "ts_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    expected = (
        pd.merge_asof(
            q.sort_values("ts"),
            f.sort_values("ts"),
            on="ts", by="entity_id", direction=direction, suffixes=("", "_f"),
        )
        .set_index("row_id")
        .sort_index()
    )
    got_v = out["value_asof"].values.astype(float)
    exp_v = expected["value"].values.astype(float)
    nan = np.isnan(got_v) & np.isnan(exp_v)
    assert (nan | np.isclose(got_v, exp_v, atol=1e-9)).all()
    if direction == "backward":  # zero temporal leakage invariant
        m = out["ts_asof"].notna()
        assert (out.loc[m, "ts_asof"] <= out.loc[m, "ts"]).all()


@settings(
    max_examples=4, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1), gap=st.floats(1.0, 50.0))
def test_sessionize_matches_numpy_reference(spark, seed, gap):
    from pic2vec_spark.ops.windows import sessionize

    rng = np.random.default_rng(seed)
    n = 80
    pdf = pd.DataFrame(
        {
            "entity_id": rng.integers(0, 4, n),
            "ts": rng.uniform(0, 500, n).round(3),
            "row_id": np.arange(n),
        }
    ).drop_duplicates(["entity_id", "ts"])
    got = (
        sessionize(spark.createDataFrame(pdf), gap_s=gap, tiebreak="row_id")
        .toPandas()
        .set_index("row_id")["session_id"]
    )
    for eid, grp in pdf.groupby("entity_id"):
        grp = grp.sort_values("ts")
        sid = (grp.ts.diff() > gap).cumsum()
        for rid, expect in zip(grp.row_id, sid):
            assert got.loc[rid] == expect, (eid, rid)
