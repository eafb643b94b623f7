"""SCD2 compression: island boundaries, null-safe change detection,
A->B->A history preservation, state reconstruction, one-exchange plan."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.scd import scd2_compress, scd2_state_at


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # key, sec, value ; runs: A(3) -> B(2) -> A(1) for key 1
        (1, 0, "A"),
        (1, 10, "A"),
        (1, 20, "A"),
        (1, 30, "B"),
        (1, 40, "B"),
        (1, 50, "A"),
        # key 2: null-safe runs NULL(2) -> X(1)
        (2, 5, None),
        (2, 15, None),
        (2, 25, "X"),
    ]
    pdf = pd.DataFrame(rows, columns=["entity_id", "sec", "state"])
    pdf["row_id"] = range(len(pdf))
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        pdf.pop("sec"), unit="s"
    )
    return spark.createDataFrame(pdf[["entity_id", "ts", "row_id", "state"]])


def _sec(col):
    return (col - pd.Timestamp("2024-01-01")).dt.total_seconds()


def test_scd2_islands_and_intervals(spark, log):
    out = (
        scd2_compress(log, ["entity_id"], ["state"], tiebreak="row_id")
        .toPandas()
        .sort_values(["entity_id", "version"])
        .reset_index(drop=True)
    )
    assert len(out) == 5
    e1 = out[out.entity_id == 1]
    # A->B->A preserved as three islands, not collapsed to two states
    assert list(e1.state) == ["A", "B", "A"]
    assert list(e1.version) == [1, 2, 3]
    assert list(e1.n_obs) == [3, 2, 1]
    assert list(_sec(e1.valid_from)) == [0.0, 30.0, 50.0]
    assert list(_sec(e1.valid_to)[:2]) == [30.0, 50.0]
    assert pd.isna(e1.valid_to.iloc[2]) and list(e1.is_current) == [
        False,
        False,
        True,
    ]
    e2 = out[out.entity_id == 2]
    # NULL->NULL is "no change"; NULL->X is a change
    assert pd.isna(e2.state.iloc[0]) and e2.state.iloc[1] == "X"
    assert list(e2.n_obs) == [2, 1]


def test_scd2_partition_invariance(spark, log):
    a = (
        scd2_compress(log, ["entity_id"], ["state"], tiebreak="row_id")
        .toPandas()
        .sort_values(["entity_id", "version"])
        .reset_index(drop=True)
    )
    b = (
        scd2_compress(
            log.repartition(7), ["entity_id"], ["state"], tiebreak="row_id"
        )
        .toPandas()
        .sort_values(["entity_id", "version"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_scd2_state_at_reconstruction(spark, log):
    comp = scd2_compress(log, ["entity_id"], ["state"], tiebreak="row_id")
    # at t=35: key 1 is in the B island, key 2 in X
    s = scd2_state_at(comp, "2024-01-01 00:00:35").toPandas()
    s = s.sort_values("entity_id").reset_index(drop=True)
    assert list(s.entity_id) == [1, 2] and list(s.state) == ["B", "X"]
    # at an exact boundary the NEW island owns the instant ([from, to))
    s30 = scd2_state_at(comp, "2024-01-01 00:00:30").toPandas()
    assert s30[s30.entity_id == 1].state.iloc[0] == "B"
    # before any observation: no state
    s0 = scd2_state_at(comp, "2023-12-31 23:59:59").toPandas()
    assert len(s0) == 0


def test_scd2_multi_value_cols_and_validation(spark, log):
    two = log.withColumn("aux", F.col("row_id") % 2)
    out = scd2_compress(
        two, ["entity_id"], ["state", "aux"], tiebreak="row_id"
    ).toPandas()
    # aux flips every row -> every observation is its own island
    assert len(out) == 9 and (out.n_obs == 1).all()
    with pytest.raises(ValueError, match="keys"):
        scd2_compress(log, [], ["state"])
    with pytest.raises(ValueError, match="value_cols"):
        scd2_compress(log, ["entity_id"], [])
    with pytest.raises(ValueError, match="not in DataFrame"):
        scd2_compress(log, ["entity_id"], ["nope"])


def test_scd2_single_exchange_plan(spark, log):
    out = scd2_compress(log, ["entity_id"], ["state"], tiebreak="row_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = sum("Exchange hashpartitioning" in ln for ln in plan.splitlines())
    assert n == 1, plan
