"""Multi-table as-of training-matrix assembly + temporal-leakage audit:
equivalence with chained single-table as-of joins, one-shuffle plan,
and exact integer audit arithmetic."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.asof import asof_join
from pic2vec_spark.ops.pit import (
    asof_join_multi,
    audit_point_in_time,
    backfill_grid,
)
from pic2vec_spark.synth import synth_timeline_pdf


@pytest.fixture(scope="module")
def sides(spark):
    pdf = synth_timeline_pdf(n_rows=3000, n_images=100, n_entities=30, seed=7)
    rng = np.random.default_rng(5)
    pdf["value"] = rng.normal(size=len(pdf))
    feats = pdf[pdf.kind == "feature"][["entity_id", "ts", "row_id", "value"]]
    # two feature tables with DIFFERENT row sets (odd/even row_id) and an
    # extra column on one of them, so per-table matches genuinely differ
    fa = feats[feats.row_id % 2 == 0].copy()
    fb = feats[feats.row_id % 2 == 1].copy()
    fb["extra"] = fb["value"] * 2.0
    q = pdf[pdf.kind == "query"][["entity_id", "ts", "row_id"]]
    return (
        spark.createDataFrame(q),
        spark.createDataFrame(fa),
        spark.createDataFrame(fb),
    )


def _pd(df, keys=("row_id",)):
    return df.toPandas().sort_values(list(keys)).reset_index(drop=True)


def test_multi_equals_chained_single_table_joins(spark, sides):
    q, fa, fb = sides
    multi = asof_join_multi(
        q, {"a": fa, "b": fb}, tiebreaks={"a": "row_id", "b": "row_id"}
    )
    ja = asof_join(q, fa, value_cols=["value"], tiebreak="row_id", suffix="_sa")
    jb = asof_join(ja, fb, value_cols=["value", "extra"],
                   tiebreak="row_id", suffix="_sb")
    m = _pd(multi)
    s = _pd(jb)
    assert len(m) == len(s) == q.count()
    pd.testing.assert_series_equal(
        m["value_a"], s["value_sa"], check_names=False
    )
    pd.testing.assert_series_equal(
        m["value_b"], s["value_sb"], check_names=False
    )
    pd.testing.assert_series_equal(
        m["extra_b"], s["extra_sb"], check_names=False
    )
    pd.testing.assert_series_equal(
        pd.to_datetime(m["ts_a"]), pd.to_datetime(s["ts_sa"]),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        pd.to_datetime(m["ts_b"]), pd.to_datetime(s["ts_sb"]),
        check_names=False,
    )


def test_multi_partition_invariance(spark, sides):
    q, fa, fb = sides
    base = _pd(asof_join_multi(
        q, {"a": fa, "b": fb}, tiebreaks={"a": "row_id", "b": "row_id"}
    ))
    shuf = _pd(asof_join_multi(
        q.repartition(13),
        {"a": fa.repartition(7), "b": fb.repartition(3)},
        tiebreaks={"a": "row_id", "b": "row_id"},
    ))
    pd.testing.assert_frame_equal(base, shuf)


def test_multi_single_shuffle_plan(spark, sides):
    """The whole k-table assembly must cost ONE hash exchange — the
    point of the union formulation vs chaining k asof_joins."""
    q, fa, fb = sides
    out = asof_join_multi(
        q, {"a": fa, "b": fb}, tiebreaks={"a": "row_id", "b": "row_id"}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    shuffles = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert len(shuffles) == 1, shuffles


def test_multi_validation(spark, sides):
    q, fa, _ = sides
    with pytest.raises(ValueError, match="at least one table"):
        asof_join_multi(q, {})
    # value_a would collide with an existing query column
    qq = q.withColumn("value_a", F.lit(1.0))
    with pytest.raises(ValueError, match="collides"):
        asof_join_multi(qq, {"a": fa})
    with pytest.raises(ValueError, match="must carry"):
        asof_join_multi(q.drop("ts"), {"a": fa})


def test_audit_zero_leaks_and_exact_staleness(spark):
    rows = [
        # (entity, query ts, matched feature ts)
        (1, "2024-01-01 00:00:10", "2024-01-01 00:00:07"),  # stale 3s
        (1, "2024-01-01 00:00:20", "2024-01-01 00:00:20"),  # stale 0
        (2, "2024-01-01 00:00:30", None),                   # unmatched
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ts string, ts_a string"
    ).select(
        "entity_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("ts_a").cast("timestamp").alias("ts_a"),
    )
    out = audit_point_in_time(df, "ts", ["ts_a"]).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.feature, r.n_rows, r.n_matched, r.n_leaks) == ("ts_a", 3, 2, 0)
    assert r.max_staleness_us == 3_000_000
    assert r.sum_staleness_us == 3_000_000


def test_audit_detects_a_leak(spark):
    """A forward-looking feature ts must be counted, and its (negative)
    staleness must NOT pollute the staleness stats."""
    rows = [
        (1, "2024-01-01 00:00:10", "2024-01-01 00:00:12"),  # LEAK
        (1, "2024-01-01 00:00:20", "2024-01-01 00:00:15"),  # stale 5s
    ]
    df = spark.createDataFrame(
        rows, "entity_id long, ts string, ts_a string"
    ).select(
        "entity_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("ts_a").cast("timestamp").alias("ts_a"),
    )
    out = audit_point_in_time(df, "ts", ["ts_a"]).toPandas().iloc[0]
    assert out.n_leaks == 1
    assert out.max_staleness_us == 5_000_000
    assert out.sum_staleness_us == 5_000_000
    with pytest.raises(ValueError, match="at least one column"):
        audit_point_in_time(df, "ts", [])


def test_audit_on_real_asof_output_proves_no_leakage(spark, sides):
    q, fa, fb = sides
    joined = asof_join_multi(
        q, {"a": fa, "b": fb}, tiebreaks={"a": "row_id", "b": "row_id"}
    )
    audit = audit_point_in_time(joined, "ts", ["ts_a", "ts_b"]).toPandas()
    assert len(audit) == 2
    assert (audit.n_leaks == 0).all()
    assert (audit.n_rows == q.count()).all()
    assert (audit.n_matched > 0).all()


@pytest.fixture(scope="module")
def feat_small(spark):
    rows = [
        # entity, ts (seconds past epoch minute 0), value
        (1, 3, 10.0),
        (1, 12, 11.0),
        (1, 12, 99.0),   # equal-ts duplicate: larger row_id must win
        (1, 27, 12.0),
        (2, 21, 20.0),
    ]
    pdf = pd.DataFrame(rows, columns=["entity_id", "sec", "value"])
    pdf["row_id"] = range(len(pdf))
    pdf["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        pdf.pop("sec"), unit="s"
    )
    return spark.createDataFrame(pdf[["entity_id", "ts", "row_id", "value"]])


def test_backfill_grid_values_and_alignment(spark, feat_small):
    out = backfill_grid(
        feat_small, step_s=10, value_cols=["value"], tiebreak="row_id"
    ).toPandas().sort_values(["entity_id", "ts"]).reset_index(drop=True)
    # bounds: min ts 00:00:03 -> aligned start 00:00:00; max 00:00:27
    # -> grid {0,10,20} x 2 entities
    base = pd.Timestamp("2024-01-01")
    grid = [base + pd.Timedelta(seconds=s) for s in (0, 10, 20)]
    assert list(out.ts) == grid * 2 and list(out.entity_id) == [1] * 3 + [2] * 3
    # entity 1: nothing at t=0; v=10 at t=10; at t=20 the 12s pair ties
    # on ts and the larger row_id (99.0) must win
    assert np.isnan(out.value_asof[0])
    assert list(out.value_asof[1:3]) == [10.0, 99.0]
    # entity 2: feature at 21s is AFTER every grid point -> all null
    # (zero leakage on a grid that ends before the feature)
    assert out.value_asof[3:6].isna().all()


def test_backfill_grid_explicit_bounds_and_entities(spark, feat_small):
    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    ents = spark.createDataFrame(
        pd.DataFrame({"entity_id": [1, 2, 7]})  # 7 has no features
    )
    out = backfill_grid(
        feat_small,
        step_s=5,
        value_cols=["value"],
        tiebreak="row_id",
        entities=ents,
        start_us=base_us + 20_000_000,
        end_us=base_us + 30_000_000,
    ).toPandas()
    assert len(out) == 9  # 3 entities x grid {20,25,30}
    e7 = out[out.entity_id == 7]
    assert len(e7) == 3 and e7.value_asof.isna().all()
    e1 = out[out.entity_id == 1].sort_values("ts")
    assert list(e1.value_asof) == [99.0, 99.0, 12.0]
    e2 = out[out.entity_id == 2].sort_values("ts")
    assert e2.value_asof.isna().iloc[0] and list(e2.value_asof[1:]) == [
        20.0,
        20.0,
    ]


def test_backfill_grid_no_leakage(spark, sides):
    _, fa, _ = sides
    out = backfill_grid(fa, step_s=86_400, value_cols=["value"], tiebreak="row_id")
    audit = audit_point_in_time(out, "ts", ["ts_asof"]).toPandas().iloc[0]
    assert audit.n_leaks == 0 and audit.n_matched > 0


def test_backfill_grid_validation(spark, feat_small):
    with pytest.raises(ValueError, match="positive"):
        backfill_grid(feat_small, step_s=0)
    with pytest.raises(ValueError, match="no rows"):
        backfill_grid(feat_small.filter(F.lit(False)), step_s=10)
    with pytest.raises(ValueError, match="empty"):
        backfill_grid(feat_small, step_s=10, start_us=10**15, end_us=0)


def test_backfill_grid_single_exchange_with_explicit_entities(
    spark, feat_small
):
    """With an explicit entity table the spine is a pure narrow
    explode — the whole backfill must cost exactly the as-of kernel's
    one hash exchange."""
    ents = spark.createDataFrame(pd.DataFrame({"entity_id": [1, 2]}))
    out = backfill_grid(
        feat_small, step_s=10, value_cols=["value"],
        tiebreak="row_id", entities=ents,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = sum("Exchange hashpartitioning" in ln for ln in plan.splitlines())
    assert n == 1, plan
