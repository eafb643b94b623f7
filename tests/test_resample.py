"""Linear-interpolation resample + time-weighted average: closed-form
hand grids, numpy.interp / numpy.trapz oracles, NULL outside the
observed span (never extrapolates), equal-timestamp tiebreak,
zero-span degradation, and partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pic2vec_spark.ops.windows import (
    ohlc_agg,
    resample_interpolate,
    time_weighted_avg,
)


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["entity_id", "us", "value", "row_id"])
    pdf["ts"] = pd.to_datetime(pdf.pop("us"), unit="us")
    return spark.createDataFrame(pdf[["entity_id", "ts", "row_id", "value"]])


def _collect(out):
    pdf = out.toPandas()
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    return {
        (r.entity_id, int(r.us)): (None if pd.isna(r.value_interp) else float(r.value_interp))
        for r in pdf.itertuples()
    }


S = 1_000_000  # 1 s in µs


def test_hand_grid_interior_exact_and_outside(spark):
    # a: obs (0s, 0.0) and (10s, 100.0) -> straight line on the 2s grid
    # b: single obs at the aligned 4s point -> exact there, NULL elsewhere
    df = _mk(
        spark,
        [("a", 0, 0.0, 1), ("a", 10 * S, 100.0, 2), ("b", 4 * S, 7.0, 3)],
    )
    got = _collect(resample_interpolate(df, step_s=2, tiebreak="row_id"))
    for k in range(6):
        assert got[("a", 2 * k * S)] == pytest.approx(20.0 * k)
    assert got[("b", 4 * S)] == pytest.approx(7.0)
    for g in (0, 2 * S, 6 * S, 8 * S, 10 * S):
        assert got[("b", g)] is None
    assert len(got) == 12  # 2 entities x 6 grid points


def test_equal_timestamp_obs_last_tiebreak_wins(spark):
    # two observations at exactly 4s: row_id order decides; the later
    # one (9.0) is both the grid value at 4s and the left endpoint of
    # the 4s..8s segment
    df = _mk(
        spark,
        [
            ("a", 0, 1.0, 1),
            ("a", 4 * S, 5.0, 2),
            ("a", 4 * S, 9.0, 3),
            ("a", 8 * S, 9.0, 4),
        ],
    )
    got = _collect(resample_interpolate(df, step_s=4, tiebreak="row_id"))
    assert got[("a", 4 * S)] == pytest.approx(9.0)
    assert got[("a", 0)] == pytest.approx(1.0)
    assert got[("a", 8 * S)] == pytest.approx(9.0)


def test_matches_numpy_interp_inside_span_null_outside(spark):
    rng = np.random.default_rng(11)
    rows = []
    obs = {}
    for e in range(8):
        n = int(rng.integers(1, 40))
        # unique microsecond stamps inside [0, 1000 s)
        us = np.sort(rng.choice(np.arange(0, 1000 * S, S // 4), n, replace=False))
        v = rng.normal(size=n) * 10
        obs[f"e{e}"] = (us.astype(np.int64), v)
        rows += [(f"e{e}", int(t), float(x), i) for i, (t, x) in enumerate(zip(us, v))]
    df = _mk(spark, rows).repartition(7)
    step = 37  # deliberately unaligned with the obs stamps
    got = _collect(resample_interpolate(df, step_s=step, tiebreak="row_id"))
    checked_in = checked_out = 0
    for (e, g), val in got.items():
        us, v = obs[e]
        if us[0] <= g <= us[-1]:
            assert val == pytest.approx(float(np.interp(g, us, v)), abs=1e-9)
            checked_in += 1
        else:
            assert val is None
            checked_out += 1
    assert checked_in > 50 and checked_out > 0


def test_partition_invariance_and_explicit_bounds(spark):
    rng = np.random.default_rng(3)
    rows = [
        (f"e{int(i % 5)}", int(t), float(x), int(i))
        for i, (t, x) in enumerate(
            zip(
                rng.choice(np.arange(0, 500 * S, S), 200, replace=False),
                rng.normal(size=200),
            )
        )
    ]
    a = _collect(
        resample_interpolate(
            _mk(spark, rows).repartition(1), 10, tiebreak="row_id",
            start_us=0, end_us=500 * S,
        )
    )
    b = _collect(
        resample_interpolate(
            _mk(spark, rows).repartition(13), 10, tiebreak="row_id",
            start_us=0, end_us=500 * S,
        )
    )
    assert set(a) == set(b) and len(a) == 5 * 51
    for k, v in a.items():
        assert (v is None and b[k] is None) or v == pytest.approx(b[k])


def test_twap_hand_values_and_zero_span(spark):
    df = _mk(
        spark,
        [
            # line 0->100 over 10s, with a flat prefix: 0*4 + 50*6 -> 30
            ("a", 0, 0.0, 1),
            ("a", 4 * S, 0.0, 2),
            ("a", 10 * S, 100.0, 3),
            # single observation -> its own value
            ("b", 5 * S, 7.0, 4),
            # all at one instant -> plain average
            ("c", 2 * S, 1.0, 5),
            ("c", 2 * S, 3.0, 6),
        ],
    )
    got = {
        r.entity_id: (int(r.n_obs), float(r.twap))
        for r in time_weighted_avg(df, tiebreak="row_id").collect()
    }
    assert got["a"] == (3, pytest.approx(30.0))
    assert got["b"] == (1, pytest.approx(7.0))
    assert got["c"] == (2, pytest.approx(2.0))


def test_twap_matches_numpy_trapz(spark):
    rng = np.random.default_rng(23)
    rows, oracle = [], {}
    for e in range(6):
        n = int(rng.integers(2, 80))
        us = np.sort(rng.choice(np.arange(0, 800 * S, S // 2), n, replace=False))
        v = rng.normal(size=n) * 5 + 40
        oracle[f"e{e}"] = float(np.trapz(v, us) / (us[-1] - us[0]))
        rows += [(f"e{e}", int(t), float(x), i) for i, (t, x) in enumerate(zip(us, v))]
    df = _mk(spark, rows).repartition(9)
    got = {
        r.entity_id: float(r.twap)
        for r in time_weighted_avg(df, tiebreak="row_id").collect()
    }
    assert set(got) == set(oracle)
    for e, val in oracle.items():
        assert got[e] == pytest.approx(val, abs=1e-9)


def test_twap_single_exchange_plan(spark):
    df = _mk(spark, [("a", 0, 0.0, 1), ("a", S, 1.0, 2)])
    plan = (
        time_weighted_avg(df, tiebreak="row_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_ohlc_hand_buckets_and_equal_ts_close(spark):
    df = _mk(
        spark,
        [
            ("a", 1 * S, 5.0, 1),
            ("a", 3 * S, 9.0, 2),
            ("a", 12 * S, 2.0, 3),
            ("a", 19 * S, 7.0, 4),
            ("a", 19 * S, 1.0, 5),  # same instant: higher tiebreak = close
        ],
    )
    out = {
        int(r.bucket_start.timestamp() * S): r.asDict()
        for r in ohlc_agg(df, bucket_s=10, tiebreak="row_id").collect()
    }
    b0, b1 = out[0], out[10 * S]
    assert (b0["open"], b0["high"], b0["low"], b0["close"], b0["n_obs"]) == (
        5.0, 9.0, 5.0, 9.0, 2,
    )
    assert (b1["open"], b1["high"], b1["low"], b1["close"], b1["n_obs"]) == (
        2.0, 7.0, 1.0, 1.0, 3,
    )


def test_ohlc_matches_pandas_and_partition_invariant(spark):
    rng = np.random.default_rng(31)
    rows = [
        (f"e{int(i % 4)}", int(t), float(x), int(i))
        for i, (t, x) in enumerate(
            zip(
                rng.choice(np.arange(0, 300 * S, S // 3), 500, replace=False),
                rng.normal(size=500),
            )
        )
    ]
    pdf = pd.DataFrame(rows, columns=["e", "us", "v", "rid"])
    pdf["b"] = pdf.us - pdf.us % (20 * S)
    g = pdf.sort_values(["us", "rid"]).groupby(["e", "b"])
    want = {
        k: (v.v.iloc[0], v.v.max(), v.v.min(), v.v.iloc[-1], len(v))
        for k, v in g
    }
    for parts in (1, 11):
        got = {
            (r.entity_id, int(r.bucket_start.timestamp() * S)): (
                r.open, r.high, r.low, r.close, r.n_obs,
            )
            for r in ohlc_agg(
                _mk(spark, rows).repartition(parts), 20, tiebreak="row_id"
            ).collect()
        }
        assert set(got) == set(want)
        for k, (o, h, lo, c, n) in want.items():
            assert got[k] == (
                pytest.approx(o), pytest.approx(h), pytest.approx(lo),
                pytest.approx(c), n,
            )


def test_ohlc_single_aggregate_plan_no_window(spark):
    df = _mk(spark, [("a", 0, 0.0, 1), ("a", S, 1.0, 2)])
    plan = (
        ohlc_agg(df, 10, tiebreak="row_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_validation(spark):
    df = _mk(spark, [("a", 0, 1.0, 1)])
    with pytest.raises(ValueError, match="step_s"):
        resample_interpolate(df, 0)
    with pytest.raises(ValueError, match="no rows"):
        resample_interpolate(df.limit(0), 10)
    with pytest.raises(ValueError, match="bucket_s"):
        ohlc_agg(df, 0)
