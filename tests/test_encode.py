"""Closed-form fixtures for the tabular feature-encoding operators
(ops/encode): target encoding (smoothed + leave-one-out), quantile
binning, standard scaling, frequency encoding, exact-sum correlations,
hashed feature crosses."""

from __future__ import annotations

import math

import pytest

from pic2vec_spark.ops.encode import (
    corr_pairs,
    count_encode,
    feature_cross,
    loo_target_encode,
    quantile_bins,
    standard_scale,
    target_encode,
)


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


class TestTargetEncode:
    def test_smoothed_closed_form(self, spark):
        # cats: a -> [1, 3] (mean 2), b -> [5] ; prior = 3
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["c", "t"]
        )
        out = {r["c"]: r for r in target_encode(df, "c", "t", smoothing=2.0).collect()}
        # a: (4 + 2*3) / (2 + 2) = 2.5 ; b: (5 + 2*3) / (1 + 2) = 11/3
        assert out["a"]["n"] == 2 and out["a"]["te"] == 2.5
        assert out["b"]["n"] == 1 and out["b"]["te"] == round(11 / 3, 6)

    def test_zero_smoothing_is_group_mean(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0)], ["c", "t"]
        )
        out = {r["c"]: r["te"] for r in target_encode(df, "c", "t", smoothing=0).collect()}
        assert out == {"a": 2.0, "b": 5.0}

    def test_null_category_dropped(self, spark):
        df = spark.createDataFrame([("a", 1.0), (None, 9.0)], ["c", "t"])
        out = target_encode(df, "c", "t", smoothing=0).collect()
        assert len(out) == 1 and out[0]["te"] == 1.0  # prior excludes NULL cat rows

    def test_negative_smoothing_raises(self, spark):
        df = spark.createDataFrame([("a", 1.0)], ["c", "t"])
        with pytest.raises(ValueError):
            target_encode(df, "c", "t", smoothing=-1)


class TestLooTargetEncode:
    def test_leave_one_out_closed_form(self, spark):
        # a -> [1, 3], prior over all = 3; m=0: each a-row sees the OTHER value
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0)], ["id", "c", "t"]
        )
        out = {r["id"]: r["loo"] for r in loo_target_encode(df, "c", "t", smoothing=0).collect()}
        assert out[1] == 3.0 and out[2] == 1.0
        assert out[3] == 3.0  # singleton with m=0 -> prior

    def test_smoothing_closed_form(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 5.0)], ["id", "c", "t"]
        )
        out = {r["id"]: r["loo"] for r in loo_target_encode(df, "c", "t", smoothing=1.0).collect()}
        # prior 3; row1: (4 - 1 + 3) / (2 - 1 + 1) = 3.0 ; row3: (5 - 5 + 3)/(0 + 1) = 3.0
        assert out[1] == 3.0 and out[3] == 3.0
        # row2: (4 - 3 + 3) / 2 = 2.0
        assert out[2] == 2.0

    def test_null_target_gets_smoothed_encoding(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 3.0), (3, "a", None)], ["id", "c", "t"]
        )
        out = {r["id"]: r["loo"] for r in loo_target_encode(df, "c", "t", smoothing=0).collect()}
        assert out[3] == 2.0  # group mean, nothing to leave out


class TestQuantileBins:
    def test_uniform_eight_rows_four_bins(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(1, 9)], ["v"])
        out = {r["v"]: r["bin"] for r in quantile_bins(df, "v", 4).collect()}
        # boundaries at .25/.5/.75 of 1..8 -> 2.75, 4.5, 6.25
        assert out == {1.0: 1, 2.0: 1, 3.0: 2, 4.0: 2, 5.0: 3, 6.0: 3, 7.0: 4, 8.0: 4}

    def test_constant_column_all_bin_one(self, spark):
        df = spark.createDataFrame([(5.0,)] * 4, ["v"])
        assert {r["bin"] for r in quantile_bins(df, "v", 3).collect()} == {1}

    def test_null_value_null_bin(self, spark):
        df = spark.createDataFrame([(1.0,), (None,), (2.0,)], ["v"])
        out = {r["v"]: r["bin"] for r in quantile_bins(df, "v", 2).collect()}
        assert out[None] is None

    def test_bad_n_bins(self, spark):
        df = spark.createDataFrame([(1.0,)], ["v"])
        with pytest.raises(ValueError):
            quantile_bins(df, "v", 1)


class TestStandardScale:
    def test_closed_form(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["v"])
        out = sorted(r["z"] for r in standard_scale(df, "v").collect())
        assert out == [-1.0, 0.0, 1.0]  # sd_samp([1,2,3]) = 1

    def test_degenerate_variance_null(self, spark):
        df = spark.createDataFrame([(2.0,), (2.0,)], ["v"])
        assert [r["z"] for r in standard_scale(df, "v").collect()] == [None, None]

    def test_single_row_null(self, spark):
        df = spark.createDataFrame([(2.0,)], ["v"])
        assert [r["z"] for r in standard_scale(df, "v").collect()] == [None]


class TestCountEncode:
    def test_counts_and_freq(self, spark):
        df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], ["c"])
        out = {r["c"]: (r["n"], r["freq"]) for r in count_encode(df, "c").collect()}
        assert out == {"a": (2, round(2 / 3, 6)), "b": (1, round(1 / 3, 6))}


class TestCorrPairs:
    def test_perfect_and_anti(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0)], ["x", "y", "w"]
        )
        out = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_pairs(df, ["x", "y", "w"]).collect()}
        assert out[("x", "y")] == 1.0
        assert out[("x", "w")] == -1.0
        assert out[("y", "w")] == -1.0

    def test_independent_sign(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, -1.0), (3.0, 1.0), (4.0, -1.0)], ["x", "y"]
        )
        ((_, _, c),) = corr_pairs(df, ["x", "y"]).collect()
        assert abs(c) < 0.5

    def test_null_row_listwise_dropped(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 2.0), (3.0, None)], ["x", "y"]
        )
        ((_, _, c),) = corr_pairs(df, ["x", "y"]).collect()
        assert c == 1.0

    def test_zero_variance_null(self, spark):
        df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], ["x", "y"])
        ((_, _, c),) = corr_pairs(df, ["x", "y"]).collect()
        assert c is None


class TestFeatureCross:
    def test_deterministic_and_bounded(self, spark):
        df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 2)], ["c", "h"])
        a = {(r["c"], r["h"]): r["cross_bucket"] for r in feature_cross(df, ["c", "h"], 32).collect()}
        b = {(r["c"], r["h"]): r["cross_bucket"] for r in feature_cross(df, ["c", "h"], 32).collect()}
        assert a == b
        assert all(0 <= v < 32 for v in a.values())

    def test_null_distinct_from_empty(self, spark):
        df = spark.createDataFrame([(None, 1), ("", 1)], ["c", "h"])
        out = [r["cross_bucket"] for r in feature_cross(df, ["c", "h"], 1 << 20).collect()]
        assert out[0] != out[1]

    def test_math_matches_md5(self, spark):
        import hashlib

        df = spark.createDataFrame([("a", 1)], ["c", "h"])
        (got,) = feature_cross(df, ["c", "h"], 97, salt="cross").collect()
        want = int(hashlib.md5("crossa\x1f1".encode()).hexdigest()[:8], 16) % 97
        assert got["cross_bucket"] == want


def test_calendar_features_iso_semantics(spark):
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.encode import calendar_features

    # 2024-01-01 was a Monday; 2024-01-06 a Saturday; 2024-01-07 a Sunday
    df = spark.createDataFrame(
        [("2024-01-01 13:45:00",), ("2024-01-06 00:00:00",),
         ("2024-01-07 23:59:59",), (None,)],
        "ts string",
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    got = calendar_features(df).collect()
    rows = {r["cal_dom"]: r for r in got}
    assert (rows[1]["cal_dow"], rows[1]["cal_hour"], rows[1]["cal_is_weekend"]) == (1, 13, False)
    assert (rows[6]["cal_dow"], rows[6]["cal_is_weekend"]) == (6, True)
    assert (rows[7]["cal_dow"], rows[7]["cal_is_weekend"]) == (7, True)
    assert rows[None]["cal_month"] is None


def test_rfm_features_hand_fixture(spark):
    from pic2vec_spark.ops.encode import rfm_features

    rows = [
        # user 1: recent + frequent + big spender
        (1, "2024-01-30 00:00:00", 100.0),
        (1, "2024-01-31 00:00:00", 100.0),
        (1, "2024-01-20 00:00:00", 100.0),
        # user 2: one old small event
        (2, "2024-01-01 00:00:00", 1.0),
        # user 3: events after as_of are invisible
        (3, "2024-01-15 00:00:00", 10.0),
        (3, "2024-03-01 00:00:00", 999.0),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    got = {r["user_id"]: r for r in rfm_features(df, as_of="2024-02-01", n_bins=2).collect()}
    assert got[1]["frequency"] == 3 and got[1]["monetary"] == 300.0
    assert got[1]["recency_s"] == 86400.0  # one day before as_of
    assert got[3]["frequency"] == 1 and got[3]["monetary"] == 10.0  # post-as_of hidden
    # scores: user 1 is top bin (2 bins -> score 2) on all axes
    assert (got[1]["r_score"], got[1]["f_score"], got[1]["m_score"]) == (2, 2, 2)
    assert got[2]["r_score"] == 1 and got[2]["m_score"] == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        rfm_features(df, as_of=None)


def test_impute_strategies_hand_fixture(spark):
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.encode import impute

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", None),
        ("b", 10.0), ("b", None),
        ("c", None),  # all-NULL group: stays NULL
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    mean = {(r["g"], r["v"]): r["v_imputed"]
            for r in impute(df, "v", "mean", "g").collect()}
    assert mean[("a", None)] == pytest.approx(round(5 / 3, 6), abs=1e-9)
    assert mean[("b", None)] == 10.0
    assert mean[("c", None)] is None
    med = {(r["g"], r["v"]): r["v_imputed"]
           for r in impute(df, "v", "median", "g").collect()}
    assert med[("a", None)] == 2.0
    mode = {(r["g"], r["v"]): r["v_imputed"]
            for r in impute(df, "v", "mode", "g").collect()}
    assert mode[("a", None)] == 2.0  # most frequent
    assert mode[("c", None)] is None
    # was_null indicator preserved, non-null rows untouched
    out = impute(df, "v", "mean", "g").collect()
    assert all((r["v"] is None) == r["v_was_null"] for r in out)
    assert all(r["v_imputed"] == r["v"] for r in out if r["v"] is not None)
    # global mode over all-NULL input keeps rows (left-join guard)
    allnull = spark.createDataFrame([(None,), (None,)], "v double")
    g = impute(allnull, "v", "mode").collect()
    assert len(g) == 2 and all(r["v_imputed"] is None for r in g)
    # mode ties break to the smallest value
    tie = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    t = {r["v"]: r["v_imputed"] for r in impute(tie, "v", "mode").collect()}
    assert t[None] == 1.0
    with pytest.raises(ValueError):
        impute(df, "v", "nope")
