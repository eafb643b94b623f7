"""PSI drift detection: bin-edge semantics, a hand-checked PSI value,
zero-drift exactness, NULL handling, and the no-Python-UDF plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.drift import (
    fixed_width_bin,
    psi_categorical,
    psi_numeric,
)


def _psi(ref_counts, cur_counts, smooth=0.5):
    """Independent pure-Python PSI over observed bins (same contract)."""
    k = len(ref_counts)
    nr, nc = sum(ref_counts), sum(cur_counts)
    out = 0.0
    for r, c in zip(ref_counts, cur_counts):
        pr = (r + smooth) / (nr + smooth * k)
        pc = (c + smooth) / (nc + smooth * k)
        out += (pc - pr) * math.log(pc / pr)
    return out


def test_fixed_width_bin_edges(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (9.99,), (10.0,), (99.99,), (100.0,), (250.0,), (None,)],
        "v double",
    )
    got = [
        r["b"]
        for r in df.select(fixed_width_bin(F.col("v"), 0.0, 100.0, 10).alias("b"))
        .collect()
    ]
    #        <lo  lo   bin1  bin2   bin10  hi    >hi   null
    assert got == [0, 1, 1, 2, 10, 11, 11, None]
    with pytest.raises(ValueError):
        fixed_width_bin(F.col("v"), 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        fixed_width_bin(F.col("v"), 5.0, 5.0, 4)


def test_psi_zero_when_identical(spark):
    # same counts per bin on both sides -> p_c == p_r exactly -> psi == 0.0
    rows = [("g", float(v), cur) for v in (5, 15, 25, 25) for cur in (False, True)]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    out = psi_numeric(df, "g", "v", F.col("cur"), 0.0, 30.0, 3).collect()[0]
    assert (out["n_ref"], out["n_cur"], out["n_bins"]) == (4, 4, 3)
    assert out["psi"] == 0.0


def test_psi_matches_hand_formula(spark):
    # ref: bins (1,2) = [3, 1]; cur: [1, 3]  (observed bins only)
    rows = (
        [("g", 5.0, False)] * 3 + [("g", 15.0, False)]
        + [("g", 5.0, True)] + [("g", 15.0, True)] * 3
        + [("g", None, True), ("g", 7.0, None)]  # excluded rows
    )
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    out = psi_numeric(df, "g", "v", F.col("cur"), 0.0, 20.0, 2).collect()[0]
    assert (out["n_ref"], out["n_cur"], out["n_bins"]) == (4, 4, 2)
    assert out["psi"] == pytest.approx(_psi([3, 1], [1, 3]), abs=1e-6)
    assert out["psi"] > 0.25  # a 3:1 flip is a "drifted" signal


def test_psi_per_group_and_overflow_bin(spark):
    rows = [("a", 5.0, False), ("a", 5.0, True), ("b", 5.0, False), ("b", 500.0, True)]
    df = spark.createDataFrame(rows, "g string, v double, cur boolean")
    got = {
        r["g"]: r for r in psi_numeric(df, "g", "v", F.col("cur"), 0.0, 10.0, 1).collect()
    }
    assert got["a"]["psi"] == 0.0 and got["a"]["n_bins"] == 1
    # b: ref in bin 1, cur in overflow bin 2
    assert got["b"]["n_bins"] == 2
    assert got["b"]["psi"] == pytest.approx(_psi([1, 0], [0, 1]), abs=1e-6)


def test_psi_categorical_counts_nulls(spark):
    rows = [("x", False), ("x", True), (None, False), (None, True), ("y", True)]
    df = spark.createDataFrame(rows, "c string, cur boolean")
    out = psi_categorical(df, "c", F.col("cur")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_ref"], r["n_cur"], r["n_bins"]) == (2, 3, 3)  # x, <null>, y
    assert r["psi"] == pytest.approx(_psi([1, 1, 0], [1, 1, 1]), abs=1e-6)


def test_psi_plan_is_jvm_only(spark):
    df = spark.createDataFrame([("g", 1.0, True)], "g string, v double, cur boolean")
    plan = (
        psi_numeric(df, "g", "v", F.col("cur"), 0.0, 10.0, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chi2_and_jsd_from_hist(spark):
    import math

    from pic2vec_spark.ops.drift import chi2_from_hist, jsd_from_hist

    ref = [10, 20, 30]
    df = spark.createDataFrame(
        [([10, 20, 30],), ([60, 0, 0],)], "hist array<bigint>"
    )
    rows = df.select(
        chi2_from_hist(F.col("hist"), ref).alias("chi2"),
        jsd_from_hist(F.col("hist"), ref).alias("jsd"),
    ).collect()
    # identical distribution: chi2 == 0 exactly; jsd ~ 0 (smoothing only)
    assert rows[0]["chi2"] == 0.0
    assert rows[0]["jsd"] < 0.01
    # concentrated shift: both blow up, jsd bounded by ln 2
    assert rows[1]["chi2"] > 50
    assert 0.1 < rows[1]["jsd"] <= math.log(2) + 1e-9

    # independent hand check of chi2 for the shifted row:
    # e = [10,20,30] scaled to n=60 -> e=[10,20,30];
    # (60-10)^2/10 + (0-20)^2/20 + (0-30)^2/30 = 250+20+30 = 300
    assert rows[1]["chi2"] == pytest.approx(300.0, abs=1e-6)

    # independent hand check of jsd for the identical row
    s, k, nr = 0.5, 3, 60
    p = [(c + s) / (nr + s * k) for c in ref]
    q = p  # same counts, same total
    m = [(a + b) / 2 for a, b in zip(p, q)]
    jsd = 0.5 * sum(
        a * math.log(a / c) + b * math.log(b / c)
        for a, b, c in zip(p, q, m)
    )
    assert rows[0]["jsd"] == pytest.approx(round(jsd, 6), abs=1e-9)

    with pytest.raises(ValueError):
        chi2_from_hist(F.col("hist"), [])
    with pytest.raises(ValueError):
        chi2_from_hist(F.col("hist"), [0, 0])
