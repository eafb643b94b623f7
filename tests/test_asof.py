"""As-of join semantics: zero temporal leakage + pandas merge_asof oracle
on the synthetic entity timeline, plus partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.asof import asof_join
from pic2vec_spark.synth import synth_timeline_pdf


@pytest.fixture(scope="module")
def timeline():
    pdf = synth_timeline_pdf(n_rows=2000, n_images=100, n_entities=25, seed=11)
    pdf["value"] = np.random.default_rng(3).normal(size=len(pdf))
    return pdf


def _sides(timeline):
    f = timeline[timeline.kind == "feature"][["entity_id", "ts", "row_id", "value"]]
    q = timeline[timeline.kind == "query"][["entity_id", "ts", "row_id"]]
    return f, q


def test_zero_leakage(spark, timeline):
    """∀ output rows: matched feature ts <= query ts."""
    f, q = _sides(timeline)
    out = asof_join(
        spark.createDataFrame(q),
        spark.createDataFrame(f),
        value_cols=["value"],
        tiebreak="row_id",
    )
    leaks = out.filter(F.col("ts_asof") > F.col("ts")).count()
    assert leaks == 0
    assert out.count() == len(q)


def test_matches_pandas_merge_asof(spark, timeline):
    f, q = _sides(timeline)
    out = (
        asof_join(
            spark.createDataFrame(q),
            spark.createDataFrame(f),
            value_cols=["value"],
            tiebreak="row_id",
        )
        .select("row_id", "value_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    # pandas oracle: merge_asof per entity (backward = latest ts <= query ts);
    # with unique float timestamps there are no ties to break.
    fs = f.sort_values("ts").reset_index(drop=True)
    qs = q.sort_values("ts").reset_index(drop=True)
    expected = pd.merge_asof(
        qs, fs, on="ts", by="entity_id", direction="backward", suffixes=("", "_f")
    ).set_index("row_id").sort_index()
    assert len(out) == len(expected)
    got_v = out["value_asof"].values
    exp_v = expected["value"].values
    both_nan = np.isnan(got_v.astype(float)) & np.isnan(exp_v.astype(float))
    assert (both_nan | np.isclose(got_v.astype(float), exp_v.astype(float), atol=1e-12)).all()


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_direction_matches_pandas_merge_asof(spark, timeline, direction):
    """forward / nearest directions vs the pandas merge_asof oracle
    (unique float timestamps — no ties to break)."""
    f, q = _sides(timeline)
    out = (
        asof_join(
            spark.createDataFrame(q),
            spark.createDataFrame(f),
            value_cols=["value"],
            tiebreak="row_id",
            direction=direction,
        )
        .select("row_id", "value_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    fs = f.sort_values("ts").reset_index(drop=True)
    qs = q.sort_values("ts").reset_index(drop=True)
    expected = pd.merge_asof(
        qs, fs, on="ts", by="entity_id", direction=direction, suffixes=("", "_f")
    ).set_index("row_id").sort_index()
    assert len(out) == len(expected)
    got_v = out["value_asof"].values.astype(float)
    exp_v = expected["value"].values.astype(float)
    both_nan = np.isnan(got_v) & np.isnan(exp_v)
    assert (both_nan | np.isclose(got_v, exp_v, atol=1e-12)).all()


def test_direction_equal_ts_tiebreaks(spark):
    """Equal-ts semantics: a query at the exact feature ts matches in
    BOTH directions; among equal-ts features backward takes the largest
    tiebreak, forward the smallest; nearest tie resolves backward."""
    f = pd.DataFrame(
        {"entity_id": [1, 1, 1], "ts": [10.0, 10.0, 30.0], "row_id": [1, 2, 3],
         "value": [100.0, 200.0, 300.0]}
    )
    q = pd.DataFrame({"entity_id": [1, 1], "ts": [10.0, 20.0], "row_id": [7, 8]})
    def run(d):
        return (
            asof_join(
                spark.createDataFrame(q), spark.createDataFrame(f),
                value_cols=["value"], tiebreak="row_id", direction=d,
            )
            .toPandas().set_index("row_id")["value_asof"].to_dict()
        )
    assert run("backward") == {7: 200.0, 8: 200.0}   # largest tie at ts=10
    assert run("forward") == {7: 100.0, 8: 300.0}    # smallest tie at ts=10
    assert run("nearest") == {7: 200.0, 8: 200.0}    # 20 is 10 from both → backward


def test_sliding_range_agg_includes_equal_ts_peers(spark):
    from pic2vec_spark.ops.windows import sliding_range_agg

    pdf = pd.DataFrame(
        {
            "entity_id": [1] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:30:00",
                 "2024-01-01 00:30:00", "2024-01-01 02:00:00"]
            ),
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = (
        sliding_range_agg(spark.createDataFrame(pdf), window_s=3600)
        .toPandas().sort_values(["ts", "value"]).reset_index(drop=True)
    )
    # both 00:30 rows see each other (RANGE peers) plus 00:00
    assert list(out["n_1h"]) == [1, 3, 3, 1]
    assert list(out["avg_1h"]) == [1.0, pytest.approx(7 / 3, abs=1e-4),
                                   pytest.approx(7 / 3, abs=1e-4), 8.0]


@pytest.mark.parametrize("tol", [None, 30.0])
def test_broadcast_asof_equals_shuffle_asof(spark, timeline, tol):
    """asof_join_broadcast (broadcast features + searchsorted probe, no
    query-side shuffle) must produce exactly the shuffle implementation's
    result, including tolerance nulling and equal-ts/tiebreak rules."""
    from pic2vec_spark.ops.asof import asof_join_broadcast

    f, q = _sides(timeline)
    kw = dict(value_cols=["value"], tiebreak="row_id", tolerance_s=tol)
    a = (
        asof_join(spark.createDataFrame(q), spark.createDataFrame(f), **kw)
        .select("row_id", "ts_asof", "value_asof")
        .toPandas().set_index("row_id").sort_index()
    )
    b = (
        asof_join_broadcast(spark.createDataFrame(q), spark.createDataFrame(f), **kw)
        .select("row_id", "ts_asof", "value_asof")
        .toPandas().set_index("row_id").sort_index()
    )
    for col in ("ts_asof", "value_asof"):
        av = a[col].to_numpy(dtype=float)
        bv = b[col].to_numpy(dtype=float)
        nan = np.isnan(av) & np.isnan(bv)
        assert (nan | np.isclose(av, bv, atol=1e-9)).all(), col
    # and the probe plan has NO exchange on the query side
    plan = asof_join_broadcast(
        spark.createDataFrame(q), spark.createDataFrame(f),
        value_cols=["value"], tiebreak="row_id",
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_tolerance(spark, timeline):
    f, q = _sides(timeline)
    out = asof_join(
        spark.createDataFrame(q),
        spark.createDataFrame(f),
        value_cols=["value"],
        tiebreak="row_id",
        tolerance_s=60.0,
    )
    bad = out.filter(
        F.col("ts_asof").isNotNull()
        & (F.unix_micros("ts") - F.unix_micros("ts_asof") > 60_000_000)
    ).count()
    assert bad == 0
    # tolerance must null out some matches on this data
    n_all = asof_join(
        spark.createDataFrame(q), spark.createDataFrame(f),
        value_cols=["value"], tiebreak="row_id",
    ).filter(F.col("value_asof").isNotNull()).count()
    n_tol = out.filter(F.col("value_asof").isNotNull()).count()
    assert n_tol < n_all


def test_partition_invariance(spark, timeline):
    f, q = _sides(timeline)
    outs = []
    for parts in (1, 13):
        out = asof_join(
            spark.createDataFrame(q).repartition(parts),
            spark.createDataFrame(f).repartition(parts),
            value_cols=["value"],
            tiebreak="row_id",
        )
        outs.append(
            out.select("row_id", "value_asof").toPandas().set_index("row_id").sort_index()
        )
    a, b = outs
    av, bv = a["value_asof"].astype(float).values, b["value_asof"].astype(float).values
    assert ((np.isnan(av) & np.isnan(bv)) | (av == bv)).all()


def test_query_side_own_value_column_untouched(spark, timeline):
    """When the query side carries a column with the same name as a
    feature value column, the query's own values must pass through and
    the as-of result must land in the suffixed column only."""
    f, q = _sides(timeline)
    q2 = spark.createDataFrame(q).withColumn("value", F.lit(-1.0))
    out = asof_join(
        q2, spark.createDataFrame(f), value_cols=["value"], tiebreak="row_id"
    ).toPandas()
    assert (out["value"] == -1.0).all()
    assert "value_asof" in out.columns
    assert out["value_asof"].notna().sum() > 0


def test_salted_repartition_preserves_rows(spark, timeline):
    from pic2vec_spark.ops.skew import hot_keys, salted_repartition

    f, _ = _sides(timeline)
    df = spark.createDataFrame(f)
    salted = salted_repartition(df, "entity_id", num_partitions=16, salt=4)
    assert salted.count() == df.count()
    assert salted.rdd.getNumPartitions() == 16
    hot = hot_keys(df, "entity_id", min_count=50).toPandas()
    counts = df.groupBy("entity_id").count().toPandas()
    assert set(hot.entity_id) == set(counts[counts["count"] >= 50].entity_id)


def test_broadcast_asof_null_value_semantics(spark):
    """A null value on the matched feature ROW must not mask an older
    non-null value: both implementations take the latest NON-NULL per
    value column (F.last ignorenulls semantics), while ts_asof tracks
    the latest feature row regardless."""
    from pic2vec_spark.ops.asof import asof_join_broadcast

    f = pd.DataFrame(
        {"entity_id": [1, 1], "ts": [1.0, 2.0], "row_id": [1, 2],
         "value": [5.0, None]}
    )
    q = pd.DataFrame({"entity_id": [1], "ts": [3.0], "row_id": [7]})
    kw = dict(value_cols=["value"], tiebreak="row_id")
    a = asof_join(spark.createDataFrame(q), spark.createDataFrame(f), **kw).toPandas()
    b = asof_join_broadcast(
        spark.createDataFrame(q), spark.createDataFrame(f), **kw
    ).toPandas()
    assert a.loc[0, "value_asof"] == 5.0 and b.loc[0, "value_asof"] == 5.0
    assert a.loc[0, "ts_asof"] == 2.0 and b.loc[0, "ts_asof"] == 2.0


def test_decayed_sum_matches_bruteforce_and_huge_span(spark):
    """Fast path: exact vs O(n^2) brute force within the safe span, NULL
    (not NaN/inf) beyond it.  Grouped segmented path: exact at ANY span,
    including one that would overflow the factored single-pass form."""
    from pic2vec_spark.ops.windows import decayed_sum, decayed_sum_grouped

    tau = 10.0
    rng = np.random.default_rng(5)
    # entity 1: normal span; entity 2: 2000*tau span (overflow territory)
    t1 = np.sort(rng.uniform(0, 50 * tau, 40))
    t2 = np.sort(np.concatenate([[0.0, tau], rng.uniform(1900 * tau, 2000 * tau, 20)]))
    pdf = pd.DataFrame(
        {
            "entity_id": [1] * len(t1) + [2] * len(t2),
            "ts": np.concatenate([t1, t2]),
            "value": rng.normal(1.0, 0.3, len(t1) + len(t2)),
        }
    )

    def brute(t, v):
        return np.array(
            [sum(v[j] * np.exp(-(t[i] - t[j]) / tau) for j in range(i + 1)) for i in range(len(t))]
        )

    fast = (
        decayed_sum(spark.createDataFrame(pdf), tau_s=tau)
        .toPandas().sort_values(["entity_id", "ts"]).reset_index(drop=True)
    )
    grouped = (
        decayed_sum_grouped(spark.createDataFrame(pdf), tau_s=tau)
        .toPandas().sort_values(["entity_id", "ts"]).reset_index(drop=True)
    )
    for eid in (1, 2):
        sub = pdf[pdf.entity_id == eid].sort_values("ts")
        expect = brute(sub.ts.to_numpy(), sub.value.to_numpy())
        g = grouped[grouped.entity_id == eid]["decayed_sum"].to_numpy(float)
        assert np.allclose(g, expect, atol=1e-5), eid  # grouped: exact anywhere
        f = fast[fast.entity_id == eid]["decayed_sum"].to_numpy(float)
        if eid == 1:
            assert np.allclose(f, expect, atol=1e-5)
        else:
            # the two ancient rows are beyond the safe span: NULL, never NaN/inf
            assert np.isnan(f[:2]).all() and np.isfinite(f[2:]).all()
            assert np.allclose(f[2:], expect[2:], atol=1e-5)


def test_nearest_tolerance_per_direction(spark):
    """merge_asof semantics: an out-of-tolerance NEARER side must not
    mask a valid farther side — tolerance filters each direction before
    the nearest pick."""
    # backward feature 30s before (out of 60s? no - in); forward 100s after (out)
    f = pd.DataFrame(
        {"entity_id": [1, 1], "ts": [0.0, 130.0], "row_id": [1, 2],
         "value": [10.0, 20.0]}
    )
    # query at ts=100: backward dist 100 (out of tol 50), forward dist 30 (in)
    q = pd.DataFrame({"entity_id": [1], "ts": [100.0], "row_id": [7]})
    out = asof_join(
        spark.createDataFrame(q), spark.createDataFrame(f),
        value_cols=["value"], tiebreak="row_id",
        direction="nearest", tolerance_s=50.0,
    ).toPandas()
    # nearer side is FORWARD (30s) and in tolerance -> 20.0
    assert out.loc[0, "value_asof"] == 20.0
    # flip: query at 30 -> backward dist 30 in-tol, forward dist 100 out
    q2 = pd.DataFrame({"entity_id": [1], "ts": [30.0], "row_id": [8]})
    out2 = asof_join(
        spark.createDataFrame(q2), spark.createDataFrame(f),
        value_cols=["value"], tiebreak="row_id",
        direction="nearest", tolerance_s=50.0,
    ).toPandas()
    assert out2.loc[0, "value_asof"] == 10.0
    # both out of tolerance -> null
    out3 = asof_join(
        spark.createDataFrame(q), spark.createDataFrame(f),
        value_cols=["value"], tiebreak="row_id",
        direction="nearest", tolerance_s=10.0,
    ).toPandas()
    assert pd.isna(out3.loc[0, "value_asof"]) and pd.isna(out3.loc[0, "ts_asof"])
    # pandas agreement on the masked case
    exp = pd.merge_asof(
        q.sort_values("ts"), f.sort_values("ts"), on="ts", by="entity_id",
        direction="nearest", tolerance=50.0, suffixes=("", "_f"),
    )
    assert exp.loc[0, "value"] == 20.0


def test_null_entity_key_parity(spark):
    """NULL entity keys never match on either side, in BOTH
    implementations (SQL join semantics): null-key feature rows are
    invisible, null-key query rows come back with null matches — the
    window version must not group NULLs into a matchable partition."""
    from pic2vec_spark.ops.asof import asof_join_broadcast

    f = pd.DataFrame(
        {"entity_id": ["a", None, None], "ts": [1.0, 1.0, 2.0],
         "row_id": [1, 2, 3], "value": [10.0, 20.0, 30.0]}
    )
    q = pd.DataFrame(
        {"entity_id": ["a", None, "b"], "ts": [5.0, 5.0, 5.0],
         "row_id": [7, 8, 9]}
    )
    kw = dict(value_cols=["value"], tiebreak="row_id")
    for fn in (asof_join, asof_join_broadcast):
        out = (
            fn(spark.createDataFrame(q), spark.createDataFrame(f), **kw)
            .toPandas().set_index("row_id").sort_index()
        )
        assert len(out) == 3, fn.__name__
        assert out.loc[7, "value_asof"] == 10.0, fn.__name__
        assert pd.isna(out.loc[8, "value_asof"]), fn.__name__
        assert pd.isna(out.loc[9, "value_asof"]), fn.__name__


def test_decayed_sum_grouped_tiebreak_matches_window(spark):
    """decayed_sum_grouped(tiebreak=...) must reproduce
    decayed_sum(tiebreak=...) exactly on tied timestamps — running sums
    at a tied ts differ per-row by which rows sort first."""
    from pic2vec_spark.ops.windows import decayed_sum, decayed_sum_grouped

    pdf = pd.DataFrame(
        {"entity_id": [1] * 4 + [2] * 2,
         "ts": [1.0, 1.0, 1.0, 2.0, 5.0, 5.0],
         "row_id": [3, 1, 2, 4, 6, 5],
         "value": [10.0, 20.0, 30.0, 5.0, 7.0, 11.0]}
    )
    a = (
        decayed_sum(spark.createDataFrame(pdf), 10.0, tiebreak="row_id")
        .toPandas().set_index("row_id").sort_index()
    )
    b = (
        decayed_sum_grouped(spark.createDataFrame(pdf), 10.0, tiebreak="row_id")
        .toPandas().set_index("row_id").sort_index()
    )
    assert np.allclose(
        a["decayed_sum"].to_numpy(float), b["decayed_sum"].to_numpy(float)
    )
    # the tied rows must carry DIFFERENT running values (order matters)
    assert a.loc[1, "decayed_sum"] != a.loc[2, "decayed_sum"]


def test_range_join_semantics_and_boundaries(spark):
    """Half-open [start, end): ts==start matches, ts==end does not;
    key isolation; long intervals spanning many buckets still match;
    empty intervals match nothing — checked against a naive non-equi
    join on the same data."""
    from pic2vec_spark.ops.ranges import range_join

    pts = pd.DataFrame(
        {"pid": range(8),
         "entity_id": [1, 1, 1, 1, 2, 2, 2, 2],
         "ts": [0.0, 5.0, 10.0, 25.0, 5.0, 99.0, 100.0, 250.0]}
    )
    iv = pd.DataFrame(
        {"iid": [10, 11, 12, 13],
         "entity_id": [1, 1, 2, 2],
         "start": [5.0, 20.0, 0.0, 30.0],
         # 12 spans many 7s-buckets; 13 is empty (end <= start)
         "end": [10.0, 30.0, 100.0, 30.0]}
    )
    got = (
        range_join(
            spark.createDataFrame(pts), spark.createDataFrame(iv),
            ts="ts", start="start", end="end", on="entity_id", bucket_s=7.0,
        )
        .select("pid", "iid").toPandas()
    )
    got_pairs = set(zip(got.pid, got.iid))
    naive = (
        spark.createDataFrame(pts).alias("p")
        .join(spark.createDataFrame(iv).alias("i"), on="entity_id")
        .filter("start <= ts AND ts < end")
        .select("pid", "iid").toPandas()
    )
    assert got_pairs == set(zip(naive.pid, naive.iid))
    assert (1, 10) in got_pairs      # ts == start included
    assert (2, 10) not in got_pairs  # ts == end excluded
    assert (4, 12) in got_pairs and (5, 12) in got_pairs  # long interval
    assert (6, 12) not in got_pairs  # ts == end of the long interval
    assert not any(i == 13 for _, i in got_pairs)  # empty interval
    # no duplicate pairs (a point meets an interval in exactly one bucket)
    assert len(got) == len(got_pairs)


def test_range_join_timestamp_exact_boundary(spark):
    """Timestamp columns compare as integer epoch-µs: a point exactly
    1 µs before the window end matches, exactly at it does not."""
    from pic2vec_spark.ops.ranges import range_join

    base = pd.Timestamp("2026-01-01 00:00:00")
    end = base + pd.Timedelta(hours=2)
    pts = spark.createDataFrame(
        pd.DataFrame(
            {"pid": [1, 2],
             "k": [1, 1],
             "ts": [end - pd.Timedelta(microseconds=1), end]}
        )
    )
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [9], "k": [1], "start": [base], "end": [end]})
    )
    got = range_join(
        pts, iv, ts="ts", start="start", end="end", on="k", bucket_s=3600.0
    ).select("pid").toPandas()
    assert got.pid.tolist() == [1]


def test_range_join_rejects_mixed_and_bad_bucket(spark):
    from pic2vec_spark.ops.ranges import range_join

    pts = spark.createDataFrame([(1, 1.0)], "pid int, ts double")
    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [1], "start": [pd.Timestamp("2026-01-01")],
                      "end": [pd.Timestamp("2026-01-02")]})
    )
    import pytest

    with pytest.raises(ValueError, match="all be timestamps"):
        range_join(pts, iv)
    with pytest.raises(ValueError, match="bucket_s"):
        range_join(pts, pts.selectExpr("ts as start", "ts as end"), bucket_s=0)


def test_range_join_numeric_boundary_replication(spark):
    """An interval whose end sits a hair above a bucket boundary must
    still replicate into the boundary bucket: interval [0, 3+5e-10)
    with 1s buckets contains ts=3.0 (bucket 3) — an epsilon-subtracted
    upper-replica bound would drop it silently."""
    from pic2vec_spark.ops.ranges import range_join

    pts = spark.createDataFrame([(1, 1, 3.0)], "pid int, k int, ts double")
    iv = spark.createDataFrame(
        [(9, 1, 0.0, 3.0000000005)], "iid int, k int, start double, end double"
    )
    got = range_join(
        pts, iv, ts="ts", start="start", end="end", on="k", bucket_s=1.0
    ).select("pid", "iid").toPandas()
    assert list(zip(got.pid, got.iid)) == [(1, 9)]


def test_compact_features_equivalence_at_bucket_granularity(spark, timeline):
    """Backward as-of over compact_features(bucket) == over raw features
    for queries at bucket granularity (ts snapped to a bucket boundary
    minus 1 us, so no query lands inside a still-filling bucket) — the
    hot-entity pre-aggregation loses nothing at its contract granularity."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.asof import asof_join, compact_features

    f, q = _sides(timeline)
    bucket_s = 3600.0
    fdf = spark.createDataFrame(f)
    # snap query timestamps to bucket boundaries minus 1 us
    q2 = q.copy()
    snapped = (q2["ts"].astype("int64") // int(bucket_s * 1e6) + 1) * int(
        bucket_s * 1e6
    ) - 1
    q2["ts"] = pd.to_datetime(snapped, unit="us")
    qdf = spark.createDataFrame(q2)

    raw = (
        asof_join(qdf, fdf, tiebreak="row_id")
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    compacted = (
        asof_join(qdf, fdf, tiebreak="row_id", compact_bucket_s=bucket_s)
        .toPandas().sort_values("row_id").reset_index(drop=True)
    )
    assert raw["ts_asof"].equals(compacted["ts_asof"])
    a, b = raw["value_asof"], compacted["value_asof"]
    assert ((a.isna() & b.isna()) | (a == b)).all()

    # and the feature side genuinely shrank to <=1 row/(entity, bucket)
    comp = compact_features(fdf, bucket_s, tiebreak="row_id")
    n_comp = comp.count()
    n_groups = (
        fdf.select(
            "entity_id",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                    / F.lit(int(bucket_s * 1e6))).alias("b"),
        ).distinct().count()
    )
    assert n_comp == n_groups < fdf.count()


def test_compact_features_per_column_last_nonnull(spark):
    """Compaction must carry each value column's last NON-NULL in the
    bucket (asof_join's ignorenulls semantics), not the last row's null."""
    import datetime as dt

    from pic2vec_spark.ops.asof import compact_features

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(seconds=10), 1.5, "a"),
        (1, t0 + dt.timedelta(seconds=20), None, None),  # last row: nulls
        (1, t0 + dt.timedelta(seconds=70), 9.0, "z"),    # next bucket
    ]
    df = spark.createDataFrame(
        rows, "entity_id int, ts timestamp, value double, tag string"
    )
    out = compact_features(df, 60.0).orderBy("ts").collect()
    assert len(out) == 2
    first = out[0]
    assert first.ts == t0 + dt.timedelta(seconds=20)  # bucket's latest ts
    assert first.value == 1.5 and first.tag == "a"    # last NON-NULL values
    assert out[1].value == 9.0


def test_compact_rejects_non_backward(spark, timeline):
    import pytest

    from pic2vec_spark.ops.asof import asof_join

    f, q = _sides(timeline)
    with pytest.raises(ValueError, match="backward"):
        asof_join(
            spark.createDataFrame(q), spark.createDataFrame(f),
            direction="forward", compact_bucket_s=60.0,
        )


def test_skew_profile_hand_fixture(spark):
    from pic2vec_spark.ops.skew import skew_profile

    # counts: hot=6, a=2, b=1, NULL=1  -> n=10, k=4, max=6
    rows = [("hot",)] * 6 + [("a",)] * 2 + [("b",)] + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_profile(df, "k", top_n=2).collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_key_rows"]) == (10, 4, 6)
    assert r["skew_ratio"] == pytest.approx(6 / 2.5, abs=1e-6)
    assert r["top_share"] == pytest.approx(8 / 10, abs=1e-6)  # hot + a
    # Gini via the rank identity: counts sorted asc [1,1,2,6],
    # sum(i*c) = 1+2+6+24 = 33 -> 2*33/(4*10) - 5/4 = 0.4
    assert r["gini"] == pytest.approx(0.4, abs=1e-6)
    with pytest.raises(ValueError):
        skew_profile(df, "k", top_n=0)


def test_skew_profile_uniform_gini_zero(spark):
    from pic2vec_spark.ops.skew import skew_profile

    df = spark.createDataFrame([(str(i),) for i in range(8)] * 3, "k string")
    r = skew_profile(df, "k").collect()[0]
    assert r["skew_ratio"] == 1.0
    assert r["gini"] == 0.0
