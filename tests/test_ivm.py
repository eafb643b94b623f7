"""Incremental view maintenance: decomposable aggregate state.

Pins the defining property — state(base ∪ deltas) == merge of the
per-batch states — plus merge-order invariance, schema closure under
merging (a merged state can be merged again), null handling, and a
hand-computed finalize fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.ivm import agg_state, finalize_agg, merge_agg_states

KEYS = ["user_id", "event_type"]


def _events(spark, seed: int = 7, n: int = 400):
    return (
        spark.range(n)
        .select(
            (F.xxhash64(F.col("id"), F.lit(seed)) % 13).alias("user_id"),
            F.concat(
                F.lit("t"), (F.xxhash64(F.col("id"), F.lit(seed + 1)) % 3)
            ).alias("event_type"),
            F.when(
                F.xxhash64(F.col("id"), F.lit(seed + 2)) % 10 != 0,
                (F.xxhash64(F.col("id"), F.lit(seed + 3)) % 10000) / 100.0,
            ).alias("value"),
            F.col("id"),
        )
    )


def _collect_map(df):
    return {
        (r["user_id"], r["event_type"]): tuple(
            r[c] for c in df.columns if c not in KEYS
        )
        for r in df.collect()
    }


def test_incremental_equals_direct(spark):
    ev = _events(spark)
    direct = finalize_agg(agg_state(ev, KEYS, "value"), KEYS)
    # three arbitrary batches partitioning the input
    batches = [
        ev.filter(F.col("id") % 3 == i).drop("id") for i in range(3)
    ]
    states = [agg_state(b, KEYS, "value") for b in batches]
    merged = finalize_agg(merge_agg_states(states, KEYS), KEYS)
    assert _collect_map(merged) == _collect_map(direct)


def test_merge_order_invariant_and_associative(spark):
    ev = _events(spark, seed=11)
    batches = [ev.filter(F.col("id") % 3 == i).drop("id") for i in range(3)]
    s = [agg_state(b, KEYS, "value") for b in batches]
    a = merge_agg_states([s[0], s[1], s[2]], KEYS)
    b = merge_agg_states([s[2], s[0], s[1]], KEYS)
    # incremental re-merge: merge(merge(s0,s1), s2)
    c = merge_agg_states([merge_agg_states([s[0], s[1]], KEYS), s[2]], KEYS)
    ma, mb, mc = _collect_map(a), _collect_map(b), _collect_map(c)
    assert ma == mb == mc


def test_merged_state_schema_closed(spark):
    ev = _events(spark, seed=3)
    s0 = agg_state(ev.filter("id % 2 = 0"), KEYS, "value")
    s1 = agg_state(ev.filter("id % 2 = 1"), KEYS, "value")
    merged = merge_agg_states([s0, s1], KEYS)
    # type-level closure (nullability metadata differs: count is
    # non-nullable, sum-of-counts nullable — irrelevant to merging)
    assert merged.schema.simpleString() == s0.schema.simpleString()
    # and a re-merge of the merged state is accepted + correct
    direct = agg_state(ev.drop("id"), KEYS, "value")
    remerged = merge_agg_states([merged], KEYS)
    assert _collect_map(remerged) == _collect_map(direct)


def test_finalize_hand_fixture(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (1, "a", 2.5),
            (1, "a", None),
            (2, "b", -3.0),
        ],
        "user_id bigint, event_type string, value double",
    )
    out = {
        (r["user_id"], r["event_type"]): r
        for r in finalize_agg(agg_state(df, KEYS, "value"), KEYS).collect()
    }
    r = out[(1, "a")]
    assert r["n_rows"] == 3 and r["n_vals"] == 2
    assert r["sum_value"] == pytest.approx(4.0)
    assert r["min_value"] == 1.5 and r["max_value"] == 2.5
    assert r["avg_value"] == pytest.approx(2.0)
    r = out[(2, "b")]
    assert r["n_rows"] == 1 and r["sum_value"] == pytest.approx(-3.0)
    assert r["avg_value"] == pytest.approx(-3.0)


def test_all_null_group_has_null_avg(spark):
    df = spark.createDataFrame(
        [(1, "a", None)], "user_id bigint, event_type string, value double"
    )
    r = finalize_agg(agg_state(df, KEYS, "value"), KEYS).collect()[0]
    assert r["n_rows"] == 1 and r["n_vals"] == 0
    assert r["avg_value"] is None and r["min_value"] is None


def test_merge_requires_states(spark):
    with pytest.raises(ValueError):
        merge_agg_states([], KEYS)
