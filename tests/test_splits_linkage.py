"""Row-level pins for walk_forward_splits (purge/embargo moat) and
fuzzy_pairs (blocking, length band, distance threshold)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.linkage import fuzzy_pairs
from pic2vec_spark.ops.sampling import walk_forward_splits


def test_walk_forward_hand_fixture(spark):
    # one test window [01-10, 01-20), purge 1 day, embargo 2 days
    rows = [
        (1, "2024-01-05 00:00:00"),  # train (past, clear of purge)
        (2, "2024-01-09 11:59:59"),  # dropped (inside 1-day purge)
        (3, "2024-01-10 00:00:00"),  # test (window start inclusive)
        (4, "2024-01-19 23:59:59"),  # test
        (5, "2024-01-20 00:00:00"),  # dropped (window end exclusive -> embargo)
        (6, "2024-01-21 23:59:59"),  # dropped (inside 2-day embargo)
        (7, "2024-01-22 00:00:00"),  # train (future, clear of embargo)
    ]
    df = spark.createDataFrame(rows, "event_id bigint, ts_s string").select(
        "event_id", F.to_timestamp("ts_s").alias("ts")
    )
    out = walk_forward_splits(
        df, "ts", ["2024-01-10", "2024-01-20"],
        purge_s=86400.0, embargo_s=2 * 86400.0,
    )
    got = {r["event_id"]: (r["fold"], r["role"]) for r in out.collect()}
    assert got == {
        1: (0, "train"),
        3: (0, "test"),
        4: (0, "test"),
        7: (0, "train"),
    }


def test_walk_forward_multi_fold_counts(spark):
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 3600  # hourly from 2024-01-01
        ).alias("ts"),
    )
    out = walk_forward_splits(
        df, "ts", ["2024-01-02", "2024-01-03", "2024-01-04"]
    )
    # no purge/embargo: every row participates in every fold
    assert out.count() == 200
    per = {
        (r["fold"], r["role"]): r["n"]
        for r in out.groupBy("fold", "role").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert per[(0, "test")] == 24 and per[(1, "test")] == 24
    # fold 0: train = the other 76 rows; fold 1 likewise
    assert per[(0, "train")] == 76 and per[(1, "train")] == 76


def test_walk_forward_requires_two_cuts(spark):
    df = spark.range(1).select(F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError):
        walk_forward_splits(df, "ts", ["2024-01-01"])


def test_fuzzy_pairs_hand_fixture(spark):
    rows = [
        (1, "red widget"),
        (2, "red widgets"),   # dist 1 to id 1 (same block "widgets"? no)
        (3, "rad widget"),    # dist 1 to id 1, same block
        (4, "blue widget"),   # dist 3 to id 1 -> excluded
        (5, "red bolt"),      # different block
        (6, None),            # NULL text: never matches
    ]
    df = spark.createDataFrame(rows, "pid bigint, name string")
    out = fuzzy_pairs(
        df, "pid", "name",
        block=F.element_at(F.split(F.col("name"), " "), -1), max_dist=2,
    )
    got = {(r["id1"], r["id2"]): r["dist"] for r in out.collect()}
    # id 2's block is "widgets" (last token), so it pairs with nobody
    assert got == {(1, 3): 1}


def test_fuzzy_pairs_length_band_is_sound(spark):
    # pairs the band discards must all have dist > max_dist: check by
    # comparing against an unblocked brute force on a small input
    rows = [(i, t) for i, t in enumerate(
        ["alpha", "alphas", "alp", "beta", "betas", "bet", "alpha"]
    )]
    df = spark.createDataFrame(rows, "pid bigint, name string")
    out = fuzzy_pairs(df, "pid", "name", block=F.lit(1), max_dist=2)
    got = {(r["id1"], r["id2"]): r["dist"] for r in out.collect()}
    brute = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                # tiny O(nm) levenshtein
                m = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
                for x in range(len(a) + 1):
                    m[x][0] = x
                for y in range(len(b) + 1):
                    m[0][y] = y
                for x in range(1, len(a) + 1):
                    for y in range(1, len(b) + 1):
                        m[x][y] = min(
                            m[x - 1][y] + 1,
                            m[x][y - 1] + 1,
                            m[x - 1][y - 1] + (a[x - 1] != b[y - 1]),
                        )
                if m[len(a)][len(b)] <= 2:
                    brute[(i, j)] = m[len(a)][len(b)]
    assert got == brute
