"""Data-quality constraint suite: hand-computed violation counts, the
single-pass plan property, and report-union compatibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.quality import (
    check_constraints,
    check_foreign_key,
    in_range,
    matches,
    not_null,
    unique,
)


@pytest.fixture()
def facts(spark):
    rows = [
        (1, "click", 10.0, 100),
        (2, "click", -5.0, 100),      # range violation (lo)
        (3, "VIEW", 20.0, 200),       # regexp violation
        (None, "view", 30.0, 200),    # null id
        (4, "view", None, 300),       # null value (range: not a violation)
        (4, "view", 999.0, 999),      # dup id + range violation (hi) + orphan fk
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double, user_id bigint"
    )


def test_constraint_counts(spark, facts):
    rep = check_constraints(
        facts,
        [
            not_null("event_id"),
            not_null("value"),
            in_range("value", 0, 100),
            matches("event_type", "^[a-z_]+$"),
            unique("event_id"),
        ],
    )
    got = {r["check_name"]: (r["n_rows"], r["n_violations"], r["pass"]) for r in rep.collect()}
    assert got == {
        "not_null(event_id)": (6, 1, False),
        "not_null(value)": (6, 1, False),
        "in_range(value,0,100)": (6, 2, False),
        "matches(event_type)": (6, 1, False),
        "unique(event_id)": (6, 1, False),
    }


def test_all_pass_and_empty_input(spark):
    df = spark.createDataFrame([(1, 5.0)], "k bigint, v double")
    rep = check_constraints(df, [not_null("k"), in_range("v", 0, 10)])
    assert all(r["pass"] for r in rep.collect())
    empty = check_constraints(df.limit(0), [not_null("k"), unique("k")])
    got = {r["check_name"]: r["n_violations"] for r in empty.collect()}
    assert got == {"not_null(k)": 0, "unique(k)": 0}
    with pytest.raises(ValueError):
        check_constraints(df, [])


def test_single_pass_plan(spark, facts):
    """The whole suite must be ONE aggregate over ONE scan — no
    per-constraint jobs."""
    rep = check_constraints(
        facts,
        [not_null("event_id"), in_range("value", 0, 100), unique("event_id")],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1


def test_foreign_key_report(spark, facts):
    dim = spark.createDataFrame([(100,), (200,), (300,)], "c_custkey bigint")
    rep = check_foreign_key(facts, "user_id", dim, "c_custkey")
    r = rep.collect()[0]
    assert r["check_name"] == "foreign_key(user_id)"
    assert (r["n_rows"], r["n_violations"], r["pass"]) == (6, 1, False)
    # unions cleanly with the aggregate report
    both = check_constraints(facts, [not_null("event_id")]).unionByName(rep)
    assert both.count() == 2
