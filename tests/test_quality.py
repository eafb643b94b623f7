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


class TestRuleFunnel:
    """Gopher-style attrition report: hand-computed funnel over a
    3-rule fixture, single-pass plan, and empty-input semantics."""

    @pytest.fixture()
    def ruled(self, spark):
        # (a, b, c): a passes 3/4, b 3/4, c 2/4; cumulative 3, 2, 1
        rows = [
            (True, True, True),
            (True, True, False),
            (True, False, True),
            (False, True, False),
        ]
        return spark.createDataFrame(rows, "a boolean, b boolean, c boolean")

    def test_hand_funnel(self, ruled):
        from pic2vec_spark.ops.quality import rule_funnel

        out = {
            r["rule"]: r
            for r in rule_funnel(ruled, ["a", "b", "c"]).collect()
        }
        assert len(out) == 3
        assert (out["a"]["n_pass"], out["a"]["n_survive"]) == (3, 3)
        assert (out["b"]["n_pass"], out["b"]["n_survive"]) == (3, 2)
        assert (out["c"]["n_pass"], out["c"]["n_survive"]) == (2, 1)
        assert [out[k]["rule_order"] for k in ("a", "b", "c")] == [1, 2, 3]
        assert all(r["n_total"] == 4 for r in out.values())
        assert out["c"]["pass_rate"] == 0.5
        assert out["c"]["survive_rate"] == 0.25

    def test_order_changes_survivors_not_passes(self, ruled):
        from pic2vec_spark.ops.quality import rule_funnel

        out = {
            r["rule"]: r
            for r in rule_funnel(ruled, ["c", "a", "b"]).collect()
        }
        # independent pass counts are order-free; survivors are not
        assert out["c"]["n_pass"] == 2 and out["c"]["n_survive"] == 2
        assert out["a"]["n_survive"] == 2   # c AND a
        assert out["b"]["n_survive"] == 1   # c AND a AND b
        assert out["b"]["n_pass"] == 3

    def test_empty_input(self, spark):
        from pic2vec_spark.ops.quality import rule_funnel

        empty = spark.createDataFrame([], "a boolean, b boolean")
        rows = rule_funnel(empty, ["a", "b"]).collect()
        assert len(rows) == 2
        for r in rows:
            assert (r["n_total"], r["n_pass"], r["n_survive"]) == (0, 0, 0)
            assert r["pass_rate"] is None and r["survive_rate"] is None

    def test_single_scan_plan(self, ruled):
        from pic2vec_spark.ops.quality import rule_funnel

        plan = rule_funnel(ruled, ["a", "b", "c"])._jdf.queryExecution().executedPlan().toString()
        # one aggregation over the input, no join, no per-rule re-scan
        assert plan.count("LocalTableScan") <= 1
        assert "Join" not in plan

    def test_needs_rules(self, ruled):
        from pic2vec_spark.ops.quality import rule_funnel

        with pytest.raises(ValueError, match="at least one rule"):
            rule_funnel(ruled, [])


def test_corpus_datacard_closed_form(spark):
    """Four docs, one exact dup pair: every section checked against
    hand arithmetic, and the report is partition-invariant."""
    from pic2vec_spark.ops.datacard import corpus_datacard

    rows = [
        (0, "a b c", "en", "web"),
        (1, "a b c", "en", "web"),
        (2, "x y", "de", "web"),
        (3, "p q r s", "en", "code"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_datacard(df).collect()
    }
    assert out[("size", "n_docs")] == 4.0
    assert out[("size", "n_tokens")] == 12.0
    assert out[("size", "n_chars")] == 5 + 5 + 3 + 7
    assert abs(out[("dup", "exact_dup_frac")] - 0.25) < 1e-9
    assert abs(out[("length", "mean_tokens")] - 3.0) < 1e-9
    assert out[("length", "min_tokens")] == 2.0
    assert out[("length", "max_tokens")] == 4.0
    assert abs(out[("lang", "en")] - 0.75) < 1e-9
    assert abs(out[("lang", "de")] - 0.25) < 1e-9
    assert abs(out[("source", "web")] - 0.75) < 1e-9
    assert abs(out[("source", "code")] - 0.25) < 1e-9
    # partition invariance
    out7 = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_datacard(df.repartition(7)).collect()
    }
    assert out7 == out


def test_datacard_diff_alignment_and_zero_fill(spark):
    """A metric present in only one card reads 0 on the other side and
    its delta carries the sign; matched metrics subtract exactly."""
    from pic2vec_spark.ops.datacard import datacard_diff

    a = spark.createDataFrame(
        [("size", "n_docs", 4.0), ("lang", "de", 0.25)],
        "section string, metric string, value double",
    )
    b = spark.createDataFrame(
        [("size", "n_docs", 6.0), ("lang", "fr", 0.5)],
        "section string, metric string, value double",
    )
    out = {
        (r["section"], r["metric"]): (r["value_a"], r["value_b"], r["delta"])
        for r in datacard_diff(a, b).collect()
    }
    assert out[("size", "n_docs")] == (4.0, 6.0, 2.0)
    assert out[("lang", "de")] == (0.25, 0.0, -0.25)
    assert out[("lang", "fr")] == (0.0, 0.5, 0.5)
    assert len(out) == 3


def test_embedding_quality_verdicts(spark):
    """Each defect class gets exactly its own flags; clean unit-ish
    vectors pass; the screen never throws on NULL/ragged input."""
    from pic2vec_spark.ops.quality import embedding_quality

    rows = [
        (0, [3.0, 4.0]),          # clean: norm 5
        (1, None),                # NULL vector
        (2, [float("nan"), 1.0]), # NaN component
        (3, [0.0, 0.0]),          # zero norm
        (4, [1.0]),               # wrong dim
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r for r in embedding_quality(df, expected_dim=2).collect()}
    assert out[0]["vec_ok"] and out[0]["norm"] == 5.0 and out[0]["dim"] == 2
    assert not out[1]["vec_ok"] and out[1]["dim"] == -1
    assert out[2]["has_nan"] and not out[2]["vec_ok"]
    assert out[3]["is_zero_norm"] and not out[3]["vec_ok"]
    assert not out[4]["dim_ok"] and not out[4]["vec_ok"]
    # no UDF: the plan is pure JVM expressions
    plan = embedding_quality(df, expected_dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_corpus_datacard_no_dups_and_single_doc(spark):
    """dup fraction is exactly 0 on an all-distinct corpus; a one-doc
    corpus produces a complete card with share 1.0 everywhere."""
    from pic2vec_spark.ops.datacard import corpus_datacard

    rows = [(i, f"unique text {i}", "en", "web") for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    out = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_datacard(df).collect()
    }
    assert out[("dup", "exact_dup_frac")] == 0.0
    one = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_datacard(df.limit(1)).collect()
    }
    assert one[("size", "n_docs")] == 1.0
    assert one[("lang", "en")] == 1.0 and one[("source", "web")] == 1.0
    assert one[("length", "min_tokens")] == one[("length", "max_tokens")]
