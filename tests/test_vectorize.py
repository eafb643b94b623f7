"""Feature hashing + unigram log-prob scoring: bit-exact replication
against an independent hashlib implementation, sign conservation,
collision behavior, empty-doc semantics, and JVM-only plans."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.text import hashed_tf, unigram_logprob


def _bucket(s: str, width: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % width


def _expected_htf(docs, n_features, salt="htf"):
    out = {}
    for doc_id, text in docs:
        for tok in text.strip().split():
            idx = _bucket(salt + tok, n_features)
            sgn = 1 - 2 * (_bucket(salt + "-sgn" + tok, 1 << 32) % 2)
            out[(doc_id, idx)] = out.get((doc_id, idx), 0) + sgn
    return {k: v for k, v in out.items() if v != 0}


DOCS = [(1, "apple apple banana"), (2, "banana cherry  date"), (3, "   "), (4, "")]


def test_hashed_tf_matches_hashlib(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["feature_idx"]): r["weight"]
        for r in hashed_tf(df, n_features=64).collect()
    }
    assert got == _expected_htf(DOCS, 64)
    # blank/empty docs contribute nothing
    assert not any(d in (3, 4) for d, _ in got)


def test_hashed_tf_sign_conservation_under_collisions(spark):
    # n_features=2 forces collisions; sum of weights over a doc must
    # still equal the sum of that doc's per-token signs (linearity).
    df = spark.createDataFrame(DOCS[:2], "doc_id bigint, text string")
    got = hashed_tf(df, n_features=2).groupBy("doc_id").agg(
        F.sum("weight").alias("s")
    )
    per_doc = {r["doc_id"]: r["s"] for r in got.collect()}
    for doc_id, text in DOCS[:2]:
        signs = sum(
            1 - 2 * (_bucket("htf-sgn" + t, 1 << 32) % 2) for t in text.split()
        )
        assert per_doc.get(doc_id, 0) == signs
    with pytest.raises(ValueError):
        hashed_tf(df, n_features=1)


def test_unigram_logprob_hand_corpus(spark):
    # counts: a=2 b=2 c=1, total=5; per-token lp rounded to 6 then meaned
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, " ")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert set(got) == {1, 2}  # blank doc has no tokens to score
    lp = lambda c: round(math.log(c / 5), 6)
    assert got[1]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == pytest.approx(
        round((2 * lp(2) + lp(2)) / 3, 6), abs=1e-9
    )
    assert got[2]["n_tokens"] == 2
    assert got[2]["avg_logprob"] == pytest.approx(
        round((lp(2) + lp(1)) / 2, 6), abs=1e-9
    )
    # rarer tokens -> lower score (the fluency-screen direction)
    assert got[2]["avg_logprob"] < got[1]["avg_logprob"]


def test_partition_invariance_and_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    one = sorted(map(tuple, hashed_tf(df.coalesce(1), n_features=16).collect()))
    many = sorted(map(tuple, hashed_tf(df.repartition(7), n_features=16).collect()))
    assert one == many
    for frame in (hashed_tf(df, n_features=16), unigram_logprob(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
