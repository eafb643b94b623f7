"""Bigram LM perplexity (add-k smoothed) + CCNet-style quality buckets.

The reference implementation here is an independent sequential
dict-loop — nothing shared with the distributed plan — so the tests pin
semantics (smoothing formula, context counts, vocabulary size, tie
handling), not just self-consistency.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.text import bigram_logprob, perplexity_buckets


def _py_bigram_ref(texts: dict[int, str], k: float = 1.0) -> dict[int, tuple]:
    """Sequential add-k bigram LM: per-doc (n_bigrams, avg_logprob, ppl)."""
    toks = {i: [w for w in t.strip().split() if w] for i, t in texts.items()}
    bc: Counter = Counter()
    vocab: set = set()
    for ws in toks.values():
        vocab.update(ws)
        bc.update(zip(ws, ws[1:]))
    ctx: Counter = Counter()
    for (w1, _), c in bc.items():
        ctx[w1] += c
    v = len(vocab)
    out = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lps = [
            round(math.log((bc[p] + k) / (ctx[p[0]] + k * v)), 6)
            for p in pairs
        ]
        avg = round(sum(lps) / len(lps), 6)
        out[i] = (len(pairs), avg, round(math.exp(-avg), 6))
    return out


CORPUS = {
    1: "a b a b",
    2: "a b",
    3: "c",                      # single token: no bigram, drops out
    4: "the cat sat on the mat",
    5: "the cat sat on the cat",
    6: "zz qq zz qq zz",
    7: "   ",                    # whitespace only: drops out
}


def _run(spark, texts=CORPUS, k=1.0, parts=1):
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id bigint, text string"
    ).repartition(parts)
    return {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["ppl"])
        for r in bigram_logprob(df, k=k).collect()
    }


def test_matches_sequential_reference(spark):
    got = _run(spark)
    want = _py_bigram_ref(CORPUS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i
        assert got[i][2] == pytest.approx(want[i][2], rel=1e-9), i


def test_hand_computed_closed_form(spark):
    # corpus {1,2,3}: c(a,b)=3, c(b,a)=1, ctx(a)=3, ctx(b)=1, V=3
    got = _run(spark, {1: "a b a b", 2: "a b", 3: "c"})
    lp_ab = round(math.log((3 + 1) / (3 + 3)), 6)
    lp_ba = round(math.log((1 + 1) / (1 + 3)), 6)
    assert got[1][0] == 3
    assert got[1][1] == pytest.approx(
        round((2 * lp_ab + lp_ba) / 3, 6), abs=1e-9
    )
    assert got[2] == (
        1, lp_ab, pytest.approx(round(math.exp(-lp_ab), 6), rel=1e-9)
    )
    assert 3 not in got


def test_add_k_parameter(spark):
    got = _run(spark, k=0.5)
    want = _py_bigram_ref(CORPUS, k=0.5)
    for i in want:
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9), i


def test_partition_invariance(spark):
    assert _run(spark, parts=1) == _run(spark, parts=7)


def test_perplexity_buckets_tertiles(spark):
    # 9 known ppl values 1..9 -> exact tertiles at 3.667/6.333:
    # strictly-less rule puts 1-3 head, 4-6 middle, 7-9 tail.
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "doc_id bigint, ppl double"
    )
    rows = {r["doc_id"]: r for r in perplexity_buckets(df).collect()}
    for i in range(1, 10):
        want = "head" if i <= 3 else ("middle" if i <= 6 else "tail")
        assert rows[i]["bucket"] == want, i
        assert rows[i]["bucket_id"] == {"head": 1, "middle": 2, "tail": 3}[want]


def test_perplexity_buckets_label_guard(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, ppl double")
    with pytest.raises(ValueError, match="labels"):
        perplexity_buckets(df, labels=("a", "b"))


def test_zipf_fit_exact_line(spark):
    """A vocabulary planted exactly on freq = C/rank fits slope -1,
    intercept ln(C)."""
    import math

    from pic2vec_spark.ops.text import zipf_fit

    # freq = 24/rank at ranks 1..4 (24, 12, 8, 6): the log-log points
    # are exactly linear with slope -1 and intercept ln(24)
    words = []
    for rank, freq in ((1, 24), (2, 12), (3, 8), (4, 6)):
        words += [f"w{rank}"] * freq
    df = spark.createDataFrame([(0, " ".join(words))], "doc_id bigint, text string")
    row = zipf_fit(df).collect()[0]
    assert row["n_types"] == 4
    assert abs(row["zipf_slope"] - (-1.0)) < 1e-6
    assert abs(row["zipf_intercept"] - math.log(24.0)) < 1e-6
