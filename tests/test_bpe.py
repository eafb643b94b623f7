"""Tokenizer-training / vocabulary / batching ops (round 5).

The BPE fixture is the classic Sennrich (2016) toy corpus: merges are
hand-checked against an independent pure-Python reference implemented
inline here (the same algorithm the driver oracle embeds as literals).
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.text import (
    bpe_encode,
    bpe_train,
    curriculum_order,
    length_bucketed_batches,
    vocab_coverage,
    word_freqs,
)

CORPUS = [
    (1, "low low low low low lower lower newest newest"),
    (2, "newest newest newest newest widest widest widest new"),
    (3, "the lowest newest widest low new news"),
]


def py_bpe(texts: list[str], n_merges: int, min_freq: int = 2) -> list[tuple]:
    """Independent sequential BPE — same tie-breaks as the engine."""
    wf: Counter = Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z]+", t.lower()))
    words: dict[tuple, int] = {}
    for w, f in wf.items():
        if len(w) >= 2:
            words[tuple(w)] = words.get(tuple(w), 0) + f
    merges = []
    for rank in range(1, n_merges + 1):
        pc: Counter = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((rank, a, b, a + b, n))
        nxt: dict[tuple, int] = {}
        for syms, f in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            if len(out) >= 2:
                key = tuple(out)
                nxt[key] = nxt.get(key, 0) + f
        words = nxt
    return merges


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bpe_matches_sequential_reference(docs):
    got = [
        (r["rank"], r["pair_left"], r["pair_right"], r["merged"], r["freq"])
        for r in bpe_train(docs, n_merges=8).orderBy("rank").collect()
    ]
    want = py_bpe([t for _, t in CORPUS], 8)
    assert got == want
    # the corpus is dominated by ('e','s') inside newest/widest variants
    assert got[0][1:3] == ("e", "s")


def test_bpe_partition_invariance(docs):
    a = bpe_train(docs, n_merges=6).collect()
    b = bpe_train(docs.repartition(7), n_merges=6).collect()
    assert sorted(a) == sorted(b)


def test_bpe_min_freq_stops(docs):
    # an absurd floor stops training immediately
    assert bpe_train(docs, n_merges=5, min_freq=10**9).count() == 0


def test_bpe_overlapping_pair_left_to_right(spark):
    # 'aaa' with merge (a,a): left-to-right gives [aa, a], so the pair
    # (a,a) counts 2 per 'aaa' occurrence pre-merge and the merged word
    # survives as a 2-symbol word
    df = spark.createDataFrame([(1, "aaa aaa aab")], ["doc_id", "text"])
    got = [
        (r["pair_left"], r["pair_right"], r["freq"])
        for r in bpe_train(df, n_merges=1).collect()
    ]
    assert got == [("a", "a")] or got[0][:2] == ("a", "a")
    want = py_bpe(["aaa aaa aab"], 1)
    assert got == [(w[1], w[2], w[4]) for w in want]


def py_encode(text: str, merges: list[tuple]) -> list[str]:
    out_all = []
    for w in re.findall(r"[a-z]+", text.lower()):
        out = list(w)
        for _, a, b, _m, _n in merges:
            nxt: list[str] = []
            for x in out:
                if nxt and nxt[-1] == a and x == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(x)
            out = nxt
        out_all.extend(out)
    return out_all


def test_bpe_encode_matches_sequential_reference(docs):
    ref_merges = py_bpe([t for _, t in CORPUS], 8)
    merges = [(m[1], m[2]) for m in ref_merges]
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    for doc_id, text in CORPUS:
        assert got[doc_id] == py_encode(text, ref_merges)
    # the learned merges actually compress: fewer tokens than chars
    n_chars = sum(len(w) for _, t in CORPUS for w in re.findall(r"[a-z]+", t))
    assert sum(len(v) for v in got.values()) < n_chars


def test_bpe_encode_no_merges_is_chars(docs):
    got = bpe_encode(docs, []).limit(1).collect()[0]
    assert got["bpe_tokens"][:3] == ["l", "o", "w"]


def test_word_freqs(docs):
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    assert wf["low"] == 6 and wf["newest"] == 7 and wf["widest"] == 4


def test_vocab_coverage(docs):
    out = {
        r["doc_id"]: (r["n_tokens"], r["in_vocab_tokens"], r["oov_frac"])
        for r in vocab_coverage(docs, vocab_size=3).collect()
    }
    # top-3 vocab by (count desc, term asc): newest(7), low(6), widest(4)
    assert out[1] == (9, 7, round(1 - 7 / 9, 4))  # 2 x lower OOV
    assert out[2] == (8, 7, round(1 - 7 / 8, 4))  # 1 x new OOV
    assert out[3][0] == 7 and out[3][1] == 3


def test_curriculum_order_windows_partitioned(spark):
    rows = [
        (i, f"s{i % 2}", float(i % 5))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    out = curriculum_order(df, n_stages=4).collect()
    assert len(out) == 40
    by_key = {(r["source"], r["stage"]): [] for r in out}
    for r in out:
        by_key[(r["source"], r["stage"])].append(r)
    # per-source ntile(4) over 20 rows -> 5 per stage; rr is 1..5 dense
    for rows_ in by_key.values():
        assert sorted(r["rr"] for r in rows_) == list(range(1, 6))
    # best-quality docs land in stage 1
    best = [r for r in out if r["stage"] == 1]
    assert all(r["quality"] == 4.0 for r in best[:2]) or min(
        r["quality"] for r in best
    ) >= min(r["quality"] for r in out if r["stage"] == 4)


def test_length_bucketed_batches(spark):
    rows = [(i, "s", 10 + i) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    out = {
        r["batch_id"]: (r["n_docs"], r["max_len"], r["sum_tokens"], r["pad_frac"])
        for r in length_bucketed_batches(df, batch_size=4).collect()
    }
    # lengths 10..19 sorted -> batches [10..13], [14..17], [18..19]
    assert out[0] == (4, 13, 46, round(1 - 46 / 52, 4))
    assert out[1] == (4, 17, 62, round(1 - 62 / 68, 4))
    assert out[2] == (2, 19, 37, round(1 - 37 / 38, 4))


def test_length_bucketing_beats_natural_order(spark):
    # the point of the op: length-sorted batches waste less padding
    # than id-ordered batches on a length-skewed corpus
    import random

    rng = random.Random(7)
    lens = [rng.choice([8, 8, 8, 512]) for _ in range(64)]
    df = spark.createDataFrame(
        [(i, "s", lens[i]) for i in range(64)], ["doc_id", "source", "n_tokens"]
    )
    sorted_waste = (
        length_bucketed_batches(df, batch_size=8)
        .agg(F.sum(F.col("n_docs") * F.col("max_len") - F.col("sum_tokens")))
        .collect()[0][0]
    )
    # naive (id-ordered) waste, computed directly
    naive = 0
    for b in range(0, 64, 8):
        chunk = lens[b : b + 8]
        naive += len(chunk) * max(chunk) - sum(chunk)
    assert sorted_waste < naive
