"""Gopher-style repetition filter + cross-doc passage sharing: the
metrics are pinned on hand-computed fixtures, edge cases (short docs,
single-token docs) are exercised, and shared_ngram_stats is checked
against a brute-force Python recomputation.
"""

from __future__ import annotations

import pytest

from pic2vec_spark.ops.text import repetition_stats, shared_ngram_stats

SEP = "\x1f"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_repetition_stats_hand_fixture(spark):
    # "a b a b a" : 5 tokens, 2 distinct -> ttr 0.4
    # top token 'a' x3 -> 0.6 ; bigrams [ab, ba, ab, ba] top 2/4=0.5
    # trigrams [aba, bab, aba] distinct 2 -> dup (3-2)/3
    out = {
        r["doc_id"]: r
        for r in repetition_stats(_df(spark, [(1, "a b a b a")])).collect()
    }
    r = out[1]
    assert r["n_tokens"] == 5
    assert r["ttr"] == pytest.approx(0.4)
    assert r["top_token_frac"] == pytest.approx(0.6)
    assert r["top_bigram_frac"] == pytest.approx(0.5)
    assert r["dup_trigram_frac"] == pytest.approx(round(1 / 3, 6))
    assert r["repetition_keep"] is False  # ttr 0.4 ok, but top_bigram 0.5


def test_repetition_stats_distinct_doc_keeps(spark):
    text = " ".join(f"w{i}" for i in range(20))  # all distinct
    r = repetition_stats(_df(spark, [(1, text)])).collect()[0]
    assert r["ttr"] == pytest.approx(1.0)
    assert r["top_token_frac"] == pytest.approx(0.05)
    assert r["top_bigram_frac"] == pytest.approx(round(1 / 19, 6))
    assert r["dup_trigram_frac"] == 0.0
    assert r["repetition_keep"] is True


def test_repetition_stats_short_docs(spark):
    rows = repetition_stats(
        _df(spark, [(1, "solo"), (2, "two tokens")])
    ).collect()
    by = {r["doc_id"]: r for r in rows}
    assert by[1]["n_tokens"] == 1
    assert by[1]["top_bigram_frac"] is None  # no bigrams
    assert by[1]["dup_trigram_frac"] is None
    assert by[2]["top_bigram_frac"] == pytest.approx(1.0)
    assert by[2]["dup_trigram_frac"] is None  # no trigrams


def test_shared_ngrams_hand_fixture(spark):
    # docs 1 and 2 share the passage "p q r s"; doc 3 is disjoint;
    # doc 4 is too short for 4-grams.
    df = _df(
        spark,
        [
            (1, "a b p q r s c d"),
            (2, "x p q r s y z w"),
            (3, "m n o u v e f g"),
            (4, "t u v"),
        ],
    )
    out = {r["doc_id"]: r for r in shared_ngram_stats(df, n=4).collect()}
    assert out[1]["n_grams"] == 5 and out[2]["n_grams"] == 5
    assert out[1]["n_shared"] == 1  # only "p q r s"
    assert out[2]["n_shared"] == 1
    assert out[1]["shared_frac"] == pytest.approx(0.2)
    assert out[3]["n_shared"] == 0
    assert out[4]["n_grams"] == 0
    assert out[4]["shared_frac"] is None


def test_shared_ngrams_matches_bruteforce(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    n = 5
    pdf = docs.select("doc_id", "text").toPandas()
    grams = {
        int(r.doc_id): {
            SEP.join(toks[i : i + n])
            for i in range(len(toks) - n + 1)
        }
        for r in pdf.itertuples()
        for toks in [r.text.strip().split()]
    }
    counts: dict[str, int] = {}
    for gs in grams.values():
        for g in gs:
            counts[g] = counts.get(g, 0) + 1
    out = shared_ngram_stats(docs, n=n).collect()
    assert len(out) == len(grams)
    for r in out:
        gs = grams[r["doc_id"]]
        want_shared = sum(1 for g in gs if counts[g] >= 2)
        assert r["n_grams"] == len(gs)
        assert r["n_shared"] == want_shared


def test_repetition_stats_is_narrow(spark, sf_smoke):
    """Zero-exchange plan: the filter must scan-project only."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_contamination_stats_hand_fixture(spark):
    from pic2vec_spark.ops.text import contamination_stats

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id bigint, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 4-gram "quick brown fox jumps"
            (1, "she saw the quick brown fox jumps right past"),
            # no benchmark 4-gram
            (2, "a completely different sentence with no overlap at all"),
            # shorter than n tokens
            (3, "too short"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in contamination_stats(corpus, bench, n=4).collect()
    }
    # doc 1: 9 tokens -> 6 distinct 4-grams; exactly 2 leak ("the quick
    # brown fox" and "quick brown fox jumps")
    assert got[1]["n_grams"] == 6 and got[1]["n_contaminated"] == 2
    assert got[1]["contaminated_frac"] == pytest.approx(2 / 6, abs=1e-6)
    assert got[1]["contaminated"] is True
    assert got[2]["n_contaminated"] == 0 and got[2]["contaminated"] is False
    assert got[3]["n_grams"] == 0
    assert got[3]["contaminated_frac"] is None
    assert got[3]["contaminated"] is False
    # threshold above doc 1's fraction unflags it
    relaxed = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_stats(corpus, bench, n=4, threshold=0.5).collect()
    }
    assert relaxed == {1: False, 2: False, 3: False}


def test_scrub_pii_hand_fixture(spark):
    from pic2vec_spark.ops.text import scrub_pii

    rows = [
        (1, "mail a.b+c@test.org now"),
        (2, "call +1 (415) 555-0199 or 555 123 4567"),
        (3, "host 10.0.0.1 ssn 123-45-6789"),
        (4, "clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[1]["text_clean"] == "mail <EMAIL> now"
    assert got[1]["pii_email"] == 1 and got[1]["pii_total"] == 1
    assert "<PHONE>" in got[2]["text_clean"] and got[2]["pii_phone"] == 2
    # SSN wins over the looser phone shape in the TEXT (declaration
    # order), while counts overlap by design
    assert "<SSN>" in got[3]["text_clean"] and "<IPV4>" in got[3]["text_clean"]
    assert got[3]["pii_ssn"] == 1 and got[3]["pii_ipv4"] == 1
    assert got[4]["text_clean"] == "clean text" and got[4]["pii_total"] == 0
    with pytest.raises(ValueError):
        scrub_pii(df, kinds=["email", "nope"])


def test_strip_boilerplate_hand_fixture(spark):
    from pic2vec_spark.ops.text import strip_boilerplate

    banner = "COOKIE BANNER"
    rows = [(i, f"{banner}\nbody {i}\n\nunique tail {i}") for i in range(8)]
    rows.append((99, "no banner here"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # banner appears in 8/9 docs > ceil-free cut floor(9*0.2)=1
    out = {r["doc_id"]: r for r in strip_boilerplate(df, max_doc_frac=0.2).collect()}
    assert out[0]["text_clean"] == "body 0\n\nunique tail 0"  # order + blank kept
    assert out[0]["n_stripped"] == 1 and out[0]["n_lines"] == 3
    assert out[99]["text_clean"] == "no banner here"
    assert out[99]["n_stripped"] == 0
    with pytest.raises(ValueError):
        strip_boilerplate(df, max_doc_frac=0.0)


def test_gopher_rules_hand_fixture(spark):
    """Each Gopher rule trips on a purpose-built doc; a clean 60-word
    English-ish doc passes all seven."""
    from pic2vec_spark.ops.text import gopher_quality_flags

    good = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"]
        + [f"word{i}" for i in range(52)]
    )  # 60 words, all alpha, 8 stopwords
    bullets = "\n".join(["- item one", "* item two", "• item three"])
    symbols = " ".join(["#tag"] * 10)  # 10 words, 10 '#' -> ratio 1.0
    numeric = " ".join(str(i) for i in range(60))  # no alpha words
    ellipsis = "so it goes...\nand on...\nmore...\nplain line"
    rows = [
        (1, good),
        (2, "too short"),
        (3, bullets),
        (4, symbols),
        (5, numeric),
        (6, ellipsis),
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    g = out[1]
    assert g["n_words"] == 60 and g["gopher_keep"]
    assert all(
        g[f] for f in (
            "rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
            "rule_bullet", "rule_ellipsis", "rule_alpha", "rule_stopwords",
        )
    )
    assert not out[2]["rule_word_count"]
    assert out[3]["bullet_frac"] == 1.0 and not out[3]["rule_bullet"]
    assert out[4]["symbol_ratio"] == 1.0 and not out[4]["rule_symbol_ratio"]
    assert out[5]["alpha_frac"] == 0.0 and not out[5]["rule_alpha"]
    assert out[6]["ellipsis_frac"] == 0.75 and not out[6]["rule_ellipsis"]
    # every flag is a defined boolean on every row (no NULL three-value traps)
    for r in out.values():
        assert r["gopher_keep"] in (True, False)
