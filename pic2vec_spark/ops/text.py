"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

All are single-pass narrow projections (no shuffle, no UDF — pure
Catalyst expressions, whole-stage codegen), so they scale linearly and
are SQL-checkable against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# marker stopwords for the language-ID heuristic (English function words)
EN_MARKERS = ("the", "a", "and", "of", "to", "in", "is", "for")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + distinct-token count + BPE-ish subword
    estimate (word-boundary regex pieces: runs of letters, digits, or a
    single non-alnum char — a cheap stand-in for byte-pair tokenizers)."""
    toks = tokens(F.col(text_col))
    bpe_ish = F.regexp_extract_all(
        F.col(text_col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1
    )
    return df.withColumns(
        {
            "n_tokens": F.size(toks).cast("bigint"),
            "n_distinct_tokens": F.size(F.array_distinct(toks)).cast("bigint"),
            "n_subwords": F.size(bpe_ish).cast("bigint"),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + a composite score:
    length, mean token length, stopword ratio, punctuation ratio.
    Deterministic closed forms (rounded to 4) so the DuckDB oracle can
    recompute them exactly."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    mean_tok_len = (n_chars - n_tok + 1) / n_tok  # chars excl. separators
    stop_ratio = stop / n_tok
    punct_ratio = punct / n_chars
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * 0.2
    )
    return df.withColumns(
        {
            "n_tokens": n_tok.cast("bigint"),
            "stop_ratio": F.round(stop_ratio, 4),
            "punct_ratio": F.round(punct_ratio, 4),
            "mean_tok_len": F.round(mean_tok_len, 4),
            "quality": F.round(score, 4),
        }
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword language-ID heuristic: English marker-token
    frequency decides 'en' vs 'other'.  (The synthetic corpus is drawn
    from an English-ish vocabulary, so the interesting part is the
    operator shape: pure-expression scoring at scan time.)"""
    toks = tokens(F.col(text_col))
    en = F.size(F.filter(toks, lambda t: t.isin(*EN_MARKERS)))
    ratio = en / F.size(toks)
    return df.withColumns(
        {
            "en_marker_ratio": F.round(ratio, 4),
            "lang_pred": F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")),
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup key)
    and a 60-bit integer prefix of it (join-friendly rolling-hash
    stand-in; the reference has no text ops at all — these serve the
    dedup layer)."""
    norm = F.lower(F.trim(F.col(text_col)))
    digest = F.md5(norm)
    return df.withColumns(
        {
            "fp_md5": digest,
            "fp_int": F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint"),
        }
    )


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf-idf — the classic corpus-level
    text feature (the reference has no text ops; this serves training
    pipelines: keyword extraction, topic-ish clustering keys).

    - term extraction: ``[a-z]+`` runs of the lowercased text (identical
      regex in the DuckDB oracle);
    - tf = in-document term count (one groupBy(doc, term) shuffle on
      exploded terms — map-side combined);
    - idf = ln(N / df) with df = number of docs containing the term
      (a second agg over (doc, term) pairs, one row per TERM — the
      vocabulary — which is then a broadcast-sized join side at any
      corpus scale);
    - score = round(tf * idf, 6); top-k per doc by (score desc, term
      asc) via row_number (WindowGroupLimit prunes map-side).

    Output: (id, term, tf, score, rk).
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1
            )
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    scored = tf.join(F.broadcast(idf.select("term", "idf")), "term").withColumn(
        "score", F.round(F.col("tf") * F.col("idf"), 6)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "score", "rk")
    )


def pack_documents(
    df: DataFrame,
    seq_len: int,
    source_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing for LLM pretraining: concatenate each source's
    documents in ``order_col`` order and cut the token stream into
    fixed ``seq_len`` training sequences (GPT-style concatenation
    packing — no padding except the stream tail).  Emits, per document,
    the sequence its FIRST token lands in and the offset within it:

        (.., n_tokens, seq_id, seq_offset)

    so the actual tensor assembly (a narrow downstream mapInPandas over
    rows grouped by seq_id) knows exactly where every document starts.
    Deterministic and engine-portable: one running-sum window per
    source (a single shuffle on the source key); the cumulative sum is
    exact integer arithmetic, so a SQL oracle reproduces the packing
    bit-for-bit.  At 10^12 docs the stream order inside one source is a
    real sort — shard sources (e.g. source x date) to bound per-group
    history, exactly like the as-of compaction note."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    n_tok = F.size(tokens(F.col(text_col))).cast("bigint")
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "__start", F.sum("n_tokens").over(w) - F.col("n_tokens")
        )
        .withColumn("seq_id", F.floor(F.col("__start") / F.lit(seq_len)))
        .withColumn("seq_offset", F.col("__start") % F.lit(seq_len))
        .drop("__start")
    )


def top_bigrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Corpus-wide top-k bigrams: adjacent ``[a-z]+`` term pairs within
    each document of the lowercased text (same term regex as
    ``tf_idf_top_terms``, so the two ops share vocabulary semantics).

    Plan: posexplode terms (narrow) -> per-document window lag on the
    term position to form pairs (one doc-keyed shuffle; a document's
    terms fit a partition by construction — docs are bounded, unlike
    entities) -> global grouped count (map-side combined; at most
    |vocab|² groups, in practice Zipf-bounded) -> deterministic top-k by
    (n desc, bigram asc).  The final top-k is a single-partition sort of
    the *aggregated* bigram table, not of the corpus.

    Output: (bigram, n, rk), rk 1..k.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1
            )
        ).alias("pos", "term"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    pairs = (
        terms.withColumn("prev", F.lag("term").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.concat_ws(" ", "prev", "term").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wk = Window.orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= k)
        .select("bigram", "n", "rk")
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    pad: int = 6,
) -> DataFrame:
    """Token -> postings-list index over the corpus: for every ``[a-z]+``
    term appearing in at least ``min_df`` documents, the document
    frequency and the sorted postings list (doc ids zero-padded to
    ``pad`` digits and comma-joined, so the list is a deterministic,
    engine-neutral string — lexicographic == numeric order under
    padding).

    Plan: explode terms -> DISTINCT (term, doc) — the one corpus-sized
    shuffle — -> groupBy(term) with sort_array(collect_list(...)).
    Postings per term are bounded by document frequency; for stop-word
    scale terms at 100 TB the min_df gate keeps them, so callers shard
    hot terms by a doc-hash prefix if full stop-word postings are ever
    needed (documented, not silently truncated).

    Output: (term, df, postings).
    """
    pairs = (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1
                )
            ).alias("term"),
        )
        .select("term", F.lpad(F.col(id_col).cast("string"), pad, "0").alias("doc"))
        .distinct()
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc")), ",").alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


# --------------------------------------------------------------------------
# repetition filters (Gopher-style) + cross-document passage sharing
# --------------------------------------------------------------------------

# \x1f joiner for n-gram keys: cannot appear in whitespace-split tokens,
# so joined n-grams collide iff the token sequences are identical.
_GRAM_SEP = 31

# keep-thresholds for repetition_stats (Gopher-style rule-of-thumb
# values re-tuned to the synthetic corpus so the flag actually splits
# it: sf0.01 medians are ttr 0.46 / top-bigram 0.033 / dup-trigram 0.0)
REPETITION_MIN_TTR = 0.35
REPETITION_MAX_TOP_BIGRAM = 0.10
REPETITION_MAX_DUP_TRIGRAM = 0.05


def _ngram_expr(toks: str, n: int) -> str:
    """SQL expr: array of chr(31)-joined token ``n``-grams of ``toks``
    (an array<string> column/expr).  Empty when size(toks) < n."""
    parts = ["x"] + [
        f"element_at({toks}, i + {j + 1})" for j in range(1, n)
    ]
    joined = f", chr({_GRAM_SEP}), ".join(parts)
    return (
        f"transform(slice({toks}, 1, greatest(size({toks}) - {n - 1}, 0)), "
        f"(x, i) -> concat({joined}))"
    )


def _max_multiplicity_expr(arr: str) -> str:
    """SQL expr: the count of the most frequent element of ``arr``
    (bigint; 0 for an empty array).  O(n log n) per row — sort, then a
    single fold tracking the current and max run length — so the whole
    computation stays a narrow per-row projection (no explode, no
    shuffle), which is what lets repetition_stats scan 100 TB as a
    zero-exchange map."""
    return f"""aggregate(
        array_sort({arr}),
        named_struct('prev', cast(null as string),
                     'run', cast(0 as bigint), 'mx', cast(0 as bigint)),
        (acc, x) -> named_struct(
            'prev', x,
            'run', if(acc.prev is not null and x = acc.prev,
                      acc.run + cast(1 as bigint), cast(1 as bigint)),
            'mx', greatest(acc.mx,
                           if(acc.prev is not null and x = acc.prev,
                              acc.run + cast(1 as bigint),
                              cast(1 as bigint)))),
        acc -> acc.mx)"""


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition metrics + keep flag.

    Per document: token count, type-token ratio, most-frequent-token
    fraction, most-frequent-bigram fraction, duplicate-trigram fraction
    (1 - distinct/total), and ``repetition_keep`` from the module
    thresholds.  The corpus has no newlines, so the line-based Gopher
    rules (duplicate-line fraction etc.) are re-expressed on token
    n-grams — the discriminating signal is the same (templated/looping
    text shows up as low TTR and high top-n-gram mass).

    Scale: pure Catalyst narrow projection — per-row array ops only,
    zero shuffle, zero UDF; fractions are ROUND(exact_int / exact_int, 6)
    so the DuckDB oracle reproduces them bit-for-bit.  Per-row cost is
    O(len log len); for 100k-token outliers the arrays stay executor-
    local (no row explosion into the shuffle).
    """
    out = df.withColumn("_toks", tokens(F.col(text_col)))
    out = out.withColumns(
        {
            "_bi": F.expr(_ngram_expr("_toks", 2)),
            "_tri": F.expr(_ngram_expr("_toks", 3)),
        }
    )
    n = F.size("_toks").cast("bigint")
    n_bi = F.size("_bi").cast("bigint")
    n_tri = F.size("_tri").cast("bigint")
    ttr = F.round(F.size(F.array_distinct("_toks")) / n, 6)
    top_tok = F.round(F.expr(_max_multiplicity_expr("_toks")) / n, 6)
    top_bi = F.when(
        n_bi > 0, F.round(F.expr(_max_multiplicity_expr("_bi")) / n_bi, 6)
    )
    dup_tri = F.when(
        n_tri > 0,
        F.round(
            (n_tri - F.size(F.array_distinct("_tri"))) / n_tri, 6
        ),
    )
    return (
        out.withColumns(
            {
                "n_tokens": n,
                "ttr": ttr,
                "top_token_frac": top_tok,
                "top_bigram_frac": top_bi,
                "dup_trigram_frac": dup_tri,
            }
        )
        .withColumn(
            # short docs (<2 tokens: no bigrams; <3: no trigrams) have
            # NULL n-gram fractions; a missing check PASSES (such a doc
            # cannot be n-gram-repetitive), so keep is always a defined
            # boolean — filter(keep) / filter(~keep) never silently drop
            # short docs to three-valued NULL logic
            "repetition_keep",
            (F.col("ttr") >= REPETITION_MIN_TTR)
            & F.coalesce(
                F.col("top_bigram_frac") <= REPETITION_MAX_TOP_BIGRAM,
                F.lit(True),
            )
            & F.coalesce(
                F.col("dup_trigram_frac") <= REPETITION_MAX_DUP_TRIGRAM,
                F.lit(True),
            ),
        )
        .drop("_toks", "_bi", "_tri")
    )


def shared_ngram_stats(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document passage sharing (exact-substring dedup signal, the
    token-n-gram form of Lee et al. 2021's dedup criterion): per
    document, how many of its DISTINCT token ``n``-grams also appear in
    at least one OTHER document, and the shared fraction.

    Plan: narrow n-gram projection -> explode DISTINCT (doc, gram) ->
    gram-count aggregation (map-side partials; the gram key space is
    content-bounded) -> rejoin pair rows to gram counts -> per-doc
    re-aggregation.  Two key shuffles (gram, then doc) — both on
    bounded-cardinality keys; a gram shared by M docs contributes M
    pair rows, so pathological template grams are the skew case and the
    ``n`` parameter is the mitigation (longer grams -> rarer).

    Output: (id_col, n_grams, n_shared, shared_frac) — docs shorter
    than ``n`` tokens report 0 grams and NULL fraction.
    """
    grams = (
        df.withColumn("_t", tokens(F.col(text_col)))
        .select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(F.expr(_ngram_expr("_t", n)))
            ).alias("gram"),
        )
    )
    gram_docs = grams.filter(F.col("gram").isNotNull()).groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    joined = grams.join(gram_docs, "gram", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.col("gram")).alias("n_grams"),
        F.sum(
            F.when(F.col("n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_shared"),
        F.round(
            F.when(
                F.count(F.col("gram")) > 0,
                F.sum(
                    F.when(F.col("n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
                )
                / F.count(F.col("gram")),
            ),
            6,
        ).alias("shared_frac"),
    )


def hashed_tf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1024,
    salt: str = "htf",
) -> DataFrame:
    """Signed feature hashing (the hashing-trick vectorizer): each
    token maps to ``idx = md5_bucket(token) in [0, n_features)`` with a
    sign from an independent md5 bit, and a document's sparse vector is
    the per-(doc, idx) sum of signs — Weinberger et al.'s unbiased
    estimator, so colliding tokens cancel in expectation instead of
    stacking.  Output: (id_col, feature_idx, weight), zero-weight
    (fully canceled) entries dropped — the sparse representation.

    Deterministic across runs/engines/partitionings (portable md5
    arithmetic, ops/sampling._hash_bucket family).  Plan: explode →
    partial-aggregated groupBy(doc, idx); the shuffle carries at most
    min(tokens, docs x n_features) rows.  Vocabulary state: NONE — that
    is the point of the hashing trick at 10^12-token scale (no fit
    pass, no vocab broadcast, append-stable)."""
    from pic2vec_spark.ops.sampling import _hash_bucket

    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    tok = F.col("__tok")
    sign_h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "-sgn"), tok)), 1, 8), 16, 10
    ).cast("bigint")
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok"))
        .filter(F.length(tok) > 0)
        .select(
            id_col,
            _hash_bucket(tok, salt, n_features).alias("feature_idx"),
            (F.lit(1) - F.lit(2) * (sign_h % 2)).cast("bigint").alias("__sgn"),
        )
        .groupBy(id_col, "feature_idx")
        .agg(F.sum("__sgn").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram model — the CCNet-style fluency screen: documents
    of rare/garbled tokens score far below prose, no external LM needed.

    ``lp(w) = ln(count(w) / total_tokens)`` is rounded to 6 decimals
    per TOKEN and summed as DECIMAL(18,8) so the per-doc sum is exact
    integer arithmetic — summation order cannot change the result
    across partitionings or engines (the repo's order-proof-sum
    pattern); the mean divides once at the end.  Output: (id_col,
    n_tokens, avg_logprob).

    Plan: one token-count aggregation (vocabulary-sized), rejoined to
    the exploded tokens (AQE broadcasts real-language vocabularies),
    then one per-doc aggregation.  Empty-after-trim documents drop out
    (no tokens to score)."""
    ex = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok"))
        .filter(F.length("__tok") > 0)
    )
    vocab = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("__cnt"))
    totals = vocab.agg(F.sum("__cnt").alias("__tot"))
    lp = (
        ex.join(vocab, "__tok")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            F.round(F.log(F.col("__cnt") / F.col("__tot")), 6)
            .cast("decimal(18,8)")
            .alias("__lp"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            F.sum("__lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
    )


def contamination_stats(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Benchmark decontamination screen (the GPT-3 appendix-C /
    Brown et al. 2020 procedure): per TRAINING document, how many of
    its distinct token ``n``-grams appear anywhere in the ``benchmark``
    frame — eval-set text that leaked into the corpus inflates
    benchmark scores unless these docs are flagged and dropped.

    Output: (id_col, n_grams, n_contaminated, contaminated_frac,
    contaminated) — ``contaminated`` is frac > threshold (default:
    any overlap flags).  Docs shorter than ``n`` tokens report 0 grams,
    NULL fraction, and false.

    Plan: both sides reduce to distinct-gram projections; the benchmark
    side is aggregated FIRST (distinct grams of an eval set are tiny
    relative to a corpus — AQE broadcasts them), then a left join marks
    each (doc, gram) pair and one per-doc aggregation finishes.  The
    corpus side shuffles once on gram only if the benchmark set exceeds
    broadcast size; corpus text itself never moves twice."""
    def _grams(frame: DataFrame, cols: list[str]):
        return (
            frame.withColumn("_t", tokens(F.col(text_col)))
            .select(
                *cols,
                F.explode_outer(
                    F.array_distinct(F.expr(_ngram_expr("_t", n)))
                ).alias("gram"),
            )
        )

    bench = (
        _grams(benchmark, [])
        .filter(F.col("gram").isNotNull())
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    marked = _grams(df, [id_col]).join(bench, "gram", "left")
    hit = F.sum(F.when(F.col("__hit") == 1, 1).otherwise(0))
    return marked.groupBy(id_col).agg(
        F.count(F.col("gram")).alias("n_grams"),
        hit.cast("bigint").alias("n_contaminated"),
        F.round(
            F.when(F.count(F.col("gram")) > 0, hit / F.count(F.col("gram"))),
            6,
        ).alias("contaminated_frac"),
        F.coalesce(
            F.when(F.count(F.col("gram")) > 0, hit / F.count(F.col("gram")))
            > threshold,
            F.lit(False),
        ).alias("contaminated"),
    )


# PII patterns: deliberately conservative, ASCII-focused (engine-portable
# regex subset — no lookbehind, which DuckDB's RE2 rejects)
PII_PATTERNS = {
    # declaration order IS replacement order: ssn before phone, because
    # an SSN also matches the looser phone shape
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    kinds: list[str] | None = None,
) -> DataFrame:
    """PII redaction pass: emails, phone numbers, IPv4s, and SSN-shaped
    strings replaced with ``<KIND>`` tokens, plus per-kind match counts
    — the scrub a corpus takes before leaving the ingest boundary.
    Pattern-based (high recall on structured PII; names/addresses need
    NER and are out of scope — stated, not implied).

    Pure narrow projection: K regexp_replace + K regexp_count per row,
    no shuffle, whole-stage codegen; patterns avoid lookbehind so the
    DuckDB oracle runs the identical regex dialect.  Output: out_col
    (default ``{text_col}_clean``) + ``pii_{kind}`` counts + ``pii_total``.
    Counts are per-pattern over the ORIGINAL text and may overlap (an
    SSN also matches the phone shape); replacement applies in
    declaration order, so the more specific token wins in the text.
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {list(PII_PATTERNS)}")
    out_col = out_col or f"{text_col}_clean"
    cleaned = F.col(text_col)
    counts = {}
    for k in kinds:
        pat = PII_PATTERNS[k]
        counts[f"pii_{k}"] = F.regexp_count(F.col(text_col), F.lit(pat)).cast(
            "bigint"
        )
        cleaned = F.regexp_replace(cleaned, pat, f"<{k.upper()}>")
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.withColumns({**counts, "pii_total": total, out_col: cleaned})


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_frac: float = 0.05,
    min_line_chars: int = 1,
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/RefinedWeb step): a
    LINE that appears verbatim in more than ``max_doc_frac`` of all
    documents is template chrome (nav bars, cookie banners, footers) —
    strip it from every document, preserving the order of surviving
    lines.  Lines shorter than ``min_line_chars`` after trim are kept
    (blank separators are structure, not boilerplate).

    Plan: posexplode lines -> distinct (line, doc) -> line-frequency
    aggregation (content-bounded key space, map-side partials) -> AQE
    broadcast of the boilerplate set (lines above the cut are FEW — the
    whole point) -> order-preserving rebuild via sorted collect_list.
    Two bounded shuffles; the rebuild groups each doc's own lines, so
    per-doc memory is the document itself.  Output: id_col, out text
    (``{text_col}_clean``), n_lines, n_stripped."""
    if not 0.0 < max_doc_frac <= 1.0:
        raise ValueError(f"max_doc_frac must be in (0, 1], got {max_doc_frac}")
    n_docs = df.filter(F.col(text_col).isNotNull()).count()
    cut = max(1, int(n_docs * max_doc_frac))
    lines = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            id_col,
            F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
        )
    )
    eligible = F.length(F.trim(F.col("line"))) >= min_line_chars
    freq = (
        lines.filter(eligible)
        .select(id_col, "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .filter(F.col("__docs") > cut)
        .select("line", F.lit(True).alias("__boiler"))
    )
    marked = lines.join(freq, "line", "left")
    kept = marked.filter(F.col("__boiler").isNull())
    return (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
            ).alias(f"{text_col}_clean"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .join(
            marked.groupBy(id_col).agg(
                F.sum(F.col("__boiler").isNotNull().cast("bigint")).alias(
                    "n_stripped"
                )
            ),
            id_col,
        )
    )


# Gopher rule thresholds (Rae et al. 2021, arXiv:2112.11446, App. A1.1)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2
# Gopher's own stop list ("the, be, to, of, and, that, have, with")
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-rules document filter (Rae et al. 2021): the standard
    heuristic pre-filter of LLM training pipelines, one defined boolean
    per rule plus the conjunction ``gopher_keep``.

    Rules (thresholds above): word count in [50, 100k]; mean word
    length in [3, 10]; symbol-to-word ratio (# and ...) <= 0.1;
    bullet-started lines <= 90%; ellipsis-ended lines <= 30%; >= 80% of
    words contain an alphabetic char; >= 2 distinct Gopher stopwords.

    Shape: a single narrow projection — every metric is a Catalyst
    expression over the row's own text (whole-stage codegen, no UDF, no
    shuffle), so the filter runs at scan speed and pushes through to
    any downstream sample/dedup stage.  All fractions are ROUND(,4)
    closed forms so the DuckDB oracle reproduces them bit-for-bit;
    every flag is a TOTAL boolean (single-token and single-line docs
    divide by n >= 1 — whitespace-split of a trimmed string never
    yields an empty array)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    lines = F.split(F.col(text_col), r"\n")
    n_lines = F.size(lines)
    mean_wl = F.round(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n,
        4,
    )
    n_symbols = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"(#|\.\.\.)"), 1)
    )
    n_bullets = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    n_ellipsis_end = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    n_stops = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(s) for s in GOPHER_STOPS]),
        )
    )
    out = df.withColumns(
        {
            "n_words": n.cast("bigint"),
            "mean_word_len": mean_wl,
            "symbol_ratio": F.round(n_symbols / n, 4),
            "bullet_frac": F.round(n_bullets / n_lines, 4),
            "ellipsis_frac": F.round(n_ellipsis_end / n_lines, 4),
            "alpha_frac": F.round(n_alpha / n, 4),
            "n_stopwords": n_stops.cast("bigint"),
        }
    )
    flags = {
        "rule_word_count": F.col("n_words").between(
            GOPHER_MIN_WORDS, GOPHER_MAX_WORDS
        ),
        "rule_mean_word_len": F.col("mean_word_len").between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        ),
        "rule_symbol_ratio": F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO,
        "rule_bullet": F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRAC,
        "rule_ellipsis": F.col("ellipsis_frac") <= GOPHER_MAX_ELLIPSIS_FRAC,
        "rule_alpha": F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC,
        "rule_stopwords": F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS,
    }
    out = out.withColumns(flags)
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


# --------------------------------------------------------------------------
# tokenizer training + vocabulary / batching ops (round 5)
# --------------------------------------------------------------------------


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table over lowercase alpha runs — the
    working set for tokenizer training.  One shuffle (groupBy word);
    output size = |distinct words|, far smaller than the corpus."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent symbol
    pair (a, b) with a+b — the classic BPE merge — as a Catalyst fold
    (higher-order ``aggregate``), so it runs JVM-side with no UDF."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_freq: int = 2,
) -> DataFrame:
    """Learn byte-pair-encoding merges over the corpus (Sennrich 2016),
    distributed: the iterative state is the *word-frequency* table
    (|distinct words| rows — orders of magnitude smaller than the
    corpus), so each merge round is one small shuffle (pair groupBy)
    plus a 1-row argmax collect, the same driver-loop shape as k-means.
    Ties break deterministically on (count DESC, left ASC, right ASC).

    Scale notes: the word table is localCheckpointed every round to truncate
    lineage (fold expressions would otherwise nest); fully-merged
    single-symbol words are dropped from the working set (they can
    never participate in a pair again).  Returns the merge table
    (rank, pair_left, pair_right, merged, freq) — bounded by n_merges.
    """
    spark = df.sparkSession
    words = (
        word_freqs(df, text_col)
        .withColumn("syms", F.split(F.col("word"), ""))
        .select("syms", "freq")
        .where(F.size("syms") >= 2)
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        pair = (
            words.select(
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.size("syms") - 1).alias("a"),
                        F.slice("syms", 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pair or pair[0]["n"] < min_freq:
            break
        a, b, n = pair[0]["a"], pair[0]["b"], int(pair[0]["n"])
        merges.append((rank, a, b, a + b, n))
        words = (
            words.withColumn("syms", _apply_merge(F.col("syms"), a, b))
            .where(F.size("syms") >= 2)
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame(
        merges,
        schema="rank bigint, pair_left string, pair_right string, "
        "merged string, freq bigint",
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-V
    vocabulary.  Two passes over the token stream: (1) build the
    vocabulary (groupBy term + deterministic top-V on count DESC, term
    ASC — expressed as orderBy().limit(V), which Catalyst plans as
    TakeOrderedAndProject: per-partition top-V merged on the driver,
    NEVER a single-partition global sort over the distinct-term table),
    (2) re-scan with the vocabulary *broadcast* (bounded at vocab_size
    rows) — no second corpus-sized shuffle.  Documents with zero alpha
    tokens drop out (0/0 is undefined)."""
    toks = df.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1)
        ).alias("term"),
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0)))
            .cast("bigint")
            .alias("in_vocab_tokens"),
        )
        .withColumn(
            "oov_frac",
            F.round(
                F.lit(1.0) - F.col("in_vocab_tokens") / F.col("n_tokens"), 4
            ),
        )
    )


def curriculum_order(
    df: DataFrame,
    quality_col: str = "quality",
    source_col: str = "source",
    id_col: str = "doc_id",
    n_stages: int = 10,
) -> DataFrame:
    """Source-interleaved curriculum schedule: per SOURCE, rank docs by
    quality (DESC, id ASC tiebreak) and cut into n_stages equal stages
    (ntile), then a round-robin rank within (stage, source).  The
    training order is the sort key (stage, rr, source, id) — emitted as
    columns rather than materialized as one global row_number, so every
    window is partitioned (by source, then by stage×source) and the op
    needs no single-partition global sort at 100 TB; consumers ORDER BY
    the key or assign positions per shard."""
    w_src = Window.partitionBy(source_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    staged = df.withColumn("stage", F.ntile(n_stages).over(w_src))
    w_rr = Window.partitionBy("stage", source_col).orderBy(
        F.desc(quality_col), F.asc(id_col)
    )
    return staged.withColumn("rr", F.row_number().over(w_rr))


def length_bucketed_batches(
    df: DataFrame,
    len_col: str = "n_tokens",
    group_col: str = "source",
    id_col: str = "doc_id",
    batch_size: int = 32,
) -> DataFrame:
    """Length-bucketed dynamic batching: within each group (shard),
    sort docs by token length and cut into fixed-size batches, then
    report per-batch padding waste (docs padded to the batch max).
    Sorting by length before batching is the standard trick that
    minimizes pad_frac; all windows are partitioned by the group column
    so no global sort exists at scale."""
    w = Window.partitionBy(group_col).orderBy(F.asc(len_col), F.asc(id_col))
    batched = df.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(batch_size)),
    )
    return (
        batched.groupBy(group_col, "batch_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.max(len_col).cast("bigint").alias("max_len"),
            F.sum(len_col).cast("bigint").alias("sum_tokens"),
        )
        .withColumn(
            "pad_frac",
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens") / (F.col("n_docs") * F.col("max_len")),
                4,
            ),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply learned BPE merges to the corpus: lowercase alpha-run
    words → character symbols → each merge applied in rank order
    (left-to-right non-overlapping, the same semantics bpe_train
    counted with) → per-document flattened token stream.

    The merge list is DRIVER-SIDE data bounded by n_merges (tens of
    rows — collect it from bpe_train's output); it is folded into the
    plan as literals, so encoding is a ZERO-SHUFFLE narrow projection
    over the corpus: per-row cost is O(tokens × merges), JVM-side
    (nested Catalyst ``aggregate`` folds — no Python UDF), and the
    stage scales linearly to any corpus size.  Keep n_merges modest
    (≲64): each merge adds one fold level to the expression tree.
    """
    words = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"([a-z]+)"), 1
    )

    def encode_word(w: Column) -> Column:
        syms = F.split(w, "")
        for a, b in merges:
            syms = _apply_merge(syms, a, b)
        return syms

    return df.withColumn(
        out_col, F.flatten(F.transform(words, encode_word))
    )


# --------------------------------------------------------------------------
# bigram LM perplexity + CCNet-style quality buckets (round 5)
# --------------------------------------------------------------------------


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
) -> DataFrame:
    """Per-document mean bigram log-probability and perplexity under
    the corpus's own add-k-smoothed bigram model — the CCNet-style LM
    fluency screen one order above :func:`unigram_logprob`:

        lp(w2 | w1) = ln( (c(w1,w2) + k) / (ctx(w1) + k·V) )

    with ``ctx(w1) = Σ_w2 c(w1,w2)`` (bigram-left occurrences) and
    ``V`` the corpus vocabulary size.  Garbled / boilerplate text hits
    unseen-transition smoothing constantly and scores far below prose;
    no external LM is needed.

    Per-bigram lp is rounded to 6 decimals and summed as
    DECIMAL(18,8) — the repo's order-proof-sum pattern — so the
    per-doc mean is independent of partitioning and engine; perplexity
    is ``exp(-avg_logprob)`` of that exact mean.

    Plan: one corpus scan builds the exploded (doc, w1, w2) frame,
    localCheckpointed because it feeds BOTH the count aggregation and
    the per-doc re-join (otherwise Catalyst re-scans the corpus per
    branch — the heavy_hitters_cms lesson); the context table derives
    from the bigram-count table (vocabulary-sized, no second corpus
    pass), and V is a 1-row distinct-count aggregate broadcast back.
    The count tables are |distinct bigrams| ≪ corpus, so the re-join
    broadcasts under AQE for real-language vocabularies.  Documents
    with fewer than two non-empty tokens drop out (no transition to
    score)."""
    toks = tokens(F.col(text_col))
    bg = (
        df.select(
            F.col(id_col),
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, F.size(toks) - 1).alias("w1"),
                    F.slice(toks, 2, F.size(toks) - 1).alias("w2"),
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .where((F.length("w1") > 0) & (F.length("w2") > 0))
        .localCheckpoint(eager=False)
    )
    # cnt feeds BOTH the broadcast join and ctx: checkpoint it so the
    # corpus-sized pair shuffle runs once (the heavy_hitters_cms lesson
    # — Catalyst does not reuse the exchange across the two branches).
    cnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    ctx = cnt.groupBy("w1").agg(F.sum("__c").alias("__ctx"))
    vocab_size = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__tok"))
        .where(F.length("__tok") > 0)
        .agg(F.count_distinct("__tok").alias("__v"))
    )
    lp = (
        bg.join(cnt, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab_size))
        .select(
            id_col,
            F.round(
                F.log(
                    (F.col("__c") + F.lit(float(k)))
                    / (F.col("__ctx") + F.lit(float(k)) * F.col("__v"))
                ),
                6,
            )
            .cast("decimal(18,8)")
            .alias("__lp"),
        )
    )
    out = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum("__lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
    )
    return out.withColumn("ppl", F.round(F.exp(-F.col("avg_logprob")), 6))


def perplexity_buckets(
    df: DataFrame,
    ppl_col: str = "ppl",
    fracs: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style quality split: bucket documents by corpus
    perplexity quantiles (head = most fluent; CCNet trains on head,
    samples middle, drops tail).  Thresholds are ONE tiny global
    aggregate (exact ``F.percentile`` — the engine-shared
    interpolation :mod:`ops.encode` relies on; swap for
    ``percentile_approx`` at unbounded corpus size, same plan shape)
    broadcast back, and the bucket rule is the parity-proven
    strictly-less count from ``encode.quantile_bins``:
    ``bucket_id = 1 + #{thresholds < value}`` — so there is NO global
    sort: the scan stays narrow at any corpus size."""
    if len(labels) != len(fracs) + 1:
        raise ValueError("need len(fracs)+1 labels")
    th = df.agg(
        F.percentile(
            F.col(ppl_col), F.array([F.lit(float(f)) for f in fracs])
        ).alias("__th")
    )
    return (
        df.crossJoin(F.broadcast(th))
        .withColumn(
            "bucket_id",
            (
                F.lit(1)
                + F.aggregate(
                    "__th",
                    F.lit(0),
                    lambda acc, t: acc
                    + F.when(t < F.col(ppl_col), 1).otherwise(0),
                )
            ).cast("int"),
        )
        .withColumn(
            "bucket",
            F.element_at(
                F.array([F.lit(x) for x in labels]), F.col("bucket_id")
            ),
        )
        .drop("__th")
    )


def zipf_fit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf-law diagnostic over the corpus vocabulary: least-squares
    slope/intercept of log(freq) against log(rank) — natural corpora
    sit near slope −1; a synthetic, templated, or heavily duplicated
    corpus bends away from it, which makes the single slope number a
    cheap corpus-health row for the data card.  Ranks are
    deterministic (count desc, then token asc).

    Plan shape: one explode + word groupBy (map-side combined), one
    rank window over the vocabulary (vocab-sized, not corpus-sized),
    one regr_* aggregate to a single row.  At 10^12 tokens the only
    corpus-scaled stage is the word count every tokenizer/TF-IDF op
    here already pays."""
    words = df.select(
        F.explode(tokens(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    freqs = words.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    rk = F.row_number().over(
        Window.orderBy(F.col("n").desc(), F.col("w").asc())
    )
    ranked = freqs.withColumn("r", rk).select(
        F.log(F.col("n").cast("double")).alias("ln_f"),
        F.log(F.col("r").cast("double")).alias("ln_r"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.regr_slope("ln_f", "ln_r"), 6).alias("zipf_slope"),
        F.round(F.regr_intercept("ln_f", "ln_r"), 6).alias("zipf_intercept"),
    )
