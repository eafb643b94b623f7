"""Corpus data card: the one-table summary a curation run publishes.

Every released training corpus ships a "data card" — corpus size,
language / source composition, duplication rate, length profile (the
tables in the LLaMA / Pile / Gopher papers).  ``corpus_datacard``
computes that report as ONE narrow pass over the corpus:

- a single projected base frame (domain columns + token count + char
  count + content digest) is lazily ``localCheckpoint``-ed so the five
  report sections share one scan instead of re-reading the table per
  section (the same shared-subtree pattern as ops/cms.py:133);
- the corpus-wide totals are a one-row aggregate broadcast back into
  the per-domain share sections — no second shuffle over the data;
- the output is a tiny long-format frame ``(section, metric, value)``
  cheap to store per snapshot as an audit row, diffable across
  snapshots with a plain join.

At 10^12 rows the cost is one scan + one groupBy per domain column
(map-side combined, domain cardinality is tiny) + one exact distinct
on the 32-byte digest — the only genuinely heavy aggregate, and the
same digest groupBy the exact-dedup pass (ops/dedup.py) already runs,
so a pipeline that deduped first can reuse its count.

(The reference has no corpus-level reporting — it is a per-image
featurizer, image_featurizer.py:93-534; this layer is what its output
feeds at training-data scale.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pic2vec_spark.ops.text import tokens

__all__ = ["corpus_datacard", "datacard_diff"]


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    domain_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Long-format corpus summary ``(section, metric, value)``.

    Sections: ``size`` (n_docs / n_tokens / n_chars), one section per
    entry of ``domain_cols`` (per-value document share, rounded to 6
    decimals), ``dup`` (exact duplicate fraction, 1 - distinct
    digests / docs), ``length`` (mean / min / max whitespace tokens).
    All values are DOUBLE so the frame stays one homogeneous table.
    """
    cols = [F.col(c) for c in domain_cols]
    base = df.select(
        *cols,
        F.md5(F.col(text_col)).alias("__digest"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("__n_tok"),
        F.length(F.col(text_col)).cast("bigint").alias("__n_chars"),
    ).localCheckpoint(eager=False)

    tot = base.agg(
        F.count(F.lit(1)).alias("__docs"),
        F.sum("__n_tok").alias("__toks"),
        F.sum("__n_chars").alias("__chars"),
        F.countDistinct("__digest").alias("__uniq"),
        F.min("__n_tok").alias("__min_tok"),
        F.max("__n_tok").alias("__max_tok"),
    ).localCheckpoint(eager=False)

    docs_d = F.col("__docs").cast("double")
    size = tot.select(
        F.expr(
            "stack(3, 'n_docs', CAST(__docs AS DOUBLE),"
            " 'n_tokens', CAST(__toks AS DOUBLE),"
            " 'n_chars', CAST(__chars AS DOUBLE)) AS (metric, value)"
        )
    ).select(F.lit("size").alias("section"), "metric", "value")

    dup = tot.select(
        F.lit("dup").alias("section"),
        F.lit("exact_dup_frac").alias("metric"),
        F.round(F.lit(1.0) - F.col("__uniq") / docs_d, 6).alias("value"),
    )

    length = tot.select(
        F.expr(
            "stack(3,"
            " 'mean_tokens', ROUND(__toks / CAST(__docs AS DOUBLE), 6),"
            " 'min_tokens', CAST(__min_tok AS DOUBLE),"
            " 'max_tokens', CAST(__max_tok AS DOUBLE)) AS (metric, value)"
        )
    ).select(F.lit("length").alias("section"), "metric", "value")

    out = size.unionByName(dup).unionByName(length)
    for c in domain_cols:
        share = (
            base.groupBy(c)
            .agg(F.count(F.lit(1)).alias("__n"))
            .crossJoin(F.broadcast(tot.select("__docs")))
            .select(
                F.lit(c).alias("section"),
                F.col(c).cast("string").alias("metric"),
                F.round(F.col("__n") / docs_d, 6).alias("value"),
            )
        )
        out = out.unionByName(share)
    return out


def datacard_diff(card_a: DataFrame, card_b: DataFrame) -> DataFrame:
    """Release-over-release corpus drift: align two data cards on
    (section, metric) with a full outer join — a language or source
    present in only one release reads 0 in the other — and report
    ``value_a``, ``value_b`` and ``delta = round(b − a, 6)``.  The
    diff a curation run publishes next to each new snapshot so
    composition shifts (a crawl dump doubling its share, dup rate
    creeping up) are one table, diffable further upstream.

    Both inputs are tiny report frames (sections × domain
    cardinality), so the join is a broadcast regardless of corpus
    size — the heavy work happened inside the two card passes."""
    a = card_a.select(
        "section", "metric", F.col("value").alias("value_a")
    )
    b = card_b.select(
        "section", "metric", F.col("value").alias("value_b")
    )
    return (
        a.join(b, ["section", "metric"], "full_outer")
        .select(
            "section",
            "metric",
            F.round(F.coalesce("value_a", F.lit(0.0)), 6).alias("value_a"),
            F.round(F.coalesce("value_b", F.lit(0.0)), 6).alias("value_b"),
            F.round(
                F.coalesce("value_b", F.lit(0.0))
                - F.coalesce("value_a", F.lit(0.0)),
                6,
            ).alias("delta"),
        )
    )
