"""Rank fusion for hybrid retrieval.

``rrf_fuse`` merges two (or more) ranked candidate lists per query with
Reciprocal Rank Fusion (Cormack et al. 2009): each list contributes
``1 / (k + rank)`` and candidates are re-ranked by the sum — the
standard way to combine a lexical ranking (inverted index / BM25-ish)
with a vector ranking (ANN) without score calibration, since RRF uses
only RANKS.  ``k`` (default 60, the paper's constant) damps the head.

Plan shape: a full outer join of the per-query lists on (query, doc)
— each list is already top-k-truncated upstream, so the join touches
O(queries x k) rows regardless of corpus size — then one window rank.
Deterministic: ties break by doc id.

(The reference has no retrieval surface; companion to ops/knn and the
inverted index in ops/text.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lists: list[DataFrame],
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Fuse ranked lists — each a (query_col, doc_col, rank_col) frame
    with rank 1 = best — into (query_col, doc_col, rrf_score, rk).
    A candidate absent from a list simply contributes nothing for it
    (the standard RRF convention).  ``top`` truncates the fused list."""
    if len(lists) < 2:
        raise ValueError(f"rrf_fuse needs >= 2 lists, got {len(lists)}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        df.select(
            F.col(query_col),
            F.col(doc_col),
            (F.lit(1.0) / (F.lit(k) + F.col(rank_col).cast("double"))).alias(
                f"__s{i}"
            ),
        )
        for i, df in enumerate(lists)
    ]
    joined = reduce(
        lambda a, b: a.join(b, [query_col, doc_col], "full_outer"), parts
    )
    score = reduce(
        lambda x, y: x + y,
        [F.coalesce(F.col(f"__s{i}"), F.lit(0.0)) for i in range(len(parts))],
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_score"), F.col(doc_col).asc()
    )
    out = (
        joined.withColumn("rrf_score", F.round(score, 6))
        .withColumn("rk", F.row_number().over(w))
        .select(query_col, doc_col, "rrf_score", "rk")
    )
    return out.filter(F.col("rk") <= top) if top else out
