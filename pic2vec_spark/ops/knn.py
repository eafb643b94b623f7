"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a bounded query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  window.  Pure Catalyst expressions (zip_with/aggregate), no UDF.
- ``lsh_bucket_topk``: random-hyperplane LSH — the scale path: corpus
  and queries are bucketed by sign-bit signature; candidates come from
  bucket equality (multi-probe over ``n_tables`` independent tables),
  exact cosine re-rank inside buckets.  Never all-pairs.
- ``cosine_neardup_pairs``: near-duplicate vector pairs over a bounded
  subset (exact), the embedding analogue of dedup.

Determinism: hyperplanes come from a seeded NumPy RNG and are embedded
as literal arrays in the plan, so results are partition-invariant and
reproducible; tests check LSH recall against the exact path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    # cast float32 arrays to double BEFORE multiplying: both engines then
    # run identical double-precision left-to-right folds (oracle parity)
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours per query (broadcast queries x corpus).

    Output: (query_id, neighbor_id, cos, rk).  Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng([seed, dim, n_planes])
    return rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)


def _signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit signature for one LSH table (planes: (n_planes, dim))."""
    sig = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        sig = sig + F.when(_dot(vec, arr) >= 0, F.lit(1 << j).cast("bigint")).otherwise(0)
    return sig


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a bucket
    with the query in ANY of ``n_tables`` hyperplane tables, exact
    cosine re-rank inside the candidate set.

    Defaults (4 planes x 8 tables) give ~0.8 recall@5 on unstructured
    gaussian vectors (the hard case — no cluster structure to exploit);
    clustered real embeddings prune far better.  More planes = smaller
    buckets = faster but lower recall; more tables buys recall back."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, n_tables, seed)

    def bucketize(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        rows = []
        for t in range(n_tables):
            rows.append(
                df.select(
                    F.col(idc),
                    F.col(vecc),
                    F.lit(t).alias("table"),
                    _signature(F.col(vecc), planes[t]).alias("bucket"),
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out

    cb = bucketize(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")),
        "neighbor_id", "cvec",
    )
    qb = bucketize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")),
        "query_id", "qvec",
    )
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .distinct()
    )
    scored = cand.withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate vector pairs (cos >= threshold), id1 < id2.
    All-pairs — bound the input (or use lsh_bucket_topk) at scale."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cos", F.round(cosine(F.col("v1"), F.col("v2")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )
