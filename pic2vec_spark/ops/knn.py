"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a bounded query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  window.  Pure Catalyst expressions (zip_with/aggregate), no UDF.
- ``lsh_bucket_topk``: random-hyperplane LSH — the scale path: corpus
  and queries are bucketed by sign-bit signature; candidates come from
  bucket equality (multi-probe over ``n_tables`` independent tables),
  exact cosine re-rank inside buckets.  Never all-pairs.
- ``ivf_topk`` (+ ``kmeans_centroids``/``sample_vectors``): IVF — the
  scale path for *clustered* data: coarse centroids trained on a
  bounded driver-side sample, corpus assigned to one cell each (narrow
  map over broadcast centroid literals), queries probe their nprobe
  nearest cells, exact re-rank inside the probed cells.
- ``cosine_neardup_pairs``: near-duplicate vector pairs over a bounded
  subset (exact), the embedding analogue of dedup.

Determinism: hyperplanes come from a seeded NumPy RNG and are embedded
as literal arrays in the plan, so results are partition-invariant and
reproducible; tests check LSH recall against the exact path.

Compile-vs-run tradeoff, two regimes by expression size:

- PAIR math (``_cosine_unrolled``: one cosine, ~3*dim terms) is
  UNROLLED into flat codegen expressions rather than higher-order-
  function folds.  One-time janino compilation per generated class per
  JVM, but per-row evaluation is ~100x cheaper than interpreted HOF
  lambdas — at the 10^9-candidate-pair design point the compile cost
  amortizes to nothing while the HOF form would burn CPU-hours.
- MATRIX math (``_with_centroid_cos``: n_centroids x dim;
  ``_all_signatures``: n_tables*n_planes x dim) cannot unroll: it is
  one expression tree, codegen cannot split inside a single expression,
  and janino's 64 KB method limit rejects it — whole-stage compilation
  fails and every fresh plan pays a doomed multi-second compile attempt
  before falling back.  Those run as Arrow-vectorized pandas UDFs with
  dimension-at-a-time accumulation, which keeps every per-row sum the
  same left-to-right IEEE sequence as the unrolled SQL and the DuckDB
  oracle (bit-exact parity; see the docstrings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _cosine_unrolled(a: str, b: str, dim: int) -> Column:
    """``cosine`` with a known dimension, unrolled into flat codegen-able
    expressions.  Identical arithmetic (per-element double promotion,
    sequential left-to-right sums, num / (sqrt*sqrt)) to the
    higher-order-function form and the DuckDB oracle — but HOF lambdas
    evaluate per element outside whole-stage codegen, which made the
    candidate re-rank the dominant cost in the bucketed ANN paths.

    The bucketed ANN operators' contract is FIXED-dimension embeddings
    (their signatures are computed over the probed ``dim`` already);
    rows of a different length yield NULL here — excluded by threshold
    filters and ranked last by desc windows — rather than a silently
    truncated similarity.  The guard stays a plain size comparison: an
    ``otherwise(cosine(...))`` fallback would drag a CodegenFallback
    HOF into the expression and force the whole re-rank interpreted.
    dim-0 probes yield NULL like the old form's 0/0 did.

    ``a``/``b`` are COLUMN NAMES: the expression is emitted as one SQL
    string and parsed JVM-side in a single py4j call — building ~3*dim
    terms as Column objects costs thousands of py4j round-trips
    (measured ~25 s of pure Python plan construction per query)."""
    if dim == 0:
        return F.lit(None).cast("double")

    def term(n: str, i: int) -> str:
        return f"CAST(`{n}`[{i}] AS DOUBLE)"

    num = " + ".join(f"({term(a, i)} * {term(b, i)})" for i in range(dim))
    asq = " + ".join(f"({term(a, i)} * {term(a, i)})" for i in range(dim))
    bsq = " + ".join(f"({term(b, i)} * {term(b, i)})" for i in range(dim))
    return F.expr(
        f"CASE WHEN size(`{a}`) = {dim} AND size(`{b}`) = {dim} "
        f"THEN ({num}) / (SQRT({asq}) * SQRT({bsq})) END"
    )


def _round_half_up(x: np.ndarray, decimals: int = 6) -> np.ndarray:
    """HALF_UP (away from zero) rounding — what Spark's F.round and
    DuckDB's ROUND do; np.round is half-even, a silent cross-engine
    divergence on exact .5 boundaries."""
    p = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * p + 0.5), x) / p


def pair_cosine_arrow(a, b, dim: int):
    """Arrow-batched numpy cosine of two vector COLUMNS, rounded
    HALF_UP to 6 decimals — the BULK-pair scoring kernel for the
    near-dup re-ranks.

    Why not `_cosine_unrolled` here: a 64-dim unrolled cosine is ~600
    expression nodes; inside the re-rank operators janino's 64 KB
    method limit trips, Spark falls back to INTERPRETED expression
    eval, and the re-rank crawls at ~15k pairs/s (measured: 463k LSH
    candidates took 41 s — 25 s of it this one expression).  The Arrow
    path moves each candidate batch to numpy once and scores it with
    vectorized einsum (~10M pairs/s), the same batch-kernel pattern as
    the CNN stage.  Rows that are NULL or not ``dim`` long yield NULL
    (the unrolled form's CASE guard semantics)."""
    @F.pandas_udf("double")
    def pair_cos(xa: pd.Series, xb: pd.Series) -> pd.Series:
        n = len(xa)
        if not n:
            return pd.Series([], dtype=float)
        ok = np.fromiter(
            (
                u is not None and v is not None
                and len(u) == dim and len(v) == dim
                for u, v in zip(xa, xb)
            ),
            dtype=bool,
            count=n,
        )
        out = np.full(n, np.nan)
        if ok.any():
            va = np.stack([np.asarray(u, dtype=np.float64) for u in xa[ok]])
            vb = np.stack([np.asarray(v, dtype=np.float64) for v in xb[ok]])
            num = np.einsum("ij,ij->i", va, vb)
            den = np.sqrt(np.einsum("ij,ij->i", va, va)) * np.sqrt(
                np.einsum("ij,ij->i", vb, vb)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                out[ok] = _round_half_up(num / den)
        res = pd.Series(out)
        return res.where(np.isfinite(out), None)

    return pair_cos(a, b)


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


def _all_signatures(planes: np.ndarray):
    """Arrow-vectorized UDF: all ``n_tables`` sign-bit signatures of a
    vector in ONE pass — array<bigint> of length n_tables.

    Same reasoning as ``_with_centroid_cos``: the full signature matrix
    is n_tables*n_planes*dim terms, far past janino's 64 KB method
    limit as one unrolled expression, and an n_tables-branch union of
    per-table unrolled signatures (the previous shape) re-scans the
    source n_tables times and compiles 2*n_tables whole-stage classes
    (~10 s of janino per cold query).  The UDF scans once, compiles
    nothing, and keeps bit-parity: plane dots accumulate dimension-at-
    a-time (vectorized across rows), i.e. each per-row dot is the same
    left-to-right IEEE double sum as the unrolled SQL and the DuckDB
    oracle; the sign test and bit packing are exact integer ops.

    Degenerate rows keep the old expression semantics: a NULL vector or
    one shorter than the plane dim made every CASE term fall to its
    ELSE 0 (null dot >= 0 is not true), i.e. bucket 0 in every table;
    longer vectors use their first ``dim`` elements (GetArrayItem never
    read past dim)."""
    n_tables, n_planes, dim = planes.shape
    pmat = np.ascontiguousarray(
        planes.reshape(n_tables * n_planes, dim), dtype=np.float64
    )
    bits = (1 << np.arange(n_planes, dtype=np.int64))  # per-plane bit

    @F.pandas_udf("array<bigint>")
    def sigs(v):  # pd.Series -> pd.Series
        n = len(v)
        zero = np.zeros(n_tables, dtype=np.int64)
        ok = np.array(
            [x is not None and len(x) >= dim for x in v], dtype=bool
        )
        res = [zero] * n
        if ok.any():
            e = np.zeros((int(ok.sum()), dim), dtype=np.float64)
            for r, x in enumerate(v[ok]):
                e[r, :] = x[:dim]
            dots = np.zeros((e.shape[0], pmat.shape[0]), dtype=np.float64)
            for i in range(dim):  # left-to-right per-row sums (parity)
                dots += e[:, i][:, None] * pmat[None, :, i]
            sign = (dots >= 0).reshape(-1, n_tables, n_planes)
            buckets = (sign * bits[None, None, :]).sum(axis=2)
            for r, idx in enumerate(np.nonzero(ok)[0]):
                res[int(idx)] = buckets[r]
        return pd.Series(res)

    return sigs


def _bucketize(df: DataFrame, idc: str, vecc: str, planes: np.ndarray) -> DataFrame:
    """Replicate df once per LSH table with (table, bucket) columns:
    one scan, one Arrow UDF computing every table's signature (see
    ``_all_signatures``), one posexplode."""
    sigs = _all_signatures(planes)
    return df.select(
        F.col(idc),
        F.col(vecc),
        F.posexplode(sigs(F.col(vecc))).alias("table", "bucket"),
    )


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
    head = corpus.select(vec_col).first()
    if head is None:
        # empty corpus: the exact path is lazy and yields the correctly
        # typed empty result without needing a probe row for the dim
        return cosine_topk(corpus, queries, k, id_col, vec_col)
    dim = len(head[0])
    planes = _hyperplanes(dim, n_planes, n_tables, seed)

    def bucketize(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        return _bucketize(df, idc, vecc, planes)

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
    scored = cand.withColumn(
        "cos", F.round(_cosine_unrolled("qvec", "cvec", dim), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def kmeans_centroids(
    x: np.ndarray, n_centroids: int, iters: int = 5
) -> np.ndarray:
    """Deterministic Lloyd k-means over a driver-side sample.

    Init = the first ``n_centroids`` sample rows (no RNG at all, so the
    centroids are a pure function of the sample); an emptied cluster
    keeps its previous centroid.  The sample is bounded (driver memory),
    which is the standard IVF recipe: train coarse centroids on ~1e5
    sampled vectors, then assign the full 1e12-row corpus distributedly.
    """
    x = np.asarray(x, dtype=np.float64)
    c = x[:n_centroids].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(n_centroids):
            mask = assign == j
            if mask.any():
                c[j] = x[mask].mean(axis=0)
    return c


def sample_vectors(
    df: DataFrame, n: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic bounded sample for centroid training: the ``n``
    smallest ids (order-stable under any partitioning).  At 1e12 scale
    swap the orderBy for ``df.sample(fraction).limit(n)`` — training only
    needs a representative sample, the ids here buy test determinism."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n).collect()
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def _with_centroid_cos(
    df: DataFrame, vec: str, centroids: np.ndarray, out: str = "__cos"
) -> DataFrame:
    """Adds ``out`` = array of round-6 cosines vec x each centroid.

    This one deliberately breaks the "unroll into codegen expressions"
    rule the pair re-rank follows (``_cosine_unrolled``): n_centroids * dim
    unrolled terms is ONE expression tree, codegen can only split
    generated Java at expression boundaries, so janino gets a single
    >64 KB method and fails — Spark then falls back to per-operator
    codegen (execution stays fast) but pays a doomed ~13 s compile
    attempt on EVERY fresh plan because expression ids differ (measured:
    244 s for one sf0.01 gate query, vs 0.4 s warm).  A chain of
    per-centroid projections doesn't help: CollapseProject re-inlines
    single-use columns and whole-stage codegen fuses the consume chain
    back into one method.

    So the constant-matrix product runs as an Arrow-vectorized pandas
    UDF — the standard Spark shape for embedding x literal-matrix math:
    still a narrow per-partition map (ArrowEvalPython; the plan audit in
    tests/test_plans.py bans only row-at-a-time BatchEvalPython), no
    janino involvement, and NumPy is memory-bandwidth-bound here.

    Oracle parity is bit-exact, not approximate: the accumulation loops
    dimension-at-a-time (vectorized across rows), so every per-row sum
    is the same left-to-right sequence of IEEE double ops as DuckDB's
    list_dot_product fold and the old unrolled SQL; the centroid norms
    are plan constants computed with the same sequential order.  Rows
    whose length != centroid dim yield NULL (same CASE the unrolled
    cosine used)."""
    import math

    dim = int(centroids.shape[1])
    cmat = np.ascontiguousarray(centroids, dtype=np.float64)  # (k, dim)
    cnorms = np.array(
        [
            math.sqrt(
                # sequential: identical to list_dot_product's fold
                _seq_sum(float(x) * float(x) for x in c)
            )
            for c in cmat
        ],
        dtype=np.float64,
    )

    @F.pandas_udf("array<double>")
    def cos_arr(v):  # pd.Series -> pd.Series (hints omitted: the
        # decorator's returnType alone fixes SCALAR eval type)
        n = len(v)
        ok = np.array(
            [x is not None and len(x) == dim for x in v], dtype=bool
        )
        if not ok.any():
            return pd.Series([None] * n)
        e = np.zeros((int(ok.sum()), dim), dtype=np.float64)
        for r, x in enumerate(v[ok]):
            e[r, :] = x
        # dimension-at-a-time accumulation == per-row left-to-right sum
        dots = np.zeros((e.shape[0], cmat.shape[0]), dtype=np.float64)
        vsq = np.zeros(e.shape[0], dtype=np.float64)
        for i in range(dim):
            col = e[:, i]
            dots += col[:, None] * cmat[None, :, i]
            vsq += col * col
        cos = dots / (np.sqrt(vsq)[:, None] * cnorms[None, :])
        cos = np.round(cos, 6)
        res = [None] * n
        for r, idx in enumerate(np.nonzero(ok)[0]):
            res[int(idx)] = cos[r]
        return pd.Series(res)

    return df.withColumn(out, cos_arr(F.col(vec)))


def _seq_sum(it) -> float:
    s = 0.0
    for x in it:
        s += x
    return s


def assign_cells(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(neighbor_id, cvec, cell): IVF cell assignment — 1-based argmax
    cosine to the broadcast centroid literals, FIRST index on ties
    (array_position), a narrow map with no shuffle.  The ONE definition
    used by both ``ivf_topk`` (query-time assignment) and the persisted
    index (``ops.ivf_store.build_ivf_index``), so the probe==ivf_topk
    exact-equivalence contract is structural, not copy-paste.

    The cosine array is a single UDF output column, so the argmax
    computes it ONCE per row (array_position(expr, array_max(expr))
    over an inline expression would duplicate the n_centroids-fold
    subtree — ~2x assignment CPU at scale, since Catalyst does not
    reliably CSE across arguments)."""
    return (
        _with_centroid_cos(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("cvec"),
            ),
            "cvec",
            centroids,
        )
        .select(
            "neighbor_id",
            "cvec",
            F.array_position(F.col("__cos"), F.array_max(F.col("__cos")))
            .cast("int")
            .alias("cell"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the clustered-data scale
    path, complementing ``lsh_bucket_topk``:

    1. every corpus vector is assigned to ONE cell = argmax cosine to the
       broadcast centroid literals (narrow map, no shuffle);
    2. each query probes its ``nprobe`` nearest cells;
    3. exact cosine re-rank of the probed cells' members only.

    Tiebreaks are deterministic: cell = FIRST index attaining the max
    (``array_position``), probe ranking orders by (cos desc, cell asc).
    At 1e12 rows the corpus side would be written partitioned by cell so
    probes prune files; here the cell column keeps the join narrow.
    Output: (query_id, neighbor_id, cos, rk).
    """
    c = assign_cells(corpus, centroids, id_col, vec_col)
    qc = _with_centroid_cos(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec",
        centroids,
    ).select(
        "query_id",
        "qvec",
        F.posexplode(F.col("__cos")).alias("cell0", "ccos"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell0").asc()
    )
    probes = (
        qc.withColumn("prk", F.row_number().over(w_probe))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "qvec", (F.col("cell0") + 1).alias("cell"))
    )
    cand = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                _cosine_unrolled("qvec", "cvec", int(centroids.shape[1])), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


# Hard ceiling for the exact all-pairs near-dup path.  Above this the
# O(n^2) comparison count is no longer a "bounded subset" and the caller
# must use cosine_neardup_pairs_lsh (bucketed, never all-pairs) instead.
# Mirrors the broadcast-asof auto-switch pattern (pipeline.py): cheap
# distributed count up front, explicit failure instead of a silent
# cartesian explosion when someone points this at a 100 TB table.
EXACT_NEARDUP_MAX_ROWS = 100_000


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = EXACT_NEARDUP_MAX_ROWS,
) -> DataFrame:
    """Exact near-duplicate vector pairs (cos >= threshold), id1 < id2.

    All-pairs: O(n^2) comparisons.  Guarded — if the input exceeds
    ``max_rows`` this raises with a pointer to the LSH-bucketed scale
    path (``cosine_neardup_pairs_lsh``) rather than launching an
    unbounded cartesian product.  Pass ``max_rows=None`` to opt out
    (e.g. when the caller has already bounded the input).
    """
    if max_rows is not None:
        # bounded guard scan: limit(max_rows+1) early-terminates, so the
        # check costs O(max_rows) rows of the input plan, never a full
        # count of a 100 TB table it is about to refuse anyway
        n = df.limit(max_rows + 1).count()
        if n > max_rows:
            raise ValueError(
                f"cosine_neardup_pairs is exact all-pairs (O(n^2)) and the "
                f"input has > max_rows={max_rows} rows; use "
                f"cosine_neardup_pairs_lsh for large inputs, or pass "
                f"max_rows=None if the input is deliberately bounded."
            )
    a = df.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = df.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    # probe the dimension once (cheap driver action) to pick the
    # Arrow-batched numpy pair kernel (pair_cosine_arrow — the giant
    # unrolled expression trips janino's 64 KB method limit inside the
    # re-rank and drops the whole pair scoring to interpreted eval,
    # ~15k pairs/s); fall back to the HOF form only when no probe row
    # exists (empty input stays lazy and correctly typed).  A Python
    # UDF predicate is also never pushed into the
    # BroadcastNestedLoopJoin condition, so the join runs on the cheap
    # id1 < id2 and the cosine lands in one ArrowEvalPython above it.
    head = df.select(vec_col).first()
    if head is not None and head[0] is not None:
        cos_expr = pair_cosine_arrow("v1", "v2", len(head[0]))
    else:
        cos_expr = F.round(cosine(F.col("v1"), F.col("v2")), 6)
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .withColumn("cos", cos_expr)
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def auto_lsh_planes(n_rows: int, target_bucket: int = 64) -> int:
    """Corpus-sized plane count for hyperplane LSH: enough planes that
    the expected bucket holds ~``target_bucket`` rows (candidate volume
    per table ~ n * bucket_size), clamped to [4, 16].  A FIXED plane
    count cannot be right at both 2k and 20M rows: per-table candidates
    grow as n^2 / 2^planes, so planes must track log2(n)."""
    import math

    return max(4, min(16, math.ceil(math.log2(max(n_rows / target_bucket, 2)))))


def cosine_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Near-duplicate vector pairs via LSH buckets — the scale path for
    ``cosine_neardup_pairs``: candidate pairs are rows sharing a bucket
    in ANY of ``n_tables`` random-hyperplane tables, exact cosine
    re-rank + threshold inside buckets only.  Never all-pairs.

    Recall math: cos >= t means angle <= acos(t); one hyperplane splits
    the pair with prob angle/pi, so P(same bucket in one table) =
    (1 - angle/pi)^n_planes and missing all tables is exponentially
    unlikely — at t=0.95 (<=18.2deg), 4 planes x 8 tables gives
    P(candidate) > 0.999.  Candidate volume ~= sum of squared bucket
    sizes per table (~n^2 / 2^planes on unclustered data), so
    ``n_planes=None`` (default) SIZES THE TABLE TO THE CORPUS via
    ``auto_lsh_planes`` — log2(n/64) planes keep expected buckets ~64
    rows at any n (a fixed plane count that is right at 2k rows melts
    at 20M); recall per table drops with added planes, traded against
    the extra tables staying affordable.  Real near-dup corpora
    cluster, concentrating true pairs and spreading non-pairs.
    Output: (id1, id2, cos), id1 < id2."""
    head = df.select(vec_col).first()
    if head is None:
        # empty input: the exact path is lazy and yields the correctly
        # typed empty pairs frame (no dim probe row exists to plan LSH)
        return cosine_neardup_pairs(df, threshold, id_col, vec_col)
    dim = len(head[0])
    if n_planes is None:
        # narrow count (ids only) — the same cheap pre-scan the exact
        # path's guard and the broadcast-asof auto-switch already use
        n_planes = auto_lsh_planes(df.select(id_col).count())
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    b = _bucketize(
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")),
        "vid", "v", planes,
    )
    left = b.select(
        "table", "bucket", F.col("vid").alias("id1"), F.col("v").alias("v1")
    )
    right = b.select(
        "table", "bucket", F.col("vid").alias("id2"), F.col("v").alias("v2")
    )
    cand = (
        left.join(right, ["table", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "v1", "id2", "v2")
        .distinct()
    )
    return (
        cand.withColumn("cos", pair_cosine_arrow("v1", "v2", dim))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into k-means cells, score
    cosine only WITHIN each cell, and drop every row that sits within
    ``threshold`` cosine of a higher-ranked cell-mate.  The standard
    LLM-curation step between exact dedup (catches byte-identical) and
    MinHash (catches near-verbatim): embedding cosine catches
    *paraphrase* duplicates that share no n-grams.

    Rank inside a cell = (centroid cosine DESC, id ASC) — rounded-6
    cosine on both engines, so the rank (and therefore the keep set) is
    deterministic and oracle-replicable.  A row is dropped iff ANY
    higher-ranked row in its cell is ``>= threshold`` similar; the rule
    is single-pass (no iterative greedy), which makes it expressible as
    one self-join + anti-join in both Spark and SQL.

    Scale shape: cell assignment is a narrow map over broadcast
    centroid literals (no shuffle, same kernel as IVF); the self-join
    shuffles once on ``cell`` and is quadratic only WITHIN a cell — the
    SemDeDup contract is that k grows with n so expected cell size
    stays bounded (the paper runs k=50k on 200M docs).  Pair scoring
    uses the Arrow batch kernel (``pair_cosine_arrow``), never the
    unrolled SQL cosine (janino 64 KB limit -> interpreted fallback).

    Output: (id_col, cell, centroid_cos, keep) — one row per input row,
    ``keep`` a total boolean (never NULL)."""
    # pair scoring must use the CENTROID dim (rows of any other length
    # yield NULL cosines in both engines anyway) — no .first() sniff:
    # it cost an eager job and crashed on a NULL-embedding head row
    dim = int(centroids.shape[1])
    a = (
        _with_centroid_cos(
            df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v")),
            "v",
            centroids,
        )
        .select(
            "vid",
            "v",
            F.array_position(F.col("__cos"), F.array_max(F.col("__cos")))
            .cast("int")
            .alias("cell"),
            F.array_max(F.col("__cos")).alias("ccos"),
        )
        # the assignment feeds THREE aliased branches (hi/lo self-join +
        # the final outer join) — same ReuseExchange-defeating shape as
        # the shingle relation in ops/dedup; checkpoint so the Arrow
        # centroid-cos UDF runs once per row, not 3x
        .localCheckpoint(eager=False)
    )
    hi = a.select(
        F.col("cell"), F.col("vid").alias("hid"),
        F.col("v").alias("hv"), F.col("ccos").alias("hccos"),
    )
    lo = a.select(
        F.col("cell"), F.col("vid").alias("lid"),
        F.col("v").alias("lv"), F.col("ccos").alias("lccos"),
    )
    # higher-ranked partner: strictly greater centroid cosine, ties by id
    pairs = hi.join(lo, "cell").filter(
        (F.col("hccos") > F.col("lccos"))
        | ((F.col("hccos") == F.col("lccos")) & (F.col("hid") < F.col("lid")))
    )
    dropped = (
        pairs.withColumn("pcos", pair_cosine_arrow("hv", "lv", dim))
        .filter(F.col("pcos") >= threshold)
        .select(F.col("lid").alias("vid"))
        .distinct()
    )
    return (
        a.join(dropped.withColumn("_drop", F.lit(True)), "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.col("ccos").alias("centroid_cos"),
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
        )
    )


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group elementwise-mean centroid of a vector column.

    Component sums run in DECIMAL(25,8) (per-component double values
    rounded to 8 decimals at the cast), so the sum is exact integer
    arithmetic — partitioning/engine cannot change it — and the mean
    divides once in double at the end.  Plan: posexplode ->
    partial-aggregated groupBy(group, pos) (shuffle bounded by
    groups x dims, never by row count) -> per-group array rebuild via
    sorted collect_list (groups x dims rows — driver-free).  NULL
    vectors are excluded.  Output: (group_col, centroid array<double>,
    n_vectors)."""
    ex = (
        df.filter(F.col(vec_col).isNotNull())
        .select(group_col, F.posexplode(vec_col).alias("pos", "v"))
        .select(
            group_col,
            "pos",
            F.col("v").cast("double").cast("decimal(25,8)").alias("vd"),
        )
    )
    comp = ex.groupBy(group_col, "pos").agg(
        (F.sum("vd").cast("double") / F.count(F.lit(1))).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        comp.groupBy(group_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
            # max, not first: deterministic, and == the group's vector
            # count whenever vectors are rectangular (ragged inputs are
            # the caller's bug — dimension 0 is present in every vector)
            F.max("n").alias("n_vectors"),
        )
        .select(
            group_col,
            F.transform("pm", lambda x: x["m"]).alias("centroid"),
            "n_vectors",
        )
    )


def centroid_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
) -> DataFrame:
    """Embedding-space outlier screen: cosine of every vector to its
    own group's centroid; vectors below ``threshold`` are flagged — the
    curation pass that catches mislabeled / off-distribution rows
    (wrong-language docs in a language bucket, corrupted images in a
    class) before they poison training.

    Output: (id_col, group_col, cos_centroid, is_outlier).  The
    centroid table is groups-sized — broadcast back, so the fact side
    never shuffles.  Cosine folds left-to-right in double (the knn
    parity contract), rounded to 6."""
    cents = group_centroids(df, group_col, vec_col).select(group_col, "centroid")
    return (
        df.filter(F.col(vec_col).isNotNull())
        .join(F.broadcast(cents), group_col)
        .select(
            id_col,
            group_col,
            F.round(cosine(F.col(vec_col), F.col("centroid")), 6).alias(
                "cos_centroid"
            ),
        )
        .withColumn("is_outlier", F.col("cos_centroid") < threshold)
    )


def hard_negatives(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    queries: DataFrame | None = None,
) -> DataFrame:
    """Contrastive-training pair mining: for each query vector, the
    top-k most-similar vectors with a DIFFERENT label — the "hard
    negatives" that carry the gradient signal in triplet/InfoNCE
    training (easy negatives are already far; random negatives are
    mostly easy).

    Output: (query_id, query_label, neighbor_id, neighbor_label, cos,
    rk), exact, deterministic ties (cos desc, neighbor_id asc).  Same
    broadcast shape as ``cosine_topk``: queries broadcast against the
    corpus, WindowGroupLimit prunes the per-query top-k map-side.  At
    10^9+ corpus rows swap the exact scorer for the LSH-bucketed
    candidate generator and re-rank — identical downstream contract."""
    q = (queries if queries is not None else corpus).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qvec"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("cvec"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_label") != F.col("query_label"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "query_label", "neighbor_id", "neighbor_label",
            "cos", "rk",
        )
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress embeddings to
    ``out_dim`` dimensions via a seeded Gaussian plane set scaled by
    1/sqrt(out_dim) (pairwise distances preserved within the JL bound)
    — the cheap pre-pass that makes downstream ANN / dedup / clustering
    state out_dim/dim smaller at 10^12-vector scale.

    Output is LONG form — (id_col, dim_idx, value) — so the result is
    engine-comparable without array-rendering ambiguity.  Planes come
    from the same seeded RNG as the LSH operators and are embedded as
    literals in the DuckDB oracle; the Arrow UDF accumulates
    dimension-at-a-time for bit-parity with list_dot_product (the
    _all_signatures contract).  NULL / short vectors are dropped (no
    projection exists).  Narrow map — zero shuffle."""
    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        if first is None or first[0] is None:
            raise ValueError("cannot infer dim from an empty frame")
        dim = int(first[0])
    planes = _hyperplanes(dim, out_dim, 1, seed)[0] / np.sqrt(out_dim)
    pmat = np.ascontiguousarray(planes, dtype=np.float64)  # (out_dim, dim)

    @F.pandas_udf("array<double>")
    def proj(v):
        n = len(v)
        res = [None] * n
        ok = np.array([x is not None and len(x) >= dim for x in v], dtype=bool)
        if ok.any():
            e = np.zeros((int(ok.sum()), dim), dtype=np.float64)
            for r, x in enumerate(v[ok]):
                e[r, :] = x[:dim]
            dots = np.zeros((e.shape[0], pmat.shape[0]), dtype=np.float64)
            for i in range(dim):  # left-to-right per-row sums (parity)
                dots += e[:, i][:, None] * pmat[None, :, i]
            for r, idx in enumerate(np.nonzero(ok)[0]):
                res[int(idx)] = dots[r]
        return pd.Series(res)

    return (
        df.select(id_col, proj(F.col(vec_col)).alias("__p"))
        .filter(F.col("__p").isNotNull())
        .select(id_col, F.posexplode("__p").alias("dim_idx", "__v"))
        # round JVM-side: F.round is HALF_UP like DuckDB's ROUND
        # (np.round is half-even — a silent cross-engine divergence)
        .select(id_col, "dim_idx", F.round("__v", 6).alias("value"))
    )


def random_projection_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    seed: int = 7,
    dim: int = 64,
) -> str:
    """DuckDB oracle for ``random_projection``: the SAME seeded planes
    as literal arrays, list_dot_product per output dimension (identical
    left-to-right double sums), unioned into long form."""
    planes = _hyperplanes(dim, out_dim, 1, seed)[0] / np.sqrt(out_dim)
    selects = []
    for j in range(out_dim):
        lits = ", ".join(repr(float(x)) for x in planes[j])
        selects.append(
            f"SELECT {id_col}, {j} AS dim_idx, "
            f"ROUND(list_dot_product(list_transform({vec_col}, "
            f"x -> CAST(x AS DOUBLE)), [{lits}]), 6) AS value "
            f"FROM {table} WHERE {vec_col} IS NOT NULL "
            f"AND len({vec_col}) >= {dim}"
        )
    return " UNION ALL ".join(selects)


# ------------------------------------------------------------------ PCA

def pca_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_train: int = 2000,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact PCA fit on the deterministic bounded training sample (the
    SAME ``sample_vectors`` contract centroid/PQ training uses — the
    n smallest ids, order-stable under any partitioning, so two fits
    on the same corpus are bit-identical; at 10^12 rows swap in a
    uniform sample, PCA training never needs the full corpus).
    Returns ``(mean (dim,), components (k, dim), explained_var_ratio
    (k,))`` with the deterministic sign convention: each component's
    largest-|coefficient| entry is positive (np.argmax ties break to
    the first index), so eigenvector sign ambiguity cannot flip
    projections between runs.

    The exact companion of :func:`random_projection`: JL preserves
    pairwise distances obliviously; PCA concentrates variance for
    reconstruction / whitening / visualization — both compress the
    embedding column before ANN state at scale."""
    x = sample_vectors(df, n_train, id_col, vec_col)
    return pca_fit_np(x, k)


def pca_fit_np(x: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The pure-NumPy fit kernel behind :func:`pca_fit` — shared with
    the driver-side oracle artifact (same contract as
    kmeans_centroids / pq_train: one kernel, two callers, parity by
    construction)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if x.shape[0] < 2:
        raise ValueError("pca_fit needs at least 2 training vectors")
    if k > x.shape[1]:
        raise ValueError(f"k={k} exceeds dim={x.shape[1]}")
    mu = x.mean(axis=0)
    xc = x - mu
    cov = (xc.T @ xc) / (x.shape[0] - 1)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()        # (k, dim)
    for i in range(k):
        if comps[i, int(np.argmax(np.abs(comps[i])))] < 0:
            comps[i] = -comps[i]
    total = float(w.sum())
    evr = (w[order] / total) if total > 0 else np.zeros(k)
    return mu, comps, np.asarray(evr, dtype=np.float64)


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every embedding onto fitted PCA components — LONG form
    ``(id_col, dim_idx, value)``, the same engine-comparable shape as
    :func:`random_projection`.  Projection is computed as
    ``fold(x·c) − fold(mu·c)``: the Arrow UDF accumulates the data dot
    dimension-at-a-time (identical left-to-right IEEE sequence to
    DuckDB's list_dot_product) and subtracts the plan-constant mean
    dot computed with the same sequential fold — bit-parity by
    construction, not by tolerance.  NULL / short vectors are dropped;
    narrow map, zero shuffle."""
    dim = int(components.shape[1])
    cmat = np.ascontiguousarray(components, dtype=np.float64)
    mudots = np.array(
        [_seq_sum(float(mean[i]) * float(c[i]) for i in range(dim)) for c in cmat],
        dtype=np.float64,
    )

    @F.pandas_udf("array<double>")
    def proj(v):
        n = len(v)
        res = [None] * n
        ok = np.array([x is not None and len(x) >= dim for x in v], dtype=bool)
        if ok.any():
            e = np.zeros((int(ok.sum()), dim), dtype=np.float64)
            for r, x in enumerate(v[ok]):
                e[r, :] = x[:dim]
            dots = np.zeros((e.shape[0], cmat.shape[0]), dtype=np.float64)
            for i in range(dim):  # left-to-right per-row sums (parity)
                dots += e[:, i][:, None] * cmat[None, :, i]
            dots -= mudots[None, :]
            for r, idx in enumerate(np.nonzero(ok)[0]):
                res[int(idx)] = dots[r]
        return pd.Series(res)

    return (
        df.select(id_col, proj(F.col(vec_col)).alias("__p"))
        .filter(F.col("__p").isNotNull())
        .select(id_col, F.posexplode("__p").alias("dim_idx", "__v"))
        .select(id_col, "dim_idx", F.round("__v", 6).alias("value"))
    )


# ------------------------------------------------------------------- PQ

def pq_train(
    x: np.ndarray, m: int = 4, n_codes: int = 16, iters: int = 5
) -> np.ndarray:
    """Product-quantization codebooks: split the dimension into ``m``
    equal subspaces and run the same deterministic Lloyd k-means as the
    IVF coarse quantizer (``kmeans_centroids``) in each.  Returns
    (m, n_codes, dim/m).  PQ is the memory half of the 10^12-row ANN
    recipe (IVF prunes FILES, PQ shrinks what's scanned: a 64-dim float
    vector -> m=4 byte codes, 64x smaller), after Jegou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"."""
    x = np.asarray(x, dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    return np.stack(
        [
            kmeans_centroids(x[:, j * dsub : (j + 1) * dsub], n_codes, iters)
            for j in range(m)
        ]
    )


def _pq_subdists(sub: np.ndarray, cb_j: np.ndarray) -> np.ndarray:
    """Rounded squared-L2 distances (rows x n_codes) of subvectors to
    one subspace codebook.  Rounded to 9 decimals BEFORE any argmin /
    lookup so the DuckDB oracle (sequential left-to-right sums) and
    numpy (pairwise sums) agree bit-for-bit at the precision that
    matters; evaluation uses the plain expanded sum, no BLAS tricks."""
    d = ((sub[:, None, :] - cb_j[None, :, :]) ** 2).sum(axis=2)
    return np.round(d, 9)


def _pq_encode_udf(codebooks: np.ndarray):
    """Arrow-batched encode kernel: per-subspace 1-BASED argmin (first
    index on ties) of the rounded squared L2 — shared by ``pq_encode``
    and ``ivf_pq_topk``.  The codebooks ride the serialized closure
    (a few KB) — at real scale wrap them in a broadcast."""
    m, n_codes, dsub = codebooks.shape
    cb = codebooks

    @F.pandas_udf("array<int>")
    def enc(s: pd.Series) -> pd.Series:
        n = len(s)
        if not n:
            return pd.Series([], dtype=object)
        # NULL / wrong-dim rows -> NULL codes (same ok-mask degradation
        # as pair_cosine_arrow): one bad embedding must not crash the
        # whole encode batch with a ragged-array subspace slice
        ok = np.fromiter(
            (v is not None and len(v) == m * dsub for v in s),
            dtype=bool,
            count=n,
        )
        out = [None] * n
        if ok.any():
            xs = np.stack(
                [np.asarray(v, dtype=np.float64) for v, o in zip(s, ok) if o]
            )
            codes = np.empty((len(xs), m), dtype=np.int32)
            for j in range(m):
                d = _pq_subdists(xs[:, j * dsub : (j + 1) * dsub], cb[j])
                codes[:, j] = d.argmin(axis=1) + 1  # 1-based
            for i, pos in enumerate(np.flatnonzero(ok)):
                out[pos] = codes[i]
        return pd.Series(out, dtype=object)

    return enc


def _pq_lut_udf(codebooks: np.ndarray):
    """Arrow-batched query-LUT kernel: lut[j][c] = rounded squared L2
    from the query's j-th subvector to centroid c — shared by
    ``pq_adc_topk`` and ``ivf_pq_topk``."""
    m, n_codes, dsub = codebooks.shape
    cb = codebooks

    @F.pandas_udf("array<array<double>>")
    def lut_udf(s: pd.Series) -> pd.Series:
        n = len(s)
        if not n:
            return pd.Series([], dtype=object)
        # NULL / wrong-dim queries -> NULL LUTs (ok-mask degradation,
        # see _pq_encode_udf)
        ok = np.fromiter(
            (v is not None and len(v) == m * dsub for v in s),
            dtype=bool,
            count=n,
        )
        out = [None] * n
        if ok.any():
            xs = np.stack(
                [np.asarray(v, dtype=np.float64) for v, o in zip(s, ok) if o]
            )
            luts = np.stack(
                [
                    _pq_subdists(xs[:, j * dsub : (j + 1) * dsub], cb[j])
                    for j in range(m)
                ],
                axis=1,
            )  # (rows, m, n_codes)
            for i, pos in enumerate(np.flatnonzero(ok)):
                out[pos] = [list(map(float, r)) for r in luts[i]]
        return pd.Series(out, dtype=object)

    return lut_udf


def _pq_adc_expr(m: int) -> Column:
    """ADC score: sum_j lut[j][code_j] via zip_with + aggregate —
    whole-stage codegen, sequential left-to-right double sum (matches
    the DuckDB oracle's + chain)."""
    return F.round(
        F.aggregate(
            F.zip_with("lut", "code", lambda l, c: F.element_at(l, c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code): per-subspace index (1-BASED, matching SQL
    list_indexof) of the nearest codebook centroid — argmin of the
    rounded squared L2, first index on ties.  Arrow-batched vectorized
    UDF (never per-row Python)."""
    enc = _pq_encode_udf(codebooks)
    return df.select(
        F.col(id_col), enc(F.col(vec_col)).alias("code")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) approximate top-k over PQ codes:

    1. corpus -> per-subspace codes (``pq_encode``; at scale this is a
       PRECOMPUTED stored column — the whole point of PQ is that the
       scan reads m small ints per row, not the float vector);
    2. each query builds its lookup table lut[j][c] = squared L2 from
       its j-th subvector to centroid c (m x n_codes doubles — tiny);
    3. score(q, row) = sum_j lut[j][code_j]: a zip_with + aggregate over
       broadcast query LUTs — whole-stage codegen, corpus scanned once
       for ALL queries, no distance recomputation;
    4. per-query top-k by (adc asc, neighbor_id) — WindowGroupLimit
       prunes map-side.

    Output: (query_id, neighbor_id, adc, rk); adc is the rounded
    approximate squared L2 (smaller = nearer)."""
    m, n_codes, dsub = codebooks.shape
    codes = pq_encode(corpus, codebooks, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    lut_udf = _pq_lut_udf(codebooks)
    ql = queries.select(
        F.col(id_col).alias("query_id"), lut_udf(F.col(vec_col)).alias("lut")
    )
    # NULL codes/LUTs mark degraded bad rows (NULL or wrong-dim
    # embeddings) — drop them, or their NULL adc would still rank
    cand = (
        codes.filter(F.col("code").isNotNull())
        .crossJoin(F.broadcast(ql.filter(F.col("lut").isNotNull())))
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = _pq_adc_expr(m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("adc", adc)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc", "rk")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ — the composed 10^12-row ANN recipe (FAISS IVFPQ /
    Jegou 2011 §V): the coarse quantizer PRUNES (queries touch only
    ``nprobe`` of the cells — at scale, cells are the snapshot
    partition key and pruning happens at the FILE level, see
    ops/ivf_store), PQ SHRINKS what the probe scans (m small-int codes
    per row instead of the float vector) and scores it with
    ADC lookup-table sums.

    Plan: cell assignment + code encoding are narrow maps over the
    corpus; probes broadcast (query LUTs ride along); the candidate
    join is a broadcast hash join on cell; scoring is zip_with +
    aggregate in codegen; per-query top-k via WindowGroupLimit.  The
    corpus is never shuffled.

    Output: (query_id, neighbor_id, adc, rk) — adc ascending (smaller
    = nearer), deterministic (adc, neighbor_id) tiebreak."""
    m, n_codes, dsub = codebooks.shape
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    enc = _pq_encode_udf(codebooks)
    coded = cells.select(
        "neighbor_id", "cell", enc(F.col("cvec")).alias("code")
    )
    lut_udf = _pq_lut_udf(codebooks)
    qc = _with_centroid_cos(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        ),
        "qvec",
        centroids,
    ).withColumn("lut", lut_udf(F.col("qvec"))).select(
        "query_id", "lut", F.posexplode(F.col("__cos")).alias("cell0", "ccos")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("cell0").asc()
    )
    probes = (
        qc.withColumn("prk", F.row_number().over(w_probe))
        .filter(F.col("prk") <= nprobe)
        .select("query_id", "lut", (F.col("cell0") + 1).alias("cell"))
    )
    # NULL codes/LUTs mark degraded bad rows (see pq_adc_topk)
    cand = (
        coded.filter(F.col("code").isNotNull())
        .join(
            F.broadcast(probes.filter(F.col("lut").isNotNull())), "cell"
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = _pq_adc_expr(m)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("adc", adc)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc", "rk")
    )
