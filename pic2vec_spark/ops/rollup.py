"""Hypertable-style rollup cascade + a deterministic distinct sketch.

``time_rollup`` / ``reaggregate``: the continuous-aggregate pattern
(TimescaleDB hypertable rollups, Druid/Pinot star-tree levels): raw
events aggregate once into fine buckets, coarser levels re-aggregate
the PARTIALS (sum of sums, count of counts, min of mins, max of maxes;
avg derived as sum/count at read time).  At 100 TB the raw table is
read once per fine bucket ever — every coarser query touches only the
rollup, which is orders of magnitude smaller.  All stats kept here are
re-aggregable by construction; non-decomposable stats (medians,
distinct counts) belong in sketches — see ``kmv_distinct``.

``kmv_distinct``: K-Minimum-Values distinct-count sketch.  Hash every
key to a uniform double in [0, 1) via an md5 prefix (DETERMINISTIC —
unlike HLL's implementation-specific sketches, two engines computing
KMV over md5 agree bit-for-bit, so the estimate itself is
oracle-checkable); keep each group's k smallest distinct hashes; if the
group has >= k distinct hashes the k-th smallest h_k estimates the
cardinality as (k-1)/h_k, else the count of distinct hashes IS the
exact cardinality.  The per-group state is k doubles — constant — and
the Spark plan keeps it bounded end-to-end: row_number over (group,
hash asc) is pruned map-side by WindowGroupLimit, so only O(k) rows
per group ever shuffle.  Standard error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_rollup(
    df: DataFrame,
    bucket: str = "hour",
    on: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Fine-grained rollup level over raw rows: one row per
    (entity, date_trunc(bucket, ts)) carrying re-aggregable partials.

    ``sum_value`` is summed over a per-row DECIMAL(18,6) cast (exact,
    order-proof — mirroring the pricing queries) so that the
    hourly-then-daily cascade is bit-identical to a direct daily sum
    regardless of partition order or level count; the partial stays
    DECIMAL through ``reaggregate`` and readers cast to double at the
    very end."""
    return (
        df.groupBy(
            F.col(on),
            F.date_trunc(bucket, F.col(ts).cast("timestamp")).alias("bucket_ts"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def reaggregate(
    rollup: DataFrame, bucket: str = "day", on: str = "user_id"
) -> DataFrame:
    """Coarser rollup level FROM a finer one — touches only the
    partials, never the raw table: count-of-counts, sum-of-sums,
    min-of-mins, max-of-maxes; avg derived at read time."""
    return (
        rollup.groupBy(
            F.col(on),
            F.date_trunc(bucket, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def hist_bin_col(
    value_col: str, lo: float, hi: float, n_bins: int
) -> Column:
    """The histogram bin expression shared by the batch rollup and the
    streaming producer (streaming.streaming_rollup) — ONE definition so
    the stream==batch partial-parity contract cannot drift."""
    if n_bins < 1 or hi <= lo:
        raise ValueError(f"need n_bins >= 1 and hi > lo, got {n_bins}, [{lo}, {hi})")
    return F.least(
        F.greatest(
            F.floor(
                (F.col(value_col) - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins)
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )


def hist_agg_exprs(n_bins: int, bin_col: str = "__bin") -> list[Column]:
    """The (n_events, hist) aggregate list over a bin column — shared
    with the streaming producer, same drift rationale as hist_bin_col."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.array(
            *[F.sum((F.col(bin_col) == i).cast("long")) for i in range(n_bins)]
        ).alias("hist"),
    ]


def histogram_rollup(
    df: DataFrame,
    bucket: str = "hour",
    on: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 50,
) -> DataFrame:
    """Fixed-boundary histogram sketch per (entity, time bucket) — the
    re-aggregable quantile carrier the plain rollup cascade lacks
    (medians/percentiles are non-decomposable; bin COUNTS are sums).

    Output: (on, bucket_ts, n_events, hist: array<long>[n_bins]).
    Values are clamped into [lo, hi); bin = floor((v-lo)/(hi-lo)*n_bins).
    DETERMINISTIC (like kmv_distinct, unlike t-digest/GK sketches whose
    merge order leaks into the estimate): two engines computing the same
    double arithmetic agree bin-for-bin, so the quantile ESTIMATE itself
    is oracle-checkable.  The agg is n_bins conditional sums — fully
    whole-stage-codegen, map-side partial, one shuffle; per-group state
    is n_bins longs, constant."""
    return (
        df.withColumn("__bin", hist_bin_col(value_col, lo, hi, n_bins))
        .groupBy(
            F.col(on),
            F.date_trunc(bucket, F.col(ts).cast("timestamp")).alias("bucket_ts"),
        )
        .agg(*hist_agg_exprs(n_bins))
    )


def histogram_reaggregate(
    rollup: DataFrame, bucket: str = "day", on: str = "user_id",
    n_bins: int = 50,
) -> DataFrame:
    """Coarser histogram level FROM a finer one: element-wise sum of the
    bin counts — touches only the partials, never the raw table, and is
    exactly lossless (counts are integers; cascade == direct is an
    identity, pinned in tests).

    ``n_bins`` must match the rollup that built ``hist`` — a mismatch
    raises at execution time (assert_true) instead of silently
    truncating the distribution or emitting null bins."""
    rollup = rollup.filter(
        F.coalesce(
            F.assert_true(
                F.size("hist") == n_bins,
                F.concat(
                    F.lit("histogram_reaggregate: hist has "),
                    F.size("hist").cast("string"),
                    F.lit(f" bins, expected n_bins={n_bins}"),
                ),
            ).cast("boolean"),
            F.lit(True),
        )
    )
    return (
        rollup.groupBy(
            F.col(on),
            F.date_trunc(bucket, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.array(
                *[F.sum(F.col("hist")[i]) for i in range(n_bins)]
            ).alias("hist"),
        )
    )


def histogram_quantile(
    hist_col: str | Column,
    q: float,
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 50,
) -> Column:
    """Quantile estimate from a fixed-boundary histogram column: the
    UPPER EDGE of the smallest bin whose cumulative count reaches
    ceil(q * total) — deterministic and exactly reproducible in ANSI
    SQL (a window cumsum + MIN(CASE...)), so unlike percentile_approx
    the result is oracle-checkable bit-for-bit.  Error is bounded by
    the bin width (hi-lo)/n_bins.

    Deliberately an interpreted HOF fold (the opposite call from the
    unrolled LSH expressions, ops/knn.py): this projection runs over
    ALREADY-AGGREGATED rollup rows — one per (entity, bucket), not per
    raw event — so per-row cost is irrelevant, while an unrolled
    cum-sum when-chain is O(n_bins^2) expression nodes and blows
    codegen/driver heap past ~64 bins.  The 100 TB hot path is the
    histogram_rollup agg, which IS flat codegen conditional sums."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    raw_h = F.col(hist_col) if isinstance(hist_col, str) else hist_col
    # n_bins must match the histogram that built the column: a mismatch
    # raises at execution time instead of reading a truncated/NULL-
    # padded distribution (wrong quantiles with no error)
    h = F.when(F.size(raw_h) == n_bins, raw_h).otherwise(
        F.raise_error(
            F.concat(
                F.lit("histogram_quantile: hist has "),
                F.size(raw_h).cast("string"),
                F.lit(f" bins, expected n_bins={n_bins}"),
            )
        )
    )
    zero = F.lit(0).cast("bigint")
    total = F.aggregate(h, zero, lambda a, x: a + x)
    target = F.ceil(F.lit(q) * total)
    # single scan: count bins whose cumulative stays BELOW the target —
    # that count is the 0-based index of the first bin reaching it.
    # `target` is itself an n_bins-term fold, so it is BOUND once as a
    # lambda variable (transform over a 1-element array) instead of
    # being re-evaluated inside every step of the scan — without the
    # binding the interpreted cost is O(n_bins^2) per row (measured
    # ~16x slower at 50 bins).
    below = F.transform(
        F.array(target),
        lambda t: F.aggregate(
            h,
            F.struct(zero.alias("cum"), F.lit(0).alias("below")),
            lambda acc, x: F.struct(
                (acc.cum + x).alias("cum"),
                (
                    acc.below + F.when(acc.cum + x < t, 1).otherwise(0)
                ).alias("below"),
            ),
            lambda acc: acc.below,
        ),
    )[0]
    width = (hi - lo) / n_bins
    return F.lit(lo) + (below + F.lit(1)).cast("double") * F.lit(width)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV approximate distinct count per group (see module docstring).

    Output: (group, n_hashes [= min(k, true distinct)], h_k,
    distinct_est rounded to 2).  Deterministic: same input -> same
    estimate, on any engine that computes md5 identically."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # 60-bit md5 prefix scaled to [0, 1) — the shared definition (see
    # sampling.md5_uniform60 for the cross-engine parity argument)
    from pic2vec_spark.ops.sampling import md5_uniform60

    h = md5_uniform60(F.col(key_col)).alias("h")
    # NULL keys hash to NULL and are dropped: Spark ranks NULLS FIRST
    # and DuckDB NULLS LAST, so a surviving NULL row would both inflate
    # the count and desync the two engines' kept sets
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col), h)
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    topk = hashes.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )
    return (
        topk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("h").alias("h_k"),
        )
        .select(
            group_col,
            "n_hashes",
            F.round("h_k", 12).alias("h_k"),
            F.round(
                F.when(
                    F.col("n_hashes") >= k, (F.lit(k) - 1) / F.col("h_k")
                ).otherwise(F.col("n_hashes").cast("double")),
                2,
            ).alias("distinct_est"),
        )
    )
