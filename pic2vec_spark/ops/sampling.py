"""Deterministic sampling / splitting operators for training pipelines.

Train/test assignment and per-stratum sampling at 10^12 scale must be
(a) reproducible across runs and engines, (b) stable under re-partitions
and incremental appends (a row's split never changes when new data
arrives), and (c) free of driver-side state.  Both operators here derive
every decision from md5 of the row's own key — no RNG, no global sort,
no collect — so the same row always lands in the same split/sample, and
the DuckDB oracle can recompute the assignment bit-for-bit.

(The reference has no sampling surface; these serve the training-data
pipeline layer, like ops/dedup and ops/text.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets): first 8 md5 hex digits of
    salt||key as an integer, mod buckets.  Portable: DuckDB computes the
    identical value via ('0x' || substr(md5(...), 1, 8))::BIGINT."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % buckets


def hash_split(
    df: DataFrame,
    key_col: str,
    test_pct: int = 10,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment: rows whose hash bucket
    (0-99) falls below ``test_pct`` are 'test', the rest 'train'.

    Narrow projection — no shuffle, no sampling pass; the expected test
    fraction is test_pct/100 with binomial concentration (exact at
    corpus scale).  Changing ``salt`` yields an independent split
    (cross-validation folds = k salts)."""
    if not 0 <= test_pct <= 100:
        raise ValueError(f"test_pct must be in 0..100, got {test_pct}")
    bucket = _hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        out_col,
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sample of ceil(fraction * n_stratum)
    rows — EXACT per-group proportions (unlike Bernoulli sampling, which
    only hits the fraction in expectation and can empty small strata).

    Rows are ranked inside each stratum by (md5(salt||key), key) — a
    uniform, reproducible order — and the top ceil(fraction*n) kept.
    One shuffle on the stratum key; count and rank share the single
    window partition.  Skew note: a hot stratum concentrates on one
    partition — acceptable because the per-row work is a hash compare;
    for pathological strata pre-split by a salted sub-key and union.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col)
    rk = F.row_number().over(w.orderBy(h.asc(), F.col(key_col).asc()))
    n = F.count(F.lit(1)).over(w)
    return (
        df.withColumn("__rk", rk)
        .withColumn("__n", n)
        .filter(F.col("__rk") <= F.ceil(F.lit(fraction) * F.col("__n")))
        .drop("__rk", "__n")
    )
