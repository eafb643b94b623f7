"""Skew-handling utilities.

The north rule calls for "salted repartition for hot phash buckets".
In this engine the FIRST line of defense for duplicate-heavy image
tables is the content-digest dedup before the CNN (identical bytes
collapse to one row, so a million-copy hot image costs one forward
pass).  Salting remains the tool for *residual* skew — e.g. a phash
bucket of near-identical-but-distinct images, or any per-row stage fed
by a skewed key:

- ``salted_repartition``: spread rows of hot keys across ``salt``
  sub-buckets.  ONLY safe for order-free per-row stages (decode, CNN,
  thumbnailing) — never for ordered windows (the as-of join's
  running-last chain must see each entity unsplit; see ops/asof.py).
- ``hot_keys``: find keys above a frequency threshold (to salt only the
  hot side of a join, the classic skew-join split that AQE also
  performs automatically when spark.sql.adaptive.skewJoin is on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str,
    num_partitions: int | None = None,
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Repartition by (key, random salt in [0, salt)) so one hot key
    lands in up to ``salt`` partitions instead of one."""
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism * 2
    salt_col = (F.rand(seed) * salt).cast("int")
    return df.repartition(n, F.col(key), salt_col)


def hot_keys(df: DataFrame, key: str, min_count: int) -> DataFrame:
    """Keys whose row count is >= min_count (candidates for salting /
    broadcast-side replication in a skew-join split)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """One-row skew diagnostic for a prospective shuffle/join key — the
    health check to run BEFORE keying a 100 TB shuffle on a column:

    - ``n_rows`` / ``n_keys``: volume and key cardinality (NULL keys are
      their own group and counted: a mostly-NULL join key is itself the
      worst skew).
    - ``max_key_rows`` / ``skew_ratio`` (= max/mean rows per key): the
      headline number — a ratio of R means the hottest task runs ~R
      times longer than average; above ~4-8, plan salting / AQE skew
      split.
    - ``top_share``: fraction of all rows held by the ``top_n`` hottest
      keys (concentration).
    - ``gini``: Gini coefficient of the per-key row counts (0 uniform,
      ->1 concentrated), exact, computed from the sorted-rank identity
      ``(2*sum(i*c_i)/(n*sum(c)) - (n+1)/n)`` over keys ranked by count.

    Plan: one groupBy(key) count (the profile costs one pass of the key
    column — cheap next to the shuffle it de-risks), then rank/aggregate
    over the keys-sized count table.  All integer arithmetic until the
    final divisions, so the DuckDB oracle matches exactly."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    counts = df.groupBy(F.col(key)).agg(F.count(F.lit(1)).alias("__c"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("__c"), F.col(key).asc_nulls_first())
    ranked = counts.withColumn("__i", F.row_number().over(w))
    top = Window.orderBy(F.desc("__c"), F.col(key).asc_nulls_last())
    ranked = ranked.withColumn("__r", F.row_number().over(top))
    return ranked.agg(
        F.sum("__c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("__c").alias("max_key_rows"),
        F.round(
            F.max("__c") / (F.sum("__c") / F.count(F.lit(1))), 6
        ).alias("skew_ratio"),
        F.round(
            F.sum(F.when(F.col("__r") <= top_n, F.col("__c")).otherwise(0))
            / F.sum("__c"),
            6,
        ).alias("top_share"),
        F.round(
            (F.lit(2) * F.sum(F.col("__i") * F.col("__c")))
            / (F.count(F.lit(1)) * F.sum("__c"))
            - (F.count(F.lit(1)) + F.lit(1)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )
