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
