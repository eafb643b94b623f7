"""Robust per-group statistics: median absolute deviation + outlier counts.

``mad_outliers`` computes, per group, the exact median of a value
column, the median absolute deviation around it, and how many rows fall
outside ``med ± cutoff·MAD`` — the standard robust outlier screen for
training-data quality filtering (value columns with fat tails, sensor
glitches, scraped-price junk) where mean/stddev screens are themselves
dragged by the outliers they should catch.

Exact medians are deliberate: they make the op oracle-checkable
(DuckDB ``quantile_cont`` uses the same linear interpolation as Spark's
``percentile``).  At 100 TB, exact per-group percentiles are still fine
when group cardinality is bounded (the usual case: group = category /
event type / source); for unbounded groups swap ``F.percentile`` for
``percentile_approx`` — same plan shape, sketch-mergeable partials
(documented trade, not a silent default).

Plan: two grouped aggregations over the (group, value) projection plus
one join of the dimension-sized medians table back onto the rows (AQE
broadcasts it).  Column pruning keeps the scan at two columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(
    df: DataFrame,
    on: str = "event_type",
    value: str = "value",
    cutoff: float = 3.0,
) -> DataFrame:
    """Per-group robust stats: (group, n, med, mad, n_outliers) where
    ``med = exact median(value)``, ``mad = exact median(|value - med|)``
    and ``n_outliers`` counts rows with ``|value - med| > cutoff * mad``.
    NULL values are ignored by the percentile/count aggregates (SQL
    semantics on both engines).  med/mad are rounded to 6 decimals
    (engine-identical interpolation on doubles; rounding guards the
    display rendering, not the math)."""
    rows = df.select(F.col(on), F.col(value).cast("double").alias("__v"))
    med = rows.groupBy(on).agg(F.percentile("__v", F.lit(0.5)).alias("__med"))
    dev = rows.join(F.broadcast(med), on).withColumn(
        "__adev", F.abs(F.col("__v") - F.col("__med"))
    )
    mad = dev.groupBy(on).agg(F.percentile("__adev", F.lit(0.5)).alias("__mad"))
    return (
        dev.join(F.broadcast(mad), on)
        .groupBy(on)
        .agg(
            F.count("__v").alias("n"),
            F.round(F.first("__med"), 6).alias("med"),
            F.round(F.first("__mad"), 6).alias("mad"),
            F.sum(
                (F.col("__adev") > F.lit(cutoff) * F.col("__mad")).cast("bigint")
            ).alias("n_outliers"),
        )
    )
