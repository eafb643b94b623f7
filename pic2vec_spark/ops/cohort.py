"""Cohort-retention matrix over entity timelines.

``cohort_retention`` buckets each entity into a cohort by the week of
its first event and counts, for every (cohort_week, week_offset) cell,
how many distinct entities were active ``offset`` weeks after their
cohort week — the classic retention triangle.

Week index is ``floor(days_since(epoch_date) / 7)`` rather than
``date_trunc('week')`` so the bucketing is engine-neutral (no
Monday-vs-Sunday or ISO-week ambiguity between Spark and the DuckDB
oracle) and timezone-proof (dates, not timestamps).

Scale design (100 TB): one entity-keyed MIN aggregation (the cohort
table — dimension-sized, AQE broadcasts it back onto events), one
DISTINCT over (entity, cohort_week, week_offset) — the only
events-sized shuffle — then a tiny grouped count.  No windows, no
collect_list; hot entities cost nothing beyond their distinct
(entity, week) rows, which are bounded by the calendar, not by event
volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def week_index(ts_col, epoch_date: str = "2024-01-01"):
    """Engine-neutral week bucket: floor(days since epoch_date / 7)."""
    return F.floor(
        F.datediff(ts_col.cast("date"), F.lit(epoch_date).cast("date")) / 7
    ).cast("bigint")


def cohort_retention(
    df: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    epoch_date: str = "2024-01-01",
) -> DataFrame:
    """Retention triangle: (cohort_week, week_offset, n_users) with
    ``week_offset >= 0`` (events before an entity's first week cannot
    exist by construction).  ``n_users`` counts distinct entities of the
    cohort active in that offset week."""
    wk = week_index(F.col(ts), epoch_date)
    cohorts = df.groupBy(on).agg(F.min(wk).alias("cohort_week"))
    active = (
        df.select(F.col(on), wk.alias("active_week"))
        .join(cohorts, on, "inner")
        .select(
            on,
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
