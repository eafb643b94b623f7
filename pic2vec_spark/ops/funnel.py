"""Ordered-funnel and event-transition operators over entity timelines.

Classic product-analytics operators the reference has no notion of (it
has no time axis; SURVEY.md §2.5 is the north-rule extension point these
belong to):

- ``funnel_stages``: for an ordered list of step event-types, find each
  entity's earliest strictly-increasing completion timestamp per step
  (step k+1 must happen strictly after step k).
- ``event_transitions``: the first-order Markov transition counts
  (prev event_type -> event_type) over each entity's ordered timeline.

Scale design (100 TB):
- ``funnel_stages`` is K chained *conditional aggregations*: stage k
  reads only events of ``steps[k]`` (predicate pushed to the scan),
  joins the per-entity stage-(k-1) table — entity-level, dimension-sized
  after the first aggregation, so AQE broadcasts it — and takes a
  partially-aggregatable MIN.  No ``collect_list`` of per-entity
  timelines (hot entities would blow memory), no window over the full
  event stream: the only shuffles are K entity-keyed aggregations over
  *filtered* inputs.
- ``event_transitions`` is one entity window (lag) plus one grouped
  count — two shuffles, the second over at most |types|² rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pic2vec_spark.ops.windows import entity_window


def funnel_stages(
    df: DataFrame,
    steps: list[str],
    on: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-entity ordered funnel: ``step{k}_us`` is the earliest timestamp
    of ``steps[k]`` strictly after ``step{k-1}_us`` (step0 is the plain
    per-entity MIN).  ``stage`` counts completed steps.

    Entities that never reach step 0 are absent from the output (the
    funnel is defined over entrants).  Timestamps are epoch microseconds
    so the driver gate's hash is timezone-proof.
    """
    if not steps:
        raise ValueError("funnel_stages: steps must be non-empty")
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))

    stage = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(on)
        .agg(F.min(ts_us).alias("step0_us"))
    )
    for k in range(1, len(steps)):
        prev = f"step{k - 1}_us"
        # entity-level stage table is dimension-sized after the groupBy;
        # AQE broadcasts it, so each round adds one filtered-scan + one
        # entity-keyed MIN aggregation, never a full-events shuffle.
        candidates = (
            df.filter(F.col(type_col) == steps[k])
            .select(F.col(on), ts_us.alias("__ts_us"))
            .join(stage, on, "inner")
            .filter(F.col("__ts_us") > F.col(prev))
            .groupBy(on)
            .agg(F.min("__ts_us").alias(f"step{k}_us"))
        )
        stage = stage.join(candidates, on, "left")

    stage_expr = sum(
        (F.col(f"step{k}_us").isNotNull().cast("int") for k in range(len(steps))),
        F.lit(0),
    )
    return stage.withColumn("stage", stage_expr)


def event_transitions(
    df: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order transition counts over each entity's ordered timeline:
    one row per (prev_type, next_type) with the global count ``n`` and
    the row-transition probability ``p`` given prev_type (rounded to 6
    decimals; deterministic because counts are exact integers).

    First events per entity (no predecessor) are dropped.
    """
    w = entity_window(on, ts, tiebreak)
    pairs = (
        df.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_prev = F.sum("n").over(Window.partitionBy("prev_type"))
    return pairs.withColumn("p", F.round(F.col("n") / w_prev, 6))


def touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First- AND last-touch attribution over entity timelines: for
    every conversion event, which earlier event type (the "channel")
    gets the credit — the standard product-analytics allocation of
    conversion value to preceding touches.  "Earlier" is the strict
    deterministic order ``(ts, tiebreak_col)``; touches are all
    non-conversion events of the same user; a conversion with no prior
    touch credits the ``(none)`` channel.

    Output: one row per conversion — ``(user, ts, value,
    first_touch, last_touch)`` — aggregate with
    :func:`attribution_summary`.

    Plan shape: ONE per-user window pass (``first``/``last`` with
    ignorenulls over ROWS UNBOUNDED PRECEDING .. 1 PRECEDING) — no
    self-join, no per-conversion probe; the single shuffle is the
    entity key, the same partitioning every other timeline op here
    reuses.  (The oracle deliberately uses the OPPOSITE formulation —
    a conversion×touch join with ROW_NUMBER argmin/argmax — so the
    window semantics are pinned independently.)"""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col) != conversion_type, F.col(type_col)
    )
    out = (
        df.withColumn("__first", F.first(touch, ignorenulls=True).over(w))
        .withColumn("__last", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
    )
    return out.select(
        user_col,
        ts_col,
        tiebreak_col,
        value_col,
        F.coalesce("__first", F.lit("(none)")).alias("first_touch"),
        F.coalesce("__last", F.lit("(none)")).alias("last_touch"),
    )


def attribution_summary(
    attributed: DataFrame, value_col: str, model: str = "first"
) -> DataFrame:
    """Per-channel rollup of :func:`touch_attribution` output:
    conversion count + exact-decimal attributed value (round-6), for
    ``model`` in {'first', 'last'} — a tiny |channels|-row frame."""
    if model not in ("first", "last"):
        raise ValueError(f"model must be 'first' or 'last', got {model}")
    ch = f"{model}_touch"
    return (
        attributed.groupBy(F.col(ch).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"),
                6,
            ).alias("attributed_value"),
        )
        .withColumn("model", F.lit(model))
    )
