"""Windowed timeline operators: lag/lead, forward-fill backfill,
gap-based sessionize, tumbling time-window aggregates, top-k per entity.

All operators are pure DataFrame expressions (whole-stage codegen,
no Python UDFs) over a single ``partitionBy(entity).orderBy(ts, tiebreak)``
window — one shuffle each, which AQE coalesces at small scale and which
scales out linearly with entity cardinality at 100 TB.

The reference has no time axis at all; these are the north-rule
additions layered over its featurization semantics (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _us(col: Column) -> Column:
    """Epoch microseconds; casts TIMESTAMP_NTZ -> TIMESTAMP (session TZ is
    pinned to UTC so the cast is wall-clock exact)."""
    return F.unix_micros(col.cast("timestamp"))


def entity_window(on: str = "entity_id", ts: str = "ts", tiebreak: str | None = None) -> WindowSpec:
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return Window.partitionBy(on).orderBy(*order)


def lag_lead(
    df: DataFrame,
    col: str,
    k: int = 1,
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Attach ``{col}_lag_k`` / ``{col}_lead_k`` per entity timeline."""
    w = entity_window(on, ts, tiebreak)
    return df.withColumn(f"{col}_lag_{k}", F.lag(col, k).over(w)).withColumn(
        f"{col}_lead_{k}", F.lead(col, k).over(w)
    )


def forward_fill(
    df: DataFrame,
    cols: list[str],
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backfill nulls with the latest prior non-null value per entity
    (``F.last ignorenulls`` over an unbounded-preceding running window)."""
    w = entity_window(on, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in cols:
        df = df.withColumn(f"{c}_ffill", F.last(c, ignorenulls=True).over(w))
    return df


def backward_fill(
    df: DataFrame,
    cols: list[str],
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Fill nulls with the NEXT non-null value per entity (the mirror of
    ``forward_fill``: ``F.first ignorenulls`` over current..unbounded
    following).  Useful for end-of-history imputation; note it reads
    future rows, so it must never feed point-in-time features."""
    w = entity_window(on, ts, tiebreak).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    for c in cols:
        df = df.withColumn(f"{c}_bfill", F.first(c, ignorenulls=True).over(w))
    return df


def decayed_sum(
    df: DataFrame,
    tau_s: float,
    on: str = "entity_id",
    ts: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
    out_col: str = "decayed_sum",
) -> DataFrame:
    """Exponentially time-decayed running sum per entity:
    ``S(t) = sum_{t_i <= t} v_i * exp(-(t - t_i) / tau)`` — the standard
    recency-weighted feature (EWMA-style) for training pipelines.

    Single sorted window pass, no UDF: with T0 = the entity's max ts,
    ``S(t) = exp(-(t-T0)/tau) * cumsum(v_i * exp((t_i-T0)/tau))``.
    Anchoring exponents at the per-entity max keeps every ``exp``
    argument <= 0, so nothing overflows at any history span (very old
    rows underflow to a zero contribution, which is also their true
    weight).  Round-6 output for engine-portable comparison."""
    w = entity_window(on, ts, tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy(on)
    t_us = _us(F.col(ts))
    t0_us = F.max(t_us).over(whole)
    rel = (t_us - t0_us).cast("double") / F.lit(tau_s * 1e6)
    weighted = F.col(value_col) * F.exp(rel)
    return df.withColumn(
        out_col, F.round(F.exp(-rel) * F.sum(weighted).over(run), 6)
    )


def entity_zscore(
    df: DataFrame,
    value_col: str = "value",
    on: str = "entity_id",
    out_col: str | None = None,
) -> DataFrame:
    """Per-entity z-score normalization (value minus the entity's mean,
    over its population stddev) — the standard per-group feature
    scaling.  One whole-partition window (no ordering needed), all
    JVM-side; entities with zero variance yield null.  Round-6 output
    for engine-portable comparison."""
    w = Window.partitionBy(on)
    mean = F.avg(value_col).over(w)
    std = F.stddev_pop(value_col).over(w)
    z = F.when(std > 0, (F.col(value_col) - mean) / std)
    return df.withColumn(out_col or f"{value_col}_z", F.round(z, 6))


def sessionize(
    df: DataFrame,
    gap_s: float,
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    when the time since the previous event of the same entity exceeds
    ``gap_s`` seconds. ``session_id`` is a per-entity 0-based counter."""
    w = entity_window(on, ts, tiebreak)
    run = entity_window(on, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = int(gap_s * 1_000_000)
    prev_ts = F.lag(ts).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (_us(F.col(ts)) - _us(prev_ts) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn("__new_sess", is_new).withColumn(
        session_col, (F.sum("__new_sess").over(run) - F.lit(1)).cast("bigint")
    ).drop("__new_sess")


def tumbling_agg(
    df: DataFrame,
    window_s: int,
    aggs: dict[str, tuple[str, str]],
    on: str = "entity_id",
    ts: str = "ts",
) -> DataFrame:
    """Tumbling time-window aggregates per entity.

    ``aggs`` maps output alias -> (function name, column), e.g.
    ``{"n_events": ("count", "*"), "avg_value": ("avg", "value")}``.
    Window start is emitted as epoch microseconds (``window_start_us``)
    so results hash identically to the DuckDB oracle.
    """
    win = F.window(F.col(ts).cast("timestamp"), f"{window_s} seconds")
    exprs = []
    for alias, (fn, col) in aggs.items():
        exprs.append(getattr(F, fn)(F.lit(1) if col == "*" else F.col(col)).alias(alias))
    return (
        df.groupBy(F.col(on), win.alias("__w"))
        .agg(*exprs)
        .withColumn("window_start_us", _us(F.col("__w.start")))
        .drop("__w")
    )


def sliding_range_agg(
    df: DataFrame,
    window_s: int,
    on: str = "entity_id",
    ts: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Trailing sliding window per event row: count + round-4 avg of
    ``value_col`` over ``[ts - window_s, ts]`` within the same entity.

    A RANGE frame over epoch-microseconds (numeric order key, so the
    frame bound is exact and engine-portable; RANGE includes equal-ts
    peers per the SQL standard).  One shuffle on the entity key; the
    frame is evaluated in a single sorted pass (no self-join — the
    naive range-join formulation would shuffle |df| x window rows).
    Output columns: ``n_{H}h`` / ``avg_{H}h`` for window_s = H hours.
    """
    tag = f"{window_s // 3600}h" if window_s % 3600 == 0 else f"{window_s}s"
    w = (
        Window.partitionBy(on)
        .orderBy(_us(F.col(ts)))
        .rangeBetween(-window_s * 1_000_000, 0)
    )
    return df.withColumn(f"n_{tag}", F.count(F.col(value_col)).over(w)).withColumn(
        f"avg_{tag}", F.round(F.avg(F.col(value_col)).over(w), 4)
    )


def topk_per_entity(
    df: DataFrame,
    order_col: str,
    k: int,
    on: str = "entity_id",
    tiebreak: str | None = None,
    desc: bool = True,
) -> DataFrame:
    """Top-k rows per entity by ``order_col`` (rank column ``rk``)."""
    order = [F.col(order_col).desc() if desc else F.col(order_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(on).orderBy(*order)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
