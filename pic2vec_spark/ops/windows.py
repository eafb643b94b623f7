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


def rolling_rows_agg(
    df: DataFrame,
    n: int,
    col: str = "value",
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Trailing-N-ROWS statistics per entity timeline — the
    "mean/std/min/max of the last n observations" feature family
    (complements ``sliding_range_agg``, which is time-based: a RANGE
    frame answers "last hour", a ROWS frame answers "last 5 events"
    regardless of event spacing).  Frame = ROWS BETWEEN n-1 PRECEDING
    AND CURRENT ROW ordered by (ts, tiebreak): deterministic frames,
    zero leakage (only rows at or before the current one), one
    entity-hash exchange, whole-stage window aggregation.

    Adds ``roll_n / roll_mean / roll_min / roll_max / roll_std``
    (sample stddev; NULL for single-row frames — both engines agree).
    NULL values are skipped by every aggregate, matching SQL."""
    if n < 1:
        raise ValueError(f"rolling window n must be >= 1, got {n}")
    w = entity_window(on, ts, tiebreak).rowsBetween(-(n - 1), 0)
    return df.withColumns(
        {
            "roll_n": F.count(col).over(w),
            "roll_mean": F.round(F.avg(col).over(w), 6),
            "roll_min": F.min(col).over(w),
            "roll_max": F.max(col).over(w),
            "roll_std": F.round(F.stddev_samp(col).over(w), 6),
        }
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


def resample_interpolate(
    df: DataFrame,
    step_s: int,
    value_col: str = "value",
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    start_us: int | None = None,
    end_us: int | None = None,
) -> DataFrame:
    """Resample each entity's irregular observations onto a regular
    time grid with LINEAR interpolation between the two surrounding
    observations — the missing member of the fill family
    (``forward_fill`` holds the last value, ``backward_fill`` the next;
    this one draws the line between them).  Sensor/price timelines
    joining a fixed-cadence training grid want the interpolated level,
    not a stale hold.

    Grid points are epoch-aligned multiples of ``step_s`` covering
    ``[start_us, end_us]`` (derived from ``df`` when not given, one
    2-scalar aggregate).  For a grid instant ``g``:

    - observation exactly at ``g`` → its value (last by ``tiebreak``
      when several share the timestamp);
    - ``prev < g < next`` → ``prev_v + (next_v - prev_v) *
      (g - prev_ts) / (next_ts - prev_ts)`` (all µs doubles);
    - ``g`` outside the entity's observed span → NULL (interpolation
      never extrapolates; compose with ``forward_fill`` for a trailing
      hold).

    Note the ``next`` observation is read: like ``backward_fill`` this
    is an imputation op, not a point-in-time feature source.

    Scale shape: grid rows are a narrow per-entity
    ``explode(sequence(...))`` (no shuffle, no driver materialization);
    obs ∪ grid then takes ONE entity-hash exchange and two framed
    passes of the same sorted window (running last + running first) —
    never a join, never quadratic in observations per entity.  Output:
    ``(on, ts, {value_col}_interp)``, one row per entity × grid point.
    """
    if step_s <= 0:
        raise ValueError("step_s must be positive")
    step_us = int(step_s * 1_000_000)
    if start_us is None or end_us is None:
        row = df.agg(F.min(_us(F.col(ts))), F.max(_us(F.col(ts)))).first()
        if row[0] is None:
            raise ValueError("df has no rows to derive grid bounds")
        start_us = start_us if start_us is not None else int(row[0])
        end_us = end_us if end_us is not None else int(row[1])
    g0 = (start_us // step_us) * step_us
    if end_us < g0:
        raise ValueError("grid is empty (end < aligned start)")

    tb = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    obs = df.select(
        F.col(on).alias("__e"),
        _us(F.col(ts)).alias("__tu"),
        F.lit(0).alias("__side"),
        tb.alias("__tb"),
        F.col(value_col).cast("double").alias("__v"),
    )
    grid = (
        df.select(on).distinct()
        .select(
            F.col(on).alias("__e"),
            F.explode(
                F.sequence(F.lit(g0), F.lit(end_us), F.lit(step_us))
            ).alias("__tu"),
            F.lit(1).alias("__side"),
            F.lit(None).cast("long").alias("__tb"),
            F.lit(None).cast("double").alias("__v"),
        )
    )
    # one sorted pass: obs sort BEFORE the grid row at an equal
    # timestamp (side 0 < 1), so an exact-timestamp observation is the
    # running-last "prev" (distance 0 → its own value) and the running
    # -first "next" frame starts strictly after the instant
    w = Window.partitionBy("__e").orderBy("__tu", "__side", "__tb")
    prev = F.last(
        F.when(F.col("__side") == 0, F.struct("__tu", "__v")), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    nxt = F.first(
        F.when(F.col("__side") == 0, F.struct("__tu", "__v")), ignorenulls=True
    ).over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    ts_type = df.schema[ts].dataType
    out = (
        obs.unionByName(grid)
        .withColumn("__p", prev)
        .withColumn("__n", nxt)
        .filter(F.col("__side") == 1)
    )
    val = (
        F.when(F.col("__p").isNull(), F.lit(None).cast("double"))
        .when(F.col("__p.__tu") == F.col("__tu"), F.col("__p.__v"))
        .when(F.col("__n").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.col("__p.__v")
            + (F.col("__n.__v") - F.col("__p.__v"))
            * (F.col("__tu") - F.col("__p.__tu"))
            / (F.col("__n.__tu") - F.col("__p.__tu"))
        )
    )
    return out.select(
        F.col("__e").alias(on),
        F.timestamp_micros(F.col("__tu")).cast(ts_type).alias(ts),
        val.alias(f"{value_col}_interp"),
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str = "value",
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
    out_col: str = "twap",
) -> DataFrame:
    """Time-weighted average per entity — the trapezoidal integral of
    the piecewise-linear value curve over the entity's observed span,
    divided by the span.  The plain ``avg`` over-weights bursts of
    closely-spaced observations; TWAP weights each value by how long
    it was in force, which is what sensor levels, prices, and queue
    depths mean by "average".

    ``twap = Σ (vᵢ + vᵢ₊₁)/2 · (tᵢ₊₁ - tᵢ) / (t_max - t_min)`` over
    consecutive observations in ``(ts, tiebreak)`` order; an entity
    whose span is zero (a single observation, or all at one instant)
    degrades to the plain average at that instant.  Equal-timestamp
    segments contribute zero width, so the tiebreak affects only which
    value anchors the adjacent segments — pass one for determinism.

    Scale shape: one entity-hash exchange for the sorted lag window;
    the per-entity aggregate reuses the same partitioning (no second
    exchange).  Output: one row ``(on, n_obs, {out_col})`` per entity.
    """
    w = entity_window(on, ts, tiebreak)
    tu = _us(F.col(ts))
    v = F.col(value_col).cast("double")
    seg = (v + F.lag(v).over(w)) / 2.0 * (tu - F.lag(tu).over(w)).cast("double")
    x = df.select(
        F.col(on), tu.alias("__tu"), v.alias("__v"), seg.alias("__seg")
    )
    span = F.max("__tu") - F.min("__tu")
    return x.groupBy(on).agg(
        F.count("__v").alias("n_obs"),
        F.when(span > 0, F.sum("__seg") / span.cast("double"))
        .otherwise(F.avg("__v"))
        .alias(out_col),
    )


def ohlc_agg(
    df: DataFrame,
    bucket_s: int,
    value_col: str = "value",
    on: str = "entity_id",
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Open/high/low/close downsample: one row per entity × tumbling
    ``bucket_s`` bucket with the first, max, min, and last observation
    of the bucket plus the observation count — the lossless-enough
    summary a price/sensor timeline keeps when the raw tick stream is
    too big to retain.

    Open/close are deterministic under ``(ts, tiebreak)`` order (pass a
    tiebreak when timestamps can collide).  Implemented as max/min of
    ``struct(ts, tiebreak, value)`` — a single hash aggregate with
    map-side partial combine, NO window sort: the struct's
    lexicographic order finds the first/last row per group in one
    pass, so the shuffle carries one partial row per (entity, bucket)
    per mapper instead of the raw stream.  Output: ``(on, bucket_start
    [same type as ts], open, high, low, close, n_obs)``.
    """
    if bucket_s <= 0:
        raise ValueError("bucket_s must be positive")
    step_us = int(bucket_s * 1_000_000)
    tu = _us(F.col(ts))
    tb = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    v = F.col(value_col).cast("double")
    ts_type = df.schema[ts].dataType
    x = df.select(
        F.col(on),
        (tu - (tu % step_us)).alias("__b"),
        F.struct(tu.alias("t"), tb.alias("k"), v.alias("v")).alias("__s"),
        v.alias("__v"),
    )
    return (
        x.groupBy(on, "__b")
        .agg(
            F.min("__s").getField("v").alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max("__s").getField("v").alias("close"),
            F.count("__v").alias("n_obs"),
        )
        .select(
            on,
            F.timestamp_micros(F.col("__b")).cast(ts_type).alias("bucket_start"),
            "open", "high", "low", "close", "n_obs",
        )
    )


# fast-path domain for decayed_sum: rows further than this many tau
# below the entity's max ts would hit exp overflow/underflow in the
# factored prefix form (double overflows near exp(709))
DECAY_SAFE_TAU = 600.0


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
    Anchoring exponents at the per-entity max keeps every stored weight
    finite, so the RECENT rows (within ``DECAY_SAFE_TAU`` tau of the
    entity's max ts) are exact at any history span.  Rows older than
    that would hit double overflow in the factored form (exp(-rel)
    -> inf while the prefix underflows -> NaN), so they are explicitly
    NULLed — use ``decayed_sum_grouped`` when you need exact values
    over unbounded spans.  Round-6 output for engine-portable
    comparison."""
    w = entity_window(on, ts, tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    whole = Window.partitionBy(on)
    t_us = _us(F.col(ts))
    t0_us = F.max(t_us).over(whole)
    rel = (t_us - t0_us).cast("double") / F.lit(tau_s * 1e6)
    weighted = F.col(value_col) * F.exp(rel)
    safe = rel >= -DECAY_SAFE_TAU
    return df.withColumn(
        out_col,
        F.when(safe, F.round(F.exp(-rel) * F.sum(weighted).over(run), 6)),
    )


def decayed_sum_grouped(
    df: DataFrame,
    tau_s: float,
    on: str = "entity_id",
    ts: str = "ts",
    value_col: str = "value",
    tiebreak: str | None = None,
    out_col: str = "decayed_sum",
) -> DataFrame:
    """Exact decayed running sum at ANY history span — the fallback for
    histories wider than ``DECAY_SAFE_TAU`` tau.

    ``applyInPandas`` per entity with SEGMENTED anchoring: the history
    splits into fixed 300-tau time buckets; within a bucket the prefix
    uses bucket-max-anchored exponents (bounded arguments), and the
    carry across buckets decays by ``exp(-(t - prev_end)/tau)`` whose
    argument is always <= 0.  Vectorized per segment — the only Python
    loop is over segments, not rows.

    ``tiebreak`` orders rows with equal timestamps (same contract as
    ``decayed_sum``); without it, equal-ts running values inherit
    Spark's nondeterministic partition order."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    seg_span = 300.0 * tau_s

    sort_cols = [ts] + ([tiebreak] if tiebreak else [])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        if np.issubdtype(pdf[ts].dtype, np.number):
            t = pdf[ts].to_numpy(np.float64)
        else:
            t = pd.to_datetime(pdf[ts]).astype("int64").to_numpy() / 1e9
        v = pdf[value_col].to_numpy(np.float64)
        s = np.empty(len(pdf))
        seg = np.floor((t - t[0]) / seg_span).astype(np.int64)
        carry, carry_t = 0.0, t[0]
        for sid in pd.unique(seg):
            m = seg == sid
            ts_s, vs = t[m], v[m]
            a = ts_s[-1]  # sorted: segment max
            local = np.exp(-(ts_s - a) / tau_s) * np.cumsum(
                vs * np.exp((ts_s - a) / tau_s)
            )
            s[m] = local + carry * np.exp(-(ts_s - carry_t) / tau_s)
            carry, carry_t = s[m][-1], ts_s[-1]
        out = pdf.copy()
        out[out_col] = np.round(s, 6)
        return out

    return df.groupBy(on).applyInPandas(fn, schema=schema)


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
