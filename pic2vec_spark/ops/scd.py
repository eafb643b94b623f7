"""SCD2 history compression (gaps-and-islands) + state reconstruction.

A feature store's change-log tables record one row per OBSERVATION
(entity, ts, values...) even when nothing changed.  ``scd2_compress``
collapses each maximal run of consecutive identical value tuples per
key into a single slowly-changing-dimension type-2 row with a validity
interval ``[valid_from, valid_to)`` — the classic warehouse pattern
for storing entity state compactly while preserving full point-in-time
reconstructability.  ``scd2_state_at`` is the inverse read: the exact
state of every entity as of a timestamp, by interval containment (a
narrow filter — no as-of join needed once history is compressed).

Scale shape (100 TB): one hash exchange on the keys; everything else
is window functions over that single partitioning (row_number, lag
change-flags, lead validity bounds — Spark reuses the exchange and
sort across all of them, asserted in tests).  Output size is the
number of CHANGES, not observations — for slowly-changing features
this is the 100-1000x compression that makes interval-filter state
reads cheap.  Null-safe comparison (``eqNullSafe``) means NULL->NULL
is "no change" and NULL->value is a change, deterministically.

Reference contrast: pic2vec recomputes features for every row of every
csv it is handed (image_featurizer.py:332, featurize_data) — it has no
notion of "the value did not change".  This module is the storage-side
half of the point-in-time layer built on top of that featurization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    ts: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse consecutive identical value tuples per key into SCD2
    validity intervals.

    Output: one row per island with the key columns, the value columns,
    and

    - ``valid_from``: ts of the island's first observation
    - ``valid_to``: ts of the NEXT island's first observation
      (exclusive bound), NULL for the key's current island
    - ``version``: 1-based island ordinal per key
    - ``n_obs``: observations collapsed into the island
    - ``is_current``: ``valid_to IS NULL``

    Equal-ts observations are ordered by ``tiebreak`` (recommended —
    without it equal-ts duplicates resolve by partition order and the
    result is only deterministic up to that order).  A value tuple that
    flips A->B->A yields THREE islands (it is a history compression,
    not a distinct).

    Plan: one hash exchange on ``keys``; row_number/lag/count and the
    post-filter lead/row_number all share that partitioning (no second
    exchange — asserted in tests/test_scd.py).
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    if not value_cols:
        raise ValueError("value_cols must name at least one column")
    missing = [c for c in [*keys, *value_cols, ts] if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    wp = Window.partitionBy(*keys)

    # change flag: first row per key, or any value column not null-safe
    # equal to its predecessor
    chg: Column = F.row_number().over(w) == 1
    for c in value_cols:
        chg = chg | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))

    obs = df.select(
        *keys,
        *value_cols,
        F.col(ts),
        *([F.col(tiebreak)] if tiebreak else []),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(wp).alias("__total"),
        chg.alias("__chg"),
    )
    starts = obs.filter(F.col("__chg"))
    return (
        starts.select(
            *keys,
            *value_cols,
            F.col(ts).alias("valid_from"),
            F.lead(F.col(ts)).over(w).alias("valid_to"),
            F.row_number().over(w).cast("long").alias("version"),
            (
                F.coalesce(
                    F.lead(F.col("__rn")).over(w), F.col("__total") + 1
                )
                - F.col("__rn")
            )
            .cast("long")
            .alias("n_obs"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_state_at(
    compressed: DataFrame,
    at,
    ts_from: str = "valid_from",
    ts_to: str = "valid_to",
) -> DataFrame:
    """Exact state of every entity as of timestamp ``at`` from an
    ``scd2_compress`` output: rows whose validity interval contains
    ``at`` (``valid_from <= at < valid_to``, open-ended current rows
    included).  A narrow filter — interval containment replaces the
    as-of join once history is compressed, which is the point of
    storing SCD2.  ``at`` is anything Spark can cast to the interval
    columns' timestamp type (cast matches ``valid_from``'s exact type,
    TIMESTAMP vs TIMESTAMP_NTZ, so no implicit coercion sneaks in).
    """
    at_c = F.lit(at).cast(compressed.schema[ts_from].dataType)
    return compressed.filter(
        (F.col(ts_from) <= at_c)
        & (F.col(ts_to).isNull() | (F.col(ts_to) > at_c))
    )
