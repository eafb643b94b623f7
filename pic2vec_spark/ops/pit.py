"""Point-in-time training-matrix assembly and temporal-leakage audit.

The north-star workload joins CNN feature vectors (and any other
feature sources) onto entity timelines with zero temporal leakage.
Real feature stores have MANY feature tables per entity; assembling a
training matrix by chaining k single-table as-of joins costs k window
exchanges (each union re-shuffles the spine).  ``asof_join_multi``
does the whole assembly in ONE shuffle: every feature table is tagged
into one union with per-table value/ts/tiebreak columns, one entity
exchange + one sorted window pass computes the running per-table
"last feature at-or-before" for all tables simultaneously.

Scale shape (100 TB): the single window shuffles by entity exactly
like ``asof_join`` — state per entity is the running last row of each
table's value columns (k × width scalars), independent of history
length; hot entities are mitigated the same way (compact each feature
table with ``compact_features`` before assembly, which shuffles by the
finer (entity, bucket) key).

``audit_point_in_time`` is the verification half of the contract: an
aggregate over a joined result that PROVES zero leakage (count of
matched rows whose feature ts exceeds the query ts — must be 0) and
quantifies staleness, all in exact integer microseconds so the result
is hash-comparable across engines.

Reference contrast: pic2vec has no notion of time; it aligns features
to rows positionally (pd.concat(axis=1),
/root/reference/pic2vec/image_featurizer.py:332).  This module is the
engine's replacement for that positional identity at feature-store
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join_multi(
    queries: DataFrame,
    features: dict[str, DataFrame],
    on: str = "entity_id",
    ts: str = "ts",
    tiebreaks: dict[str, str] | None = None,
) -> DataFrame:
    """Backward as-of join of ``queries`` against MANY feature tables in
    one window pass (one shuffle total, vs one per table when chaining
    ``asof_join``).

    ``features`` maps a short name -> feature DataFrame; every column of
    a feature table other than (``on``, ``ts``) is a value column and
    lands in the output as ``{col}_{name}``, with the matched feature
    row's timestamp as ``{ts}_{name}``.  Per-table semantics are exactly
    ``asof_join(direction='backward')``: latest feature with
    ``feature_ts <= query_ts`` (zero temporal leakage), equal-ts
    features visible, largest tiebreak among equal-ts rows of the SAME
    table wins, each value column independently carries its last
    non-null.  ``tiebreaks[name]`` names the table's deterministic
    tiebreak column (recommended; without it equal-ts duplicates within
    a table resolve by partition order).

    Output column names must not collide: a value column appearing in
    two tables is fine (suffixes differ), but ``{col}_{name}`` colliding
    with a query column raises.

    Plan: union(spine, tagged tables) -> ONE hash exchange on ``on`` ->
    ONE Window node computing every running-last -> filter spine rows.
    All expressions are built-in windowed aggregates (JVM, no UDF).
    """
    if not features:
        raise ValueError("features must name at least one table")
    tiebreaks = tiebreaks or {}
    q_cols = list(queries.columns)
    if on not in q_cols or ts not in q_cols:
        raise ValueError(f"queries must carry {on!r} and {ts!r}")

    names = list(features)
    val_map: dict[str, list[str]] = {}
    out_names: set[str] = set(q_cols)
    tagged: list[DataFrame] = []
    for name in names:
        fdf = features[name]
        vcols = [c for c in fdf.columns if c not in (on, ts)]
        val_map[name] = vcols
        for oc in [f"{ts}_{name}"] + [f"{c}_{name}" for c in vcols]:
            if oc in out_names:
                raise ValueError(
                    f"output column {oc!r} collides with an existing column"
                )
            out_names.add(oc)
        tie = (
            F.col(tiebreaks[name])
            if name in tiebreaks
            else F.monotonically_increasing_id()
        )
        # NULL entity keys never match (same rule as asof_join): dropped
        # here so the NULL window partition carries no features
        tagged.append(
            fdf.filter(F.col(on).isNotNull()).select(
                F.col(on),
                F.col(ts),
                F.lit(0).alias(_SIDE),
                tie.alias(f"__tie_{name}"),
                F.col(ts).alias(f"__ts_{name}"),
                *[F.col(c).alias(f"__v_{name}_{c}") for c in vcols],
            )
        )

    u = queries.select(*q_cols, F.lit(1).alias(_SIDE))
    for t in tagged:
        u = u.unionByName(t, allowMissingColumns=True)

    # features sort BEFORE equal-ts queries (side asc) so equal-ts
    # features are visible; per-table ties order only within their own
    # table's rows (other tables' tie columns are NULL there, and NULLS
    # FIRST is a constant offset within the group — harmless because the
    # running lasts of different tables live in disjoint columns)
    wb = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(),
            F.col(_SIDE).asc(),
            *[F.col(f"__tie_{n}").asc() for n in names],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    # one select -> ONE Window node for every running-last expression
    lasts = []
    for name in names:
        lasts.append(
            F.last(F.col(f"__ts_{name}"), ignorenulls=True)
            .over(wb)
            .alias(f"{ts}_{name}")
        )
        lasts.extend(
            F.last(F.col(f"__v_{name}_{c}"), ignorenulls=True)
            .over(wb)
            .alias(f"{c}_{name}")
            for c in val_map[name]
        )
    out = u.select("*", *lasts).filter(F.col(_SIDE) == 1)
    keep = q_cols + [
        c
        for name in names
        for c in [f"{ts}_{name}"] + [f"{v}_{name}" for v in val_map[name]]
    ]
    return out.select(*keep)


def backfill_grid(
    features: DataFrame,
    step_s: int,
    on: str = "entity_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    entities: DataFrame | None = None,
    start_us: int | None = None,
    end_us: int | None = None,
) -> DataFrame:
    """Point-in-time-correct backfill: materialize each entity's feature
    state at every point of a regular time grid (step ``step_s``
    seconds, aligned to epoch multiples of the step), via a backward
    as-of join — the training-matrix generation pattern of a feature
    store ("features as of every day at 00:00"), with zero temporal
    leakage by construction.

    Grid points are ``k*step`` for ``floor(min_ts/step) <= k <=
    max_ts/step`` (bounds from ``features`` unless ``start_us`` /
    ``end_us`` — epoch µs — are given; deriving them costs one
    2-scalar aggregate).  ``entities`` defaults to the distinct feature
    keys; pass an explicit entity table to backfill entities with no
    features yet (all-null rows, matched semantics of a left as-of).

    Scale shape: the grid is built by a narrow per-entity
    ``explode(sequence(...))`` — ``n_steps`` rows per entity, no
    shuffle, no driver-side materialization; the join is the standard
    one-exchange ``asof_join`` kernel.  Grid volume is
    ``n_entities * n_steps`` — choose ``step_s`` for the label cadence,
    and compact hot feature histories first (``compact_features``).

    Reference contrast: pic2vec emits one feature row per input image
    with no temporal axis (image_featurizer.py:332); this op is what
    replaces it when the same entity's features must be sampled at many
    training timestamps.
    """
    from pic2vec_spark.ops.asof import asof_join

    if step_s <= 0:
        raise ValueError("step_s must be positive")
    step_us = int(step_s * 1_000_000)
    if start_us is None or end_us is None:
        row = features.agg(
            F.min(F.unix_micros(F.col(ts).cast("timestamp"))),
            F.max(F.unix_micros(F.col(ts).cast("timestamp"))),
        ).first()
        if row[0] is None:
            raise ValueError("features has no rows to derive grid bounds")
        start_us = start_us if start_us is not None else int(row[0])
        end_us = end_us if end_us is not None else int(row[1])
    g0 = (start_us // step_us) * step_us
    if end_us < g0:
        raise ValueError("grid is empty (end < aligned start)")
    if entities is None:
        entities = features.select(on).distinct()
    # match the feature column's exact timestamp type (TIMESTAMP vs
    # TIMESTAMP_NTZ) so the as-of union resolves without implicit casts
    ts_type = features.schema[ts].dataType
    spine = (
        entities.select(on)
        .select(
            on,
            F.explode(
                F.sequence(F.lit(g0), F.lit(end_us), F.lit(step_us))
            ).alias("__grid_us"),
        )
        .select(
            on,
            F.timestamp_micros(F.col("__grid_us")).cast(ts_type).alias(ts),
        )
    )
    return asof_join(
        spine,
        features,
        on=on,
        ts=ts,
        value_cols=value_cols,
        tiebreak=tiebreak,
    )


def audit_point_in_time(
    joined: DataFrame,
    query_ts: str,
    feature_ts_cols: list[str],
    by: list[str] | None = None,
) -> DataFrame:
    """Temporal-leakage + staleness audit over an as-of join result.

    For each feature-timestamp column emits one output row (long form,
    ``feature`` column carries the name) with:

    - ``n_rows``: rows audited
    - ``n_matched``: rows where the feature matched (ts non-null)
    - ``n_leaks``: matched rows with ``feature_ts > query_ts`` — the
      zero-temporal-leakage invariant says this MUST be 0 for any
      backward as-of output; a non-zero count is a correctness bug, not
      a tuning problem
    - ``max_staleness_us`` / ``sum_staleness_us``: exact integer
      microsecond staleness (query_ts - feature_ts) over matched rows —
      integers so the audit is bit-comparable across engines (derive
      averages downstream as sum/n)

    Optional ``by`` columns group the audit (e.g. per entity cohort or
    per day).  Pure built-in aggregates: one shuffle on ``by`` (or a
    scalar aggregate), decomposable, safe at any scale.
    """
    if not feature_ts_cols:
        raise ValueError("feature_ts_cols must name at least one column")
    by = by or []
    q_us = F.unix_micros(F.col(query_ts).cast("timestamp"))
    pieces = []
    for fc in feature_ts_cols:
        f_us = F.unix_micros(F.col(fc).cast("timestamp"))
        stale = q_us - f_us
        pieces.append(
            joined.select(
                *by,
                F.lit(fc).alias("feature"),
                F.col(fc).isNotNull().alias("__m"),
                F.when(F.col(fc).isNotNull() & (f_us > q_us), 1)
                .otherwise(0)
                .alias("__leak"),
                F.when(F.col(fc).isNotNull() & (f_us <= q_us), stale).alias(
                    "__stale"
                ),
            )
        )
    u = pieces[0]
    for p in pieces[1:]:
        u = u.unionByName(p)
    return u.groupBy(*by, "feature").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("__m").cast("long")).alias("n_matched"),
        F.sum("__leak").alias("n_leaks"),
        F.max("__stale").alias("max_staleness_us"),
        F.sum("__stale").alias("sum_staleness_us"),
    )
