"""Point-in-time (as-of) join.

The reference engine (pic2vec) has no notion of time; this operator is
the core of the point-in-time layer this engine adds on top of its
featurization semantics.

Semantics: for every query row (entity_id, query_ts) attach the value
columns of the *latest* feature row of the same entity with
``feature_ts <= query_ts`` (zero temporal leakage — a query never sees a
feature timestamped after it).  Ties on ``ts`` resolve feature-first and
then by the feature-side tiebreak column, deterministically.

Implementation (Spark-first, no per-row Python):

    union(tagged feature side, tagged query side)
      -> single shuffle: hash partition by entity_id
      -> Window.partitionBy(entity).orderBy(ts, side, tiebreak)
         with F.last(..., ignorenulls=True) over unboundedPreceding..current
      -> filter side == query

One shuffle total (the window exchange); both inputs are scanned once.
This is the sorted-merge formulation: within each entity partition the
rows are sort-merged by timestamp and the running "last feature value"
is carried forward — exactly what a dedicated as-of join operator does,
expressed with built-in windowed aggregates so Catalyst/Tungsten run it
entirely JVM-side (whole-stage codegen, no UDF).

Skew note (100 TB): the window shuffles by entity_id only. Hot entities
are bounded by per-entity history length, not by table size; if one
entity's history exceeds a partition, pre-aggregate its feature side
(e.g. keep last-per-(entity, ts-bucket)) before the join. Salting cannot
be applied to an ordered window without breaking the running-last chain,
so the engine keeps salting for the (per-row, order-free) featurize
stage only — see pic2vec_spark.featurize.

Reference contrast: pic2vec aligns features to rows positionally
(pd.concat(axis=1), /root/reference/pic2vec/image_featurizer.py:332);
this engine replaces positional identity with explicit (entity, ts) keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIE = "__asof_tie"


def asof_join(
    queries: DataFrame,
    features: DataFrame,
    on: str = "entity_id",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    tolerance_s: float | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """As-of join ``queries`` (left) with ``features`` (right).

    Returns the query rows with ``{v}{suffix}`` for each value column,
    plus ``{ts}{suffix}`` (the matched feature timestamp, null when no
    feature matches in ``direction`` / outside ``tolerance_s``).

    ``direction`` (pandas ``merge_asof`` semantics, all one-shuffle):

    - ``backward`` (default, the point-in-time case): latest feature
      with ``feature_ts <= query_ts`` — zero temporal leakage; among
      equal-ts features the LARGEST tiebreak wins (running last).
    - ``forward``: earliest feature with ``feature_ts >= query_ts``;
      among equal-ts features the SMALLEST tiebreak wins.
    - ``nearest``: whichever of the two is closer in time; exact tie
      resolves backward (the leak-free side).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in features.columns if c not in (on, ts)]

    f = features.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias(_SIDE),
        (F.col(tiebreak) if tiebreak else F.monotonically_increasing_id()).alias(_TIE),
        *[F.col(c) for c in value_cols],
    )
    q_cols = [c for c in queries.columns]
    q = queries.select(
        *q_cols,
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(f.schema[_TIE].dataType).alias(_TIE),
        *[F.lit(None).cast(f.schema[c].dataType).alias(c) for c in value_cols if c not in q_cols],
    )
    u = f.unionByName(q, allowMissingColumns=True)

    # backward pass: features sort BEFORE equal-ts queries (side asc) so
    # the running last over (unboundedPreceding..current) includes them.
    wb = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc(), F.col(_TIE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward pass: features sort AFTER equal-ts queries (side desc) so
    # the running first over (current..unboundedFollowing) includes them;
    # tie asc makes the smallest tiebreak the first match.
    wf = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).desc(), F.col(_TIE).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def last_feature(col: Column) -> Column:
        return F.last(F.when(F.col(_SIDE) == 0, col), ignorenulls=True).over(wb)

    def first_feature(col: Column) -> Column:
        return F.first(F.when(F.col(_SIDE) == 0, col), ignorenulls=True).over(wf)

    # single select so Catalyst emits ONE Window node per direction for
    # all the running-last/first expressions (chained withColumn produced
    # one Window pass per value column over the same sorted partition)
    if direction == "backward":
        u = u.select(
            "*",
            last_feature(F.col(ts)).alias(f"{ts}{suffix}"),
            *[last_feature(F.col(c)).alias(f"{c}{suffix}") for c in value_cols],
        )
    elif direction == "forward":
        u = u.select(
            "*",
            first_feature(F.col(ts)).alias(f"{ts}{suffix}"),
            *[first_feature(F.col(c)).alias(f"{c}{suffix}") for c in value_cols],
        )
    else:  # nearest: both passes share the one entity exchange (same
        # partitioning; Spark re-sorts in place for the second order)
        u = u.select(
            "*",
            last_feature(F.col(ts)).alias("__b_ts"),
            *[last_feature(F.col(c)).alias(f"__b_{c}") for c in value_cols],
        ).select(
            "*",
            first_feature(F.col(ts)).alias("__f_ts"),
            *[first_feature(F.col(c)).alias(f"__f_{c}") for c in value_cols],
        )
        qus = F.unix_micros(F.col(ts).cast("timestamp"))
        b_dist = qus - F.unix_micros(F.col("__b_ts").cast("timestamp"))
        f_dist = F.unix_micros(F.col("__f_ts").cast("timestamp")) - qus
        pick_b = F.col("__f_ts").isNull() | (
            F.col("__b_ts").isNotNull() & (b_dist <= f_dist)
        )
        u = u.select(
            "*",
            F.when(pick_b, F.col("__b_ts")).otherwise(F.col("__f_ts")).alias(f"{ts}{suffix}"),
            *[
                F.when(pick_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        ).drop("__b_ts", "__f_ts", *[f"__b_{c}" for c in value_cols], *[f"__f_{c}" for c in value_cols])

    out = u.filter(F.col(_SIDE) == 1).drop(_SIDE, _TIE, *[c for c in value_cols if c not in q_cols])

    if tolerance_s is not None:
        qus = F.unix_micros(F.col(ts).cast("timestamp"))
        fus = F.unix_micros(F.col(f"{ts}{suffix}").cast("timestamp"))
        dist = F.abs(qus - fus) if direction == "nearest" else (
            fus - qus if direction == "forward" else qus - fus
        )
        in_range = F.col(f"{ts}{suffix}").isNotNull() & (
            dist <= int(tolerance_s * 1_000_000)
        )
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(in_range, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(
            f"{ts}{suffix}", F.when(in_range, F.col(f"{ts}{suffix}"))
        )
    return out
