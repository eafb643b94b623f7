"""Range (point-in-interval) join.

``range_join`` attaches every left row whose timestamp falls inside an
interval to that interval — 1:N, unlike the as-of join's latest-1:1
(ops/asof.py).  The canonical uses: attribution windows (all events
within T of a purchase), maintenance/outage windows, validity intervals.

Spark has no native range-join operator (a raw ``start <= ts AND ts <
end`` condition plans as BroadcastNestedLoopJoin — a cartesian product
per key at scale).  The scale-safe formulation is time-bucketing:

1. replicate each interval onto every fixed-width time bucket it
   overlaps (``sequence(floor(start/w), floor((end-1)/w))`` + explode —
   replicas = ceil(span/w), bounded by the longest interval);
2. bucket each point row by ``floor(ts/w)`` (narrow, no replication);
3. EQUI-join on (key?, bucket) — a hash join Catalyst/AQE can
   shuffle or broadcast like any other — then the exact
   ``start <= ts < end`` filter.

A point's bucket is unique, so a (point, interval) pair can meet in at
most ONE bucket — the join needs no de-duplication.  Pick ``bucket_s``
near the typical interval length: smaller buckets replicate long
intervals more; larger buckets admit more false candidates for the
final filter.  Both costs are linear and local — never a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    on: str | None = None,
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Join ``points`` rows into the ``intervals`` containing them:
    ``start <= ts < end`` (half-open), optionally also matching the
    equality key ``on`` (present in both inputs).

    Timestamp-typed columns are compared as INTEGER epoch microseconds
    (boundary comparisons exact — epoch-µs values exceed double's 52-bit
    mantissa as fractional seconds); plain numeric columns as doubles.
    All three time columns must be the same kind.  Output: every points
    column plus the interval's columns (callers should alias clashes
    beforehand; ``on`` appears once).  Intervals with ``end <= start``
    match nothing; NULL keys/bounds never match (equi-join + filter
    semantics).  Bucket ids use floating division + floor, which may
    round a boundary-adjacent row into the neighbouring bucket — safe:
    the interval is replicated onto every bucket it overlaps, and the
    exact filter decides membership."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")

    def is_ts(col, df) -> bool:
        return df.schema[col].dataType.simpleString().startswith("timestamp")

    kinds = {is_ts(ts, points), is_ts(start, intervals), is_ts(end, intervals)}
    if len(kinds) != 1:
        raise ValueError(
            "ts/start/end must all be timestamps or all be numeric"
        )
    timey = kinds.pop()

    def as_num(col):
        c = F.col(col)
        if timey:
            return F.unix_micros(c.cast("timestamp"))  # exact bigint µs
        return c.cast("double")

    bucket = bucket_s * 1e6 if timey else float(bucket_s)

    iv = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(as_num(start) / bucket),
                # replicate through floor(end/bucket) UNCONDITIONALLY:
                # subtracting an epsilon to honor half-openness can step
                # below a representable value just under `end` and
                # under-replicate, silently dropping boundary points; at
                # most one extra (empty) replica survives to the exact
                # filter, which is the one that decides membership
                F.greatest(
                    F.floor(as_num(end) / bucket),
                    F.floor(as_num(start) / bucket),
                ),
            )
        ),
    )
    pt = points.withColumn(_B, F.floor(as_num(ts) / bucket))
    keys = ([on] if on else []) + [_B]
    joined = pt.join(iv, keys)
    return joined.filter(
        (as_num(start) <= as_num(ts)) & (as_num(ts) < as_num(end))
    ).drop(_B)
