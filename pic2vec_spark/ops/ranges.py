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
_CB = "__canon_bucket"


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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    on: str | None = None,
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Interval × interval overlap join (closed intervals):
    ``lstart <= rend AND rstart <= lend``, optionally also matching the
    equality key ``on``.  N:M — every overlapping pair, once.

    Scale-safe formulation (the raw condition would plan as a
    NestedLoop/cartesian): BOTH sides are replicated onto every
    fixed-width bucket their interval spans and equi-joined on the
    bucket.  A pair overlapping several buckets would match in each of
    them, so the join keeps a match only in its CANONICAL bucket —
    ``floor(max(lstart, rstart)/bucket)``.  For any overlapping pair,
    ``max(lstart, rstart)`` lies inside both intervals, so both replicas
    exist in that bucket: exactly-once without a distinct shuffle.

    All four bound columns must be the same kind (all timestamps, or all
    numeric — numeric compares as BIGINT when both sides are integral,
    so epoch-µs bounds stay exact); the four names must be distinct
    (pre-alias clashes).  Replication per row = ceil(span/bucket):
    pick ``bucket_s`` near the typical interval length.  NULL bounds /
    keys never match.  Intervals with ``end < start`` match nothing.
    """
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    if len({lstart, lend, rstart, rend}) != 4:
        raise ValueError("lstart/lend/rstart/rend must be 4 distinct column names")

    def kind(col, df) -> str:
        s = df.schema[col].dataType.simpleString()
        if s.startswith("timestamp"):
            return "ts"
        return "int" if s in ("tinyint", "smallint", "int", "bigint") else "num"

    kinds = {kind(lstart, left), kind(lend, left), kind(rstart, right), kind(rend, right)}
    if "ts" in kinds and len(kinds) != 1:
        raise ValueError("interval bounds must all be timestamps or all numeric")
    timey = kinds == {"ts"}

    def as_num(col):
        c = F.col(col)
        if timey:
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("bigint") if kinds == {"int"} else c.cast("double")

    bucket = bucket_s * 1e6 if timey else float(bucket_s)

    def replicate(df: DataFrame, start: str, end: str) -> DataFrame:
        # the pairwise overlap test (ls<=re AND rs<=le) does NOT itself
        # reject an inverted interval (end < start) — an empty interval
        # can still satisfy both inequalities — so validity is filtered
        # explicitly (also drops NULL bounds before the explode)
        df = df.filter(as_num(start) <= as_num(end))
        return df.withColumn(
            _B,
            F.explode(
                F.sequence(
                    F.floor(as_num(start) / bucket),
                    F.greatest(
                        F.floor(as_num(end) / bucket),
                        F.floor(as_num(start) / bucket),
                    ),
                )
            ),
        )

    lv = replicate(left, lstart, lend)
    rv = replicate(right, rstart, rend)
    keys = ([on] if on else []) + [_B]
    joined = lv.join(rv, keys)
    overlap = (as_num(lstart) <= as_num(rend)) & (as_num(rstart) <= as_num(lend))
    canonical = F.col(_B) == F.floor(
        F.greatest(as_num(lstart), as_num(rstart)) / bucket
    )
    return joined.filter(overlap & canonical).drop(_B)
