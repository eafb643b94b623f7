"""Count-min sketch: fixed-size mergeable frequency summaries.

The heavy-hitters primitive for unbounded key spaces (URLs, tokens,
user ids) where an exact groupBy's state is the key cardinality: a CMS
is ``depth x width`` counters regardless of input size, merges by
elementwise addition (partial aggregation does this for free here), and
answers point frequency queries with one-sided error — estimates never
UNDERcount; they overcount by at most eps*N with the usual
(eps = e/width, delta = e^-depth) guarantee.

Determinism contract (same as ops/sampling): every hash is the first 8
hex digits of ``md5(salt || seed || ':' || key)`` taken mod width, so a
DuckDB oracle recomputes the identical sketch and identical estimates
bit-for-bit — integer arithmetic end to end.

Representation: the sketch is a DataFrame of (seed, idx, cnt) rows,
at most depth*width of them — NOT a driver-side object.  That keeps
construction a single partial-aggregated groupBy (the explode by
``depth`` multiplies rows map-side, but each partition collapses to
<= depth*width partial rows before the shuffle), and lets estimates be
a broadcast join against the dimension-sized sketch.  At 100 TB the
shuffle moves O(partitions * depth * width) counter rows, independent
of data volume.

(The reference has no sketch surface; companion to the KMV distinct
sketch in ops/rollup.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_idx(key: Column, seed: Column, width: int, salt: str) -> Column:
    """Counter index for (key, seed): first 8 md5 hex digits of
    salt||seed||':'||key as an integer, mod width.  Non-negative by
    construction (32-bit magnitude), so ``%`` == pmod on both engines."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), seed.cast("string"), F.lit(":"), key)),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return h % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch: (seed, idx, cnt) with seed in 0..depth-1,
    idx in 0..width-1, cnt = how many input rows hash there.  NULL keys
    are excluded (count them separately if they matter).  Weighted
    streams: pre-aggregate to (key, weight) and sum weights instead."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got ({depth}, {width})")
    k = F.col(key_col).cast("string")
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return (
        df.filter(k.isNotNull())
        .select(k.alias("__k"), F.explode(seeds).alias("seed"))
        .select("seed", _cms_idx(F.col("__k"), F.col("seed"), width, salt).alias("idx"))
        .groupBy("seed", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for a frame of candidate keys:
    est = min over seeds of the counter each (key, seed) hashes to;
    counters nobody hashed to are 0.  depth/width/salt MUST match the
    build (they define the hash family; there is nothing in the sketch
    rows to cross-check against).

    Output: keys' columns + ``est_cnt``.  The sketch side is
    depth*width rows at most — broadcast it so the candidate side never
    shuffles."""
    k = F.col(key_col).cast("string")
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    probes = keys.select(
        F.col(key_col), F.explode(seeds).alias("seed")
    ).withColumn("idx", _cms_idx(k, F.col("seed"), width, salt))
    joined = probes.join(F.broadcast(cms), ["seed", "idx"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(key_col).agg(F.min("cnt").alias("est_cnt"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Exact top-k keys annotated with their CMS estimate — the
    verification harness for the sketch: (key, true_cnt, est_cnt,
    no_underestimate).  ``no_underestimate`` must be uniformly true (the
    CMS one-sided guarantee); est_cnt - true_cnt is the collision error.

    In production the exact top-k comes from an external candidate list
    and only the CMS is consulted; computing truth here is what makes
    the sketch oracle-checkable.  Ties at rank k break by the key's
    natural ordering (deterministic on any orderable key type)."""
    kc = F.col(key_col)
    truth = (
        df.filter(kc.isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), kc)
        .limit(k)
    )
    # truth feeds BOTH the candidate frame below and the final join's
    # left side; Catalyst does not reuse the exchange across the two
    # aliases, so without this the fact table is scanned 3× (verified in
    # the r04 executedPlan).  localCheckpoint materializes the tiny k-row
    # top-k once → exactly 2 FileScans (truth + sketch build).
    truth = truth.localCheckpoint(eager=False)
    cms = cms_build(df, key_col, depth, width, salt)
    est = cms_estimate(cms, truth.select(key_col), key_col, depth, width, salt)
    return (
        truth.join(est, key_col)
        .select(
            key_col,
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") >= F.col("true_cnt")).alias("no_underestimate"),
        )
    )
