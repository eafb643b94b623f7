"""Incremental view maintenance (IVM) for grouped aggregates.

At 100 TB, "recompute the per-entity totals" must not rescan the fact
table every time a batch lands.  The standard answer is a decomposable
aggregate STATE: keep per-key partials (count / exact decimal sum /
min / max), compute the state for each incoming delta ALONE, and merge
states key-wise.  Merging is associative and commutative, so

    state(base ∪ d1 ∪ d2) == merge(merge(state(base), state(d1)), state(d2))

holds for any batch arrival order — the base fact data is read exactly
once, ever (same argument as ops/rollup's hypertable cascade, which is
the time-bucketed special case of this; here the state is keyed by
arbitrary columns instead of time buckets).

Determinism: the sum partial is a per-row DECIMAL cast (the
q_pricing_summary pattern) so merge order can never perturb it; count /
min / max are order-insensitive by construction.  Derived values (avg)
are computed in finalize from the exact partials with the same double
arithmetic on both engines.

Insert-only: min/max are not retractable, so this state supports
appends, not deletes/corrections — keyed corrections go through
snapshots.merge (copy-on-write upsert) and a state rebuild of the
rewritten partitions only.

Scale shape: each state is one grouped aggregation of its OWN input
(map-side partials, one shuffle of |keys| rows); merge shuffles only
state rows (dimension-sized), never facts.

(The reference has no incremental surface at all — its pipeline is a
one-shot pandas run, /root/reference/pic2vec/image_featurizer.py;
this module is part of the beyond-reference 100 TB layer like
ops/rollup and snapshots.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact at 4 decimals; 10^12-row sums keep 24 integer digits of headroom
_DEC = "decimal(28,4)"

_STATE_COLS = ("n_rows", "n_vals", "sum_val", "min_val", "max_val")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Decomposable aggregate state of ``value_col`` grouped by ``keys``:
    (keys..., n_rows, n_vals, sum_val DECIMAL, min_val, max_val)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(value_col)).alias("n_vals"),
        F.sum(F.col(value_col).cast(_DEC)).cast(_DEC).alias("sum_val"),
        F.min(F.col(value_col)).alias("min_val"),
        F.max(F.col(value_col)).alias("max_val"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Key-wise merge of aggregate states (associative + commutative).
    The sum partial is cast back to the state's DECIMAL type so merged
    states are schema-identical to fresh ones (the cascade stays
    closed under merging, like histogram_reaggregate)."""
    if not states:
        raise ValueError("merge_agg_states needs at least one state")
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_vals").alias("n_vals"),
        F.sum("sum_val").cast(_DEC).alias("sum_val"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


def finalize_agg(state: DataFrame, keys: list[str], ndigits: int = 6) -> DataFrame:
    """Materialize the user-facing view from a state: exact count /
    sum / min / max plus avg derived from the exact partials."""
    sum_d = F.col("sum_val").cast("double")
    return state.select(
        *keys,
        F.col("n_rows"),
        F.col("n_vals"),
        F.round(sum_d, 4).alias("sum_value"),
        F.col("min_val").alias("min_value"),
        F.col("max_val").alias("max_value"),
        F.when(
            F.col("n_vals") > 0, F.round(sum_d / F.col("n_vals"), ndigits)
        ).alias("avg_value"),
    )
