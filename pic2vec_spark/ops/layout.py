"""Z-order (Morton) data layout for multi-dimensional file pruning.

At 100 TB, scan cost is dominated by how many files a predicate can
SKIP via min/max statistics.  Range-partitioning on one column makes
that column's predicates cheap and every other column's predicates a
full scan.  Interleaving the bits of several bucketed dimensions into
one Morton key and range-partitioning on IT gives every participating
dimension partial locality: an aligned 2^k x 2^k box in two dimensions
is a CONTIGUOUS run of the key, so per-file min/max statistics prune
it to a handful of files, while single-dimension stripes still prune
to ~sqrt-fraction of files instead of none.  This is the layout
strategy behind Delta/Iceberg OPTIMIZE ZORDER, implemented here as a
pure Catalyst arithmetic expression plus ``repartitionByRange``.

The key expression is emitted as ONE generated SQL string (plain
FLOOR/%/* arithmetic, no engine-specific bit operators) so the exact
same text runs in Spark (via ``F.expr``) and in the DuckDB oracle —
the same trick the LSH/IVF operators use (ops/knn.py).

Inputs must already be small non-negative integers (bucket or rank
first — e.g. ``user_id % 2^b``, hour-of-epoch ``% 2^b``); only the low
``bits`` bits of each dimension participate (higher bits are ignored
by construction, negative values raise at runtime if you enable the
guard column).  Reference contrast: pic2vec writes a single CSV with
no layout control (image_featurizer.py:804); this module is what
makes the same features cheaply queryable when they land in a
100 TB table instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_KEY_BITS = 62  # stay clear of the BIGINT sign bit


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """Generated SQL arithmetic for the Morton interleave of ``cols``
    (SQL expressions or column names), reading the low ``bits`` bits of
    each: output bit ``d*i + j`` = bit ``i`` of dimension ``j``.  Pure
    FLOOR / % / * on BIGINT — valid verbatim in both Spark SQL and
    DuckDB, and whole-stage-codegen-compilable (no UDF, no bit ops).
    """
    if not cols:
        raise ValueError("cols must name at least one dimension")
    if bits <= 0:
        raise ValueError("bits must be positive")
    d = len(cols)
    if d * bits > _MAX_KEY_BITS:
        raise ValueError(
            f"{d} dims x {bits} bits = {d * bits} key bits > {_MAX_KEY_BITS}"
        )
    terms = []
    for j, c in enumerate(cols):
        x = f"CAST({c} AS BIGINT)"
        for i in range(bits):
            src = x if i == 0 else f"CAST(FLOOR({x} / {1 << i}) AS BIGINT)"
            w = 1 << (d * i + j)
            terms.append(f"({src} % 2) * {w}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out: str = "zkey",
) -> DataFrame:
    """Append the Morton key column ``out`` interleaving ``cols``
    (names or SQL expressions over ``df``'s columns).  Narrow
    projection — zero shuffle; see ``zorder_repartition`` for the
    layout half."""
    return df.withColumn(out, F.expr(zorder_sql(cols, bits)))


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
    out: str = "zkey",
) -> DataFrame:
    """Range-partition + sort ``df`` by its Morton key so each output
    partition (-> parquet file) covers a compact key range: per-file
    min/max statistics then prune multi-dimensional box predicates.
    One range exchange (sampled boundaries), sort within partitions —
    the standard OPTIMIZE ZORDER write shape.  Keep ``out`` in the
    written schema: it is the pruning statistic."""
    keyed = zorder_key(df, cols, bits, out)
    parts = (
        keyed.repartitionByRange(num_partitions, out)
        if num_partitions
        else keyed.repartitionByRange(out)
    )
    return parts.sortWithinPartitions(out)
