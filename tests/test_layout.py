"""Z-order layout: Morton-key correctness vs a Python bit-interleave,
partition-pruning locality vs a single-dimension sort, validation."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.layout import zorder_key, zorder_repartition, zorder_sql


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    pdf = pd.DataFrame(
        [(x, y) for x in range(64) for y in range(64)], columns=["x", "y"]
    )
    return spark.createDataFrame(pdf)


def test_zorder_key_matches_python_interleave(spark, grid):
    out = zorder_key(grid, ["x", "y"], bits=6).toPandas()
    expect = out.apply(lambda r: _morton2(int(r.x), int(r.y), 6), axis=1)
    assert (out.zkey == expect).all()
    # only the low `bits` bits participate: x+64 maps to the same key
    shifted = zorder_key(
        grid.withColumn("x", F.col("x") + 64), ["x", "y"], bits=6
    ).toPandas()
    assert (shifted.zkey.values == out.zkey.values).all()


def _touched(df, pred):
    """Partitions containing at least one row matching pred — what
    min/max file statistics would fail to prune."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .filter(pred)
        .select("__pid")
        .distinct()
        .count()
    )


def test_zorder_layout_prunes_boxes_and_stripes(spark, grid):
    box = (F.col("x").between(8, 15)) & (F.col("y").between(8, 15))
    stripe_y = F.col("y").between(8, 15)

    z = zorder_repartition(grid, ["x", "y"], bits=6, num_partitions=16)
    z.persist().count()
    # an aligned 8x8 box is one contiguous Morton run -> ~1 of 16
    # partitions; a y-only stripe still prunes to ~half
    assert _touched(z, box) <= 2
    assert _touched(z, stripe_y) <= 9

    xs = grid.repartitionByRange(16, "x").sortWithinPartitions("x")
    xs.persist().count()
    # the single-dimension layout is perfect on x but hopeless on y:
    # every partition holds every y value
    assert _touched(xs, stripe_y) == 16
    z.unpersist()
    xs.unpersist()


def test_zorder_validation():
    with pytest.raises(ValueError, match="at least one"):
        zorder_sql([], 8)
    with pytest.raises(ValueError, match="positive"):
        zorder_sql(["x"], 0)
    with pytest.raises(ValueError, match="key bits"):
        zorder_sql(["a", "b", "c"], 21)
    # 62 bits exactly is allowed
    assert "CAST" in zorder_sql(["a", "b"], 31)


def test_zorder_sql_is_engine_portable(grid):
    """The generated key text must evaluate identically in DuckDB —
    the oracle runs it verbatim."""
    import duckdb

    sql = zorder_sql(["x", "y"], bits=6)
    pdf = pd.DataFrame(
        [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)],
        columns=["x", "y"],
    )
    con = duckdb.connect()
    con.register("t", pdf)
    got = con.execute(f"SELECT {sql} AS z FROM t").fetchdf().z
    expect = pdf.apply(lambda r: _morton2(int(r.x), int(r.y), 6), axis=1)
    assert (got.values == expect.values).all()
