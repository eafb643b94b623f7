"""Run every __spark_entry__ query against its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + schema + sorted
value comparison), so a green run here predicts CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


QUERY_NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


_INTEGRAL_SPARK_TYPES = {"byte", "short", "integer", "long"}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    sdf = entrymod.queries()[name](spark, SF_DIR)
    spark_df = sdf.toPandas()
    duck_df = _duck(entrymod.oracle_sql()[name])

    assert len(spark_df) == len(duck_df), f"{name}: row count mismatch"
    assert sorted(spark_df.columns) == sorted(duck_df.columns), f"{name}: schema"

    # Structural dtype guard (round-5 verdict item 1): the driver hashes
    # values exactly, so a DuckDB HUGEINT that pandas renders as float64
    # ("0.0" vs Spark's "0") fails the gate even when numerically equal.
    # This has broken a driver row three rounds running
    # (purchase_props_json r2, value_mad_outliers r3, doc_packing r4) —
    # assert NO oracle column is float where the Spark schema is integral,
    # unless the Spark result actually contains NULLs in that column
    # (fetchdf legitimately promotes nullable ints to float64 then).
    integral = {
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in _INTEGRAL_SPARK_TYPES
    }
    for col in integral:
        if duck_df[col].dtype.kind == "f" and not spark_df[col].isna().any():
            raise AssertionError(
                f"{name}.{col}: oracle renders float64 ({duck_df[col].dtype}) "
                f"but the Spark schema is integral and NULL-free — add an "
                f"explicit CAST(... AS BIGINT) in the oracle SQL "
                f"(DuckDB HUGEINT→float64 fetchdf trap)"
            )

    a, b = _normalize(spark_df), _normalize(duck_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            both_nan = av.isna() & bv.isna()
            close = pd.Series(
                [
                    (m or (not math.isnan(x) and not math.isnan(y) and abs(x - y) <= 1e-6 + 1e-9 * abs(y)))
                    for x, y, m in zip(av.fillna(float("nan")), bv.fillna(float("nan")), both_nan)
                ]
            )
            assert close.all(), f"{name}.{col}: value mismatch\n{a[~close].head()}\n{b[~close].head()}"
        elif av.dtype.kind in "iu" and bv.dtype.kind in "iu":
            assert (av.astype("int64") == bv.astype("int64")).all(), (
                f"{name}.{col}: value mismatch"
            )
        else:
            ao = av.astype(object).where(av.notna(), "<null>")
            bo = bv.astype(object).where(bv.notna(), "<null>")
            assert (ao == bo).all(), f"{name}.{col}: value mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0
