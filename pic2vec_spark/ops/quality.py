"""Declarative data-quality constraints (expectations) over DataFrames.

The validation layer a 100 TB training pipeline runs before anything
else: each constraint compiles to ONE aggregate expression, and a whole
constraint suite evaluates in a SINGLE pass over the table (one job, one
shuffle-free partial-aggregate tree) — never one scan per check.  The
result is a tiny (check_name, n_rows, n_violations, pass) report frame,
cheap to store per snapshot as an audit row.

Constraints:

- ``not_null(col)`` — NULL count.
- ``in_range(col, lo, hi)`` — non-NULL values outside [lo, hi].
- ``matches(col, regexp)`` — non-NULL strings not fully matching.
- ``unique(col)`` — rows carrying a duplicated key (n - distinct).
- ``foreign_key(col, dim_df, dim_col)`` — non-NULL values absent from
  the referenced dimension (evaluated as a broadcast-able left-anti
  count, the one constraint that needs a join).

Distinct-based and FK checks are exact; at 10^12 rows swap ``unique``
for the KMV sketch in ops/rollup if an estimate suffices.

(The reference validates inputs driver-side before a pandas run,
image_featurizer.py:93-534; this is the distributed, declarative form.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    name: str
    # aggregate expression counting VIOLATIONS (bigint)
    violations: Column


def not_null(col: str) -> Constraint:
    return Constraint(
        f"not_null({col})",
        F.count(F.lit(1)) - F.count(F.col(col)),
    )


def in_range(col: str, lo, hi) -> Constraint:
    v = F.col(col)
    return Constraint(
        f"in_range({col},{lo},{hi})",
        F.sum(
            F.when(v.isNotNull() & ((v < F.lit(lo)) | (v > F.lit(hi))), 1)
            .otherwise(0)
        ).cast("bigint"),
    )


def matches(col: str, pattern: str) -> Constraint:
    v = F.col(col)
    return Constraint(
        f"matches({col})",
        F.sum(
            F.when(v.isNotNull() & ~v.rlike(pattern), 1).otherwise(0)
        ).cast("bigint"),
    )


def unique(col: str) -> Constraint:
    # rows in excess of one per key = n_non_null - n_distinct
    v = F.col(col)
    return Constraint(
        f"unique({col})",
        (F.count(v) - F.count_distinct(v)).cast("bigint"),
    )


def check_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate all constraints in ONE aggregation pass.

    Output: (check_name, n_rows, n_violations, pass) — one row per
    constraint, unpivoted from the single aggregate row with a literal
    inline explode (no second scan)."""
    if not constraints:
        raise ValueError("check_constraints needs at least one constraint")
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[c.violations.alias(f"__v{i}") for i, c in enumerate(constraints)],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__v{i}"), F.lit(0)).alias("n_violations"),
            )
            for i, c in enumerate(constraints)
        ]
    )
    out = agg.select(F.explode(rows).alias("__r")).select("__r.*")
    return out.withColumn("pass", F.col("n_violations") == 0)


def check_foreign_key(
    df: DataFrame,
    col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """Referential-integrity report row: non-NULL fact keys absent from
    the dimension.  One left-anti join (broadcast when the dimension is
    small — Catalyst/AQE decides) + one aggregate; same output schema as
    ``check_constraints`` so reports union cleanly."""
    n = df.count()
    orphans = (
        df.filter(F.col(col).isNotNull())
        .join(
            dim.select(F.col(dim_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .count()
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(f"foreign_key({col})", n, orphans, orphans == 0)],
        "check_name string, n_rows bigint, n_violations bigint, pass boolean",
    )


def rule_funnel(df: DataFrame, rule_cols: list[str]) -> DataFrame:
    """Gopher-style attrition report over a boolean rule suite (Rae et
    al. 2021 report per-rule removal rates for each quality screen):
    one output row per rule, in the given order, carrying BOTH the
    independent pass count (how many rows satisfy this rule alone) and
    the cumulative survivor count (rows satisfying rules 1..k) — the
    two numbers a curation run needs to see which screen is doing the
    work and how the corpus shrinks through the pipeline.

    Works over any frame with boolean rule columns — ``ops.text.
    gopher_quality_flags`` and ``ops.multimodal.image_quality_rules``
    both qualify.  Rule columns are expected NULL-free (both suites
    emit total booleans); a NULL rule value is skipped by the sums.

    Shape: ONE aggregation pass (2·k+1 conditional sums folding
    map-side into a single row — never a scan per rule), then a
    ``stack`` unpivot of that one row.  The report is O(#rules) rows
    regardless of input size; rates are round-6 closed forms so a SQL
    oracle reproduces them exactly, and an empty input yields zero
    counts with NULL rates (never a divide-by-zero)."""
    if not rule_cols:
        raise ValueError("rule_funnel needs at least one rule column")
    aggs = [F.count(F.lit(1)).alias("_n_total")]
    cum: Column | None = None
    for c in rule_cols:
        cum = F.col(c) if cum is None else cum & F.col(c)
        aggs.append(F.sum(F.col(c).cast("long")).alias(f"_p_{c}"))
        aggs.append(F.sum(cum.cast("long")).alias(f"_s_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {i + 1}, _p_{c}, _s_{c}" for i, c in enumerate(rule_cols)
    )
    out = row.selectExpr(
        "_n_total",
        f"stack({len(rule_cols)}, {stack_args})"
        " AS (rule, rule_order, _n_pass, _n_survive)",
    )
    total = F.col("_n_total")
    return out.select(
        "rule",
        F.col("rule_order").cast("int").alias("rule_order"),
        total.alias("n_total"),
        F.coalesce(F.col("_n_pass"), F.lit(0)).alias("n_pass"),
        F.coalesce(F.col("_n_survive"), F.lit(0)).alias("n_survive"),
        F.when(total > 0, F.round(F.col("_n_pass") / total, 6)).alias(
            "pass_rate"
        ),
        F.when(total > 0, F.round(F.col("_n_survive") / total, 6)).alias(
            "survive_rate"
        ),
    )


def embedding_quality(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Vector-column hygiene screen — the validation an embedding
    pipeline runs before any ANN index build, because one NaN or
    ragged vector inside a 10^12-row corpus otherwise surfaces as a
    crash deep inside a kernel (the failure mode the PQ encoders had
    to be hardened against).  Adds per-row verdict columns:

    - ``dim`` — vector length (−1 for NULL vectors, so the column
      stays NULL-free for exact comparison),
    - ``norm`` — round-6 L2 norm of the vector as stored (NaN
      components propagate to a NaN norm),
    - ``has_nan`` / ``is_zero_norm`` / ``dim_ok`` — individual screens,
    - ``vec_ok`` — the conjunction: non-NULL, right dimension, finite,
      non-zero.

    Entirely JVM-side array expressions (exists/aggregate) — no UDF,
    no shuffle, whole-stage-codegen narrow projection; at any scale
    this is a free rider on the first pass over the table."""
    v = F.col(vec_col)
    dim = F.when(v.isNull(), F.lit(-1)).otherwise(F.size(v)).cast("int")
    acc = F.aggregate(
        v,
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    norm = F.round(F.sqrt(acc), 6)
    has_nan = F.coalesce(
        F.exists(v, lambda x: F.isnan(x.cast("double"))), F.lit(False)
    )
    is_zero = F.coalesce(norm == 0.0, F.lit(False))
    dim_ok = (
        F.lit(True)
        if expected_dim is None
        else F.coalesce(F.size(v) == expected_dim, F.lit(False))
    )
    return df.withColumns(
        {
            "dim": dim,
            "norm": norm,
            "has_nan": has_nan,
            "is_zero_norm": is_zero,
            "dim_ok": dim_ok,
            "vec_ok": v.isNotNull() & dim_ok & ~has_nan & ~is_zero,
        }
    )
