"""Tabular feature-encoding operators: target encoding (smoothed +
leave-one-out), exact quantile binning, standard scaling, frequency
encoding, an exact-sum correlation matrix, and hashed feature crosses.

These are the classic feature-engineering transforms a training
pipeline applies to the *tabular* side of a multimodal corpus (the
reference pipeline stops at CNN vectors + a caption column; a real
training table also carries categorical/numeric context columns that
need encoding before they meet a model).

Cross-engine determinism is the design constraint (every operator here
is oracle-checked against DuckDB running textually-identical math):

- Sums that feed an encoder are per-row cast to DECIMAL at a scale the
  data is exact at (the pricing-summary pattern, __spark_entry__.py
  q_pricing_summary) so summation ORDER can never perturb a result —
  partial aggregation and AQE re-planning stay bit-stable.
- Derived statistics (means, variances, correlations) are then computed
  in double from those exact sums with the SAME expression shape on
  both engines: IEEE arithmetic on identical inputs is deterministic.
- Hash-based transforms reuse ops/sampling's md5 bucket (portable to
  any engine with md5).

Scale shape (100 TB): every encoder is one grouped/global aggregation
whose output is dimension-sized (category table, k-1 boundaries, one
stats row, k^2/2 correlations) followed by a broadcast join or a
narrow projection back onto the rows — no windows over unbounded
groups, no driver-side per-row state.

Reference contrast: pic2vec has no tabular encoding surface at all
(its CSV passthrough keeps non-image columns verbatim,
/root/reference/pic2vec/feature_preprocessing.py); this module is part
of the beyond-reference training-data layer like ops/sampling and
ops/text.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _hash_bucket

# events.value-style money columns are exact at 4 decimals; a sum of
# 10^12 of them fits decimal(38,4) with 22 integer digits to spare
_DEC = "decimal(28,4)"
# squares/products of up-to-4-decimal magnitudes (exact at 8 decimals,
# up to ~1e10 per row; a 10^12-row sum still fits 38 digits)
_DEC_SQ = "decimal(38,8)"


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
) -> DataFrame:
    """Smoothed mean target encoding: per category,
    ``te = (sum_t + m * prior) / (n + m)`` where ``prior`` is the
    global target mean and ``m`` the smoothing pseudo-count — rare
    categories shrink toward the prior instead of memorizing noise.

    Returns the dimension-sized encoding map ``(cat_col, n, te)``;
    apply it to rows with a broadcast join.  NULL targets are excluded
    from both sums (SQL aggregate semantics); NULL categories form
    their own group is avoided by filtering them (a NULL category has
    no stable encoding — callers impute first).

    Plan: one grouped aggregation (map-side partials) + one scalar
    global aggregate broadcast into the projection.  te is exact-sum
    based (see module docstring) and rounded to 6 decimals.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    rows = df.filter(F.col(cat_col).isNotNull()).select(
        F.col(cat_col), F.col(target_col).cast(_DEC).alias("__t")
    )
    glob = rows.agg(
        (F.sum("__t").cast("double") / F.count("__t")).alias("__prior")
    )
    m = F.lit(float(smoothing))
    return (
        rows.groupBy(cat_col)
        .agg(
            F.count("__t").alias("n"),
            F.sum("__t").cast("double").alias("__sum_t"),
        )
        .crossJoin(F.broadcast(glob))
        .select(
            cat_col,
            "n",
            F.round(
                (F.col("__sum_t") + m * F.col("__prior"))
                / (F.col("n") + m),
                6,
            ).alias("te"),
        )
    )


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 20.0,
    out_col: str = "loo",
) -> DataFrame:
    """Leave-one-out target encoding: each row's category mean EXCLUDES
    the row's own target — ``(sum_cat - t_i + m * prior) / (n_cat - 1
    + m)`` — the standard anti-leakage form when the encoded feature
    and the training target coincide (a row must never see itself).

    A singleton category with smoothing=0 would be 0/0; it yields the
    prior (the only leak-free answer).  Rows with a NULL target get the
    category's unadjusted smoothed encoding (nothing to leave out).

    Plan: the per-category sums are a grouped aggregation joined back
    broadcast (categories are dimension-sized); the per-row arithmetic
    is a narrow projection.  Never a window: a hot category's rows stay
    spread across partitions.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    rows = df.filter(F.col(cat_col).isNotNull()).withColumn(
        "__t", F.col(target_col).cast(_DEC)
    )
    glob = rows.agg(
        (F.sum("__t").cast("double") / F.count("__t")).alias("__prior")
    )
    cat = rows.groupBy(cat_col).agg(
        F.count("__t").alias("__n_cat"),
        F.sum("__t").cast("double").alias("__sum_cat"),
    )
    m = F.lit(float(smoothing))
    t_d = F.col("__t").cast("double")
    loo_num = F.col("__sum_cat") - t_d + m * F.col("__prior")
    loo_den = F.col("__n_cat") - 1 + m
    smoothed = (F.col("__sum_cat") + m * F.col("__prior")) / (
        F.col("__n_cat") + m
    )
    enc = (
        F.when(F.col("__t").isNull(), smoothed)
        .when(loo_den > 0, loo_num / loo_den)
        .otherwise(F.col("__prior"))
    )
    return (
        rows.join(F.broadcast(cat), cat_col)
        .crossJoin(F.broadcast(glob))
        .withColumn(out_col, F.round(enc, 6))
        .drop("__t", "__n_cat", "__sum_cat", "__prior")
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency binning: rows are assigned to ``1..n_bins`` by
    exact interpolated quantile boundaries (SQL-standard
    percentile_cont semantics — identical interpolation in Spark's
    ``percentile`` and DuckDB's ``quantile_cont``, the same parity the
    percentile queries rely on).  ``bin = 1 + #{boundaries < value}``
    with boundaries at i/n_bins for i in 1..n_bins-1; ties on a
    boundary go to the LOWER bin (value > boundary is strict).  NULL
    values get a NULL bin.

    Boundaries are ROUNDED to 6 decimals before comparison: the two
    engines interpolate with different formula shapes (Spark
    ``lo + t*(hi-lo)``, DuckDB ``lo*(1-t) + hi*t``), which disagree in
    the last double bits even when ``lo == hi`` (observed: 51.87 vs
    51.86999999999999 on a duplicate-heavy column), silently flipping
    every tie at that boundary.  Round-6 is the repo-wide determinism
    convention; a bin edge more precise than 1e-6 is meaningless for
    equal-frequency binning.

    Plan: one global aggregate produces the (n_bins-1)-element boundary
    array, broadcast into a narrow projection — two passes over the
    value column, no sort, no window.  (ntile() would need a single
    global ordering — a one-partition sort at 100 TB; boundary
    assignment is the scale-correct form and is also append-stable
    given frozen boundaries.)
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    fracs = [i / n_bins for i in range(1, n_bins)]
    v = F.col(value_col).cast("double")
    bnds = df.agg(
        F.transform(
            F.percentile(v, F.array([F.lit(f) for f in fracs])),
            lambda b: F.round(b, 6),
        ).alias("__bnds")
    )
    return (
        df.crossJoin(F.broadcast(bnds))
        .withColumn(
            out_col,
            F.when(
                v.isNotNull(),
                F.size(F.filter("__bnds", lambda b: v > b)) + F.lit(1),
            ),
        )
        .drop("__bnds")
    )


def standard_scale(
    df: DataFrame,
    value_col: str,
    out_col: str = "z",
) -> DataFrame:
    """Global z-score scaling: ``z = (v - mean) / sd`` with the SAMPLE
    standard deviation derived from exact decimal sums —
    ``sd² = (ssq - sum²/n) / (n-1)`` — so the fitted statistics are
    independent of partitioning/summation order (stock ``stddev_samp``
    merges double co-moments in partition order; under AQE two runs of
    the same job can disagree in the last bits, which a bit-stable
    feature store cannot tolerate).  Degenerate inputs (n < 2 or zero
    variance) yield NULL z, as do NULL values.

    Plan: one scalar aggregate broadcast into a narrow projection.
    (Contrast ops/windows.entity_zscore — per-entity windows; this is
    the global fit+transform.)
    """
    v = F.col(value_col).cast("double")
    stats = df.agg(
        F.count(v).alias("__n"),
        F.sum(v.cast(_DEC)).cast("double").alias("__s"),
        F.sum((v * v).cast(_DEC_SQ)).cast("double").alias("__ssq"),
    )
    n = F.col("__n")
    mean = F.col("__s") / n
    var = (F.col("__ssq") - F.col("__s") * F.col("__s") / n) / (n - 1)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            out_col,
            F.when(
                (n > 1) & (var > 0), (v - mean) / F.sqrt(var)
            ),
        )
        .drop("__n", "__s", "__ssq")
    )


def count_encode(df: DataFrame, cat_col: str) -> DataFrame:
    """Count + frequency encoding map: ``(cat_col, n, freq)`` with
    ``freq = n / total`` — the cheapest useful categorical encoder and
    the usual first replacement for an unbounded one-hot.  NULL
    categories are excluded (impute first).  One grouped aggregation;
    integer counts are exactly portable, freq is one IEEE division."""
    rows = df.filter(F.col(cat_col).isNotNull()).select(cat_col)
    glob = rows.agg(F.count(F.lit(1)).alias("__total"))
    return (
        rows.groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(glob))
        .select(
            cat_col,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("freq"),
        )
    )


def corr_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over ``cols``, one row per
    unordered pair ``(col_a, col_b, corr)`` — the feature-selection
    screen (drop one of every highly-correlated pair before training).

    Built from exact decimal sums in ONE aggregation pass —
    ``corr = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)(n·Syy − Sy²))`` —
    rather than stock ``F.corr``, whose streaming co-moment merges are
    partition-order-dependent in the last bits (same rationale as
    standard_scale).  Rows with a NULL in ANY of ``cols`` are dropped
    (listwise deletion) so every pair shares one n.

    Plan: a single global aggregate over k + k(k+1)/2 decimal sums
    (map-side partials; one row out), then k(k-1)/2 constant-space
    projections unioned — scan once regardless of k.
    """
    if len(cols) < 2:
        raise ValueError(f"need >= 2 cols, got {cols}")
    keep = df
    for c in cols:
        keep = keep.filter(F.col(c).isNotNull())
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        v = F.col(c).cast("double")
        aggs.append(F.sum(v.cast(_DEC)).cast("double").alias(f"__s_{c}"))
    for a, b in itertools.combinations_with_replacement(cols, 2):
        p = (F.col(a).cast("double") * F.col(b).cast("double")).cast(_DEC_SQ)
        aggs.append(F.sum(p).cast("double").alias(f"__p_{a}_{b}"))
    stats = keep.agg(*aggs)

    def one(a: str, b: str) -> DataFrame:
        n = F.col("__n").cast("double")
        sx, sy = F.col(f"__s_{a}"), F.col(f"__s_{b}")
        sxy = F.col(f"__p_{a}_{b}")
        sxx, syy = F.col(f"__p_{a}_{a}"), F.col(f"__p_{b}_{b}")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return stats.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.round(F.when(den > 0, num / den), 6).alias("corr"),
        )

    out = None
    for a, b in itertools.combinations(cols, 2):
        part = one(a, b)
        out = part if out is None else out.unionAll(part)
    return out


def feature_cross(
    df: DataFrame,
    cols: list[str],
    n_buckets: int = 1024,
    salt: str = "cross",
    out_col: str = "cross_bucket",
) -> DataFrame:
    """Hashed feature cross: the interaction of ``cols`` mapped to
    ``[0, n_buckets)`` via the portable md5 bucket (ops/sampling) over
    the unit-separator-joined string key — the hashing-trick encoder
    for categorical interactions whose raw cardinality product is
    unbounded.  Deterministic across runs/engines/partitionings; NULL
    components render as the '\\x01' sentinel (not NUL — portable SQL
    engines reject embedded NUL) so (NULL, x) and ('', x) cross
    differently.  Narrow projection — no shuffle."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
            for c in cols
        ],
    )
    return df.withColumn(out_col, _hash_bucket(key, salt, n_buckets))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization): values below the p_lo
    quantile / above the p_hi quantile are clamped to those quantiles —
    the standard fat-tail tamer before scaling or model input, keeping
    row count intact (unlike a filter).  Optionally per group.

    Exact quantiles (same engine-shared linear interpolation as
    ops/stats.mad_outliers — that is what makes it oracle-checkable);
    at unbounded group cardinality swap percentile for
    percentile_approx, same plan shape.  Plan: one grouped (or global)
    quantile aggregate over the value projection, broadcast back, one
    narrow clamp projection.  NULL values pass through as NULL (guarded
    explicitly: Spark's greatest/least SKIP nulls, which would silently
    clamp a missing value to the lower bound); rows with a NULL group
    drop (no reference distribution to clip against)."""
    if not 0.0 <= p_lo < p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo < p_hi <= 1, got ({p_lo}, {p_hi})")
    out_col = out_col or f"{value_col}_wins"
    v = F.col(value_col).cast("double")
    if group_col is not None:
        bounds = df.groupBy(group_col).agg(
            F.percentile(v, F.lit(p_lo)).alias("__lo"),
            F.percentile(v, F.lit(p_hi)).alias("__hi"),
        )
        joined = df.join(F.broadcast(bounds), group_col)
    else:
        bounds = df.agg(
            F.percentile(v, F.lit(p_lo)).alias("__lo"),
            F.percentile(v, F.lit(p_hi)).alias("__hi"),
        )
        joined = df.crossJoin(F.broadcast(bounds))
    return joined.withColumn(
        out_col,
        F.when(
            v.isNotNull(),
            F.round(F.least(F.greatest(v, F.col("__lo")), F.col("__hi")), 6),
        ),
    ).drop("__lo", "__hi")


def calendar_features(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Calendar feature expansion of a timestamp column: hour-of-day,
    day-of-week (1=Monday..7=Sunday, ISO — engine-portable, unlike
    Spark's Sunday-first ``dayofweek``), day-of-month, month, and an
    is_weekend flag — the standard temporal covariates for any
    time-conditioned model.  Pure narrow projection (zero shuffle,
    whole-stage codegen); NULL timestamps yield NULL features."""
    t = F.col(ts_col).cast("timestamp")
    # weekday(ts) is 0=Monday in Spark 4; +1 gives ISO (DuckDB isodow)
    iso_dow = F.weekday(t) + 1
    return df.withColumns(
        {
            "cal_hour": F.hour(t).cast("int"),
            "cal_dow": iso_dow.cast("int"),
            "cal_dom": F.dayofmonth(t).cast("int"),
            "cal_month": F.month(t).cast("int"),
            "cal_is_weekend": (F.weekday(t) >= 5).cast("boolean"),
        }
    )


def rfm_features(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    as_of: str | None = None,
    n_bins: int = 5,
) -> DataFrame:
    """RFM behavioral features per entity — Recency (seconds since the
    entity's last event at the ``as_of`` instant), Frequency (event
    count), Monetary (exact decimal sum of value) — plus 1..n_bins
    scores from ntile over each axis (classic quintile scoring; ties
    broken by entity id so the scores are deterministic and
    oracle-checkable).  ``as_of`` defaults must be supplied explicitly
    (a wall-clock default would break reproducibility).

    Plan: one entity aggregate (map-side partials) + three window
    ntiles over the entities-sized aggregate — the expensive pass is
    the single groupBy of the fact table."""
    from pyspark.sql import Window

    if as_of is None:
        raise ValueError("rfm_features requires an explicit as_of timestamp")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    t = F.col(ts_col).cast("timestamp")
    agg = (
        df.filter(t.isNotNull() & (t <= F.lit(as_of).cast("timestamp")))
        .groupBy(entity_col)
        .agg(
            (
                F.unix_micros(F.lit(as_of).cast("timestamp"))
                - F.max(F.unix_micros(t))
            ).alias("recency_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"), 6
            ).alias("monetary"),
        )
        .withColumn("recency_s", F.round(F.col("recency_us") / 1e6, 6))
        .drop("recency_us")
    )
    e = F.col(entity_col)
    r_w = Window.orderBy(F.col("recency_s").asc(), e.asc())   # fresher = higher score later
    f_w = Window.orderBy(F.col("frequency").desc(), e.asc())
    m_w = Window.orderBy(F.col("monetary").desc(), e.asc())
    return (
        agg.withColumn("r_score", (F.lit(n_bins + 1) - F.ntile(n_bins).over(r_w)).cast("int"))
        .withColumn("f_score", (F.lit(n_bins + 1) - F.ntile(n_bins).over(f_w)).cast("int"))
        .withColumn("m_score", (F.lit(n_bins + 1) - F.ntile(n_bins).over(m_w)).cast("int"))
    )


def impute(
    df: DataFrame,
    value_col: str,
    strategy: str = "mean",
    group_col: str | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """NULL imputation: fill missing values with the (optionally
    per-group) mean / median / mode — the last transform before a model
    sees a numeric column.  Adds ``{value_col}_imputed`` plus a
    ``{value_col}_was_null`` indicator (the missingness signal is a
    feature; silently erasing it loses information — same reasoning as
    the featurizer's ``{col}_missing`` column).

    Determinism: mean uses the order-proof decimal-sum pattern, median
    the engine-shared exact percentile, mode breaks count ties by the
    smallest value.  A group whose statistic is undefined (all NULL)
    leaves its rows NULL (imputing across groups would leak).  Plan:
    one grouped (or global) aggregate broadcast back + a narrow
    projection; mode's rank window runs over the distinct-values count
    table, never the rows."""
    from pyspark.sql import Window

    if strategy not in ("mean", "median", "mode"):
        raise ValueError(f"unknown strategy {strategy!r}: mean|median|mode")
    out_col = out_col or f"{value_col}_imputed"
    v = F.col(value_col).cast("double")
    groups = [group_col] if group_col else []
    if strategy == "mean":
        stat = F.round(
            F.sum(v.cast("decimal(18,6)")).cast("double") / F.count(v), 6
        ).alias("__fill")
        fills = df.groupBy(*groups).agg(stat) if groups else df.agg(stat)
    elif strategy == "median":
        stat = F.round(F.percentile(v, F.lit(0.5)), 6).alias("__fill")
        fills = df.groupBy(*groups).agg(stat) if groups else df.agg(stat)
    else:  # mode: most frequent value, count ties -> smallest value
        counts = (
            df.filter(v.isNotNull())
            .groupBy(*groups, v.alias("__val"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        w = Window.partitionBy(*groups).orderBy(
            F.desc("__cnt"), F.col("__val").asc()
        )
        fills = (
            counts.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(*groups, F.col("__val").alias("__fill"))
        )
    if group_col:
        joined = df.join(F.broadcast(fills), group_col, "left")
    else:
        # constant-key LEFT join, not crossJoin: an EMPTY fills frame
        # (global mode over all-NULL input) must keep the rows, not
        # annihilate them
        joined = (
            df.withColumn("__j", F.lit(1))
            .join(
                F.broadcast(fills.withColumn("__j", F.lit(1))), "__j", "left"
            )
            .drop("__j")
        )
    return (
        joined.withColumn(f"{value_col}_was_null", v.isNull())
        .withColumn(out_col, F.coalesce(v, F.col("__fill")))
        .drop("__fill")
    )
