"""Distribution-drift detection (Population Stability Index) between
two slices of a table — the monitoring step a feature pipeline runs
before retraining: has the live feature distribution moved away from
the training snapshot?

Both operators compare a *reference* slice against a *current* slice
(any boolean split: time windows, snapshot ids, A/B arms) in ONE scan:

- ``psi_numeric`` — bin a numeric column into fixed-width bins (plus
  explicit under/overflow bins) and compute per-group PSI
  ``sum((p_cur - p_ref) * ln(p_cur / p_ref))`` over observed bins with
  additive smoothing ``p = (cnt + s) / (n + s*K)`` (K = observed bins
  for the group), so empty-on-one-side bins stay finite.
- ``psi_categorical`` — same formula with the category itself as the
  bin; one report row for the whole column.

Fixed bin boundaries (not per-run quantiles) are deliberate: the
assignment of a row to a bin is pure arithmetic on the row, so it is
reproducible across runs/engines (DuckDB oracle recomputes PSI
bit-for-bit modulo one final ln), append-stable, and comparable across
monitoring windows.  The usual convention: PSI < 0.1 stable, 0.1-0.25
moderate shift, > 0.25 drifted.

Plan shape at any scale: one narrow scan -> partial-aggregated
groupBy(group, bin) (output bounded by groups x (nbins+2), never by
row count) -> a window/group pass over that tiny frame.  No UDFs, no
collect; the 100 TB cost is exactly one shuffle of bounded cardinality.

(The reference has no monitoring surface; this serves the training-data
pipeline layer, like ops/stats and ops/quality.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fixed_width_bin(col: Column, lo: float, hi: float, nbins: int) -> Column:
    """Bin index for ``col``: 0 = underflow (< lo), 1..nbins = in-range
    fixed-width bins over [lo, hi), nbins+1 = overflow (>= hi).  NULL
    in -> NULL out (callers decide whether NULLs are a bin)."""
    if not nbins >= 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / nbins
    idx = (F.floor((col - F.lit(lo)) / F.lit(width)) + 1).cast("int")
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(col < F.lit(lo), F.lit(0))
        .when(col >= F.lit(hi), F.lit(nbins + 1))
        # floor can land on nbins+1 when (col-lo)/width rounds up to
        # exactly nbins at the top edge; clamp keeps in-range rows in-range
        .otherwise(F.least(idx, F.lit(nbins)))
    )


def _psi_over_bins(
    counts: DataFrame, group_cols: list[str], smooth: float
) -> DataFrame:
    """PSI from a (group..., __bin, __ref, __cur) counts frame: smooth,
    normalize, sum terms per group.  Observed bins only — K adapts per
    group, which keeps the formula self-contained and oracle-checkable."""
    w = Window.partitionBy(*group_cols)
    s = F.lit(float(smooth))
    dfp = (
        counts.withColumn("__nref", F.sum("__ref").over(w))
        .withColumn("__ncur", F.sum("__cur").over(w))
        .withColumn("__k", F.count(F.lit(1)).over(w))
        .withColumn("__pr", (F.col("__ref") + s) / (F.col("__nref") + s * F.col("__k")))
        .withColumn("__pc", (F.col("__cur") + s) / (F.col("__ncur") + s * F.col("__k")))
    )
    return dfp.groupBy(*group_cols).agg(
        F.first("__nref").alias("n_ref"),
        F.first("__ncur").alias("n_cur"),
        F.first("__k").alias("n_bins"),
        F.round(
            F.sum((F.col("__pc") - F.col("__pr")) * F.log(F.col("__pc") / F.col("__pr"))),
            6,
        ).alias("psi"),
    )


def psi_numeric(
    df: DataFrame,
    group: str,
    value: str,
    is_current: Column,
    lo: float,
    hi: float,
    nbins: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """Per-group PSI of a numeric column between the reference slice
    (``is_current`` false) and the current slice (true).  NULL values
    and NULL slice flags are excluded.  Output: (group, n_ref, n_cur,
    n_bins, psi) — psi rounded to 6 decimals (the one transcendental,
    ln, is last; everything before it is integer/exact arithmetic)."""
    v = F.col(value).cast("double")
    rows = df.filter(v.isNotNull() & is_current.isNotNull()).select(
        F.col(group),
        fixed_width_bin(v, lo, hi, nbins).alias("__bin"),
        is_current.cast("boolean").alias("__cur_f"),
    )
    counts = rows.groupBy(group, "__bin").agg(
        F.sum((~F.col("__cur_f")).cast("bigint")).alias("__ref"),
        F.sum(F.col("__cur_f").cast("bigint")).alias("__cur"),
    )
    return _psi_over_bins(counts, [group], smooth)


def psi_categorical(
    df: DataFrame,
    category: str,
    is_current: Column,
    smooth: float = 0.5,
) -> DataFrame:
    """Whole-column categorical PSI: the category IS the bin.  Output is
    a single report row (n_ref, n_cur, n_bins, psi) — union it with
    other drift rows for a monitoring report.  NULL categories count as
    their own bin (dropping them would hide a drift toward NULLs)."""
    rows = df.filter(is_current.isNotNull()).select(
        F.coalesce(F.col(category).cast("string"), F.lit("<null>")).alias("__bin"),
        is_current.cast("boolean").alias("__cur_f"),
    )
    counts = rows.groupBy("__bin").agg(
        F.sum((~F.col("__cur_f")).cast("bigint")).alias("__ref"),
        F.sum(F.col("__cur_f").cast("bigint")).alias("__cur"),
    ).withColumn("__all", F.lit("all"))
    out = _psi_over_bins(counts, ["__all"], smooth)
    return out.drop("__all")


def psi_from_hist(
    hist: Column,
    ref_counts: list[int],
    smooth: float = 0.5,
) -> Column:
    """PSI of a histogram-array column against a fixed reference
    histogram — the sketch-side PSI for monitoring pipelines where the
    current distribution arrives as re-aggregable bin counts
    (ops/rollup.histogram_rollup partials, streaming windows) instead
    of raw rows.  The bin space is FIXED at len(ref_counts) on both
    sides (K is constant — unlike psi_numeric's observed-bin K, which
    adapts to the data), so partials from any source compare against
    the same reference.  Reference proportions fold to literals at plan
    time; the whole expression is one narrow projection per
    already-aggregated row."""
    k = len(ref_counts)
    if k < 1:
        raise ValueError("ref_counts must be non-empty")
    if min(ref_counts) < 0:
        raise ValueError("ref_counts must be non-negative")
    s = float(smooth)
    n_ref = float(sum(ref_counts))
    pr = F.array(
        *[F.lit((c + s) / (n_ref + s * k)) for c in ref_counts]
    )
    n_cur = F.aggregate(
        hist, F.lit(0).cast("long"), lambda acc, v: acc + v
    ).cast("double")
    denom = n_cur + F.lit(s * k)
    terms = F.zip_with(
        hist,
        pr,
        lambda h, p: ((h + F.lit(s)) / denom - p)
        * F.log(((h + F.lit(s)) / denom) / p),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v), 6
    )


def chi2_from_hist(hist: Column, ref_counts: list[int]) -> Column:
    """Pearson chi-square statistic of a histogram-array column against
    the reference histogram: ``sum((o_i - e_i)^2 / e_i)`` where the
    expected counts ``e_i`` scale the reference proportions to the
    window's total (zero-reference bins get the 0.5 Laplace floor so
    novel-bin mass is penalized, not divided by zero).  Same fixed-bin
    contract and literal-folding plan shape as psi_from_hist; compare
    against chi2 critical values for len(ref)-1 dof."""
    k = len(ref_counts)
    if k < 1:
        raise ValueError("ref_counts must be non-empty")
    n_ref = float(sum(ref_counts))
    if n_ref <= 0:
        raise ValueError("ref_counts must have positive total")
    props = F.array(
        *[F.lit(max(c, 0.5) / n_ref) for c in ref_counts]
    )
    n_cur = F.aggregate(
        hist, F.lit(0).cast("long"), lambda acc, v: acc + v
    ).cast("double")
    terms = F.zip_with(
        hist,
        props,
        lambda o, p: (o - p * n_cur) * (o - p * n_cur) / (p * n_cur),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v), 6
    )


def jsd_from_hist(
    hist: Column, ref_counts: list[int], smooth: float = 0.5
) -> Column:
    """Jensen-Shannon divergence (natural log; in [0, ln 2]) between
    the histogram column and the reference — PSI's bounded, symmetric
    sibling: defined even when a bin is empty on one side, so it is the
    safer alerting metric for small windows.  Same smoothing and
    literal-folding contract as psi_from_hist."""
    k = len(ref_counts)
    if k < 1:
        raise ValueError("ref_counts must be non-empty")
    s = float(smooth)
    n_ref = float(sum(ref_counts))
    pr = F.array(*[F.lit((c + s) / (n_ref + s * k)) for c in ref_counts])
    n_cur = F.aggregate(
        hist, F.lit(0).cast("long"), lambda acc, v: acc + v
    ).cast("double")
    denom = n_cur + F.lit(s * k)
    terms = F.zip_with(
        hist,
        pr,
        lambda h, p: (
            ((h + F.lit(s)) / denom)
            * F.log(
                ((h + F.lit(s)) / denom)
                / ((((h + F.lit(s)) / denom) + p) / F.lit(2.0))
            )
            + p
            * F.log(p / ((((h + F.lit(s)) / denom) + p) / F.lit(2.0)))
        ),
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v) / F.lit(2.0), 6
    )
