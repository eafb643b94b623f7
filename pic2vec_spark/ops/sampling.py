"""Deterministic sampling / splitting operators for training pipelines.

Train/test assignment and per-stratum sampling at 10^12 scale must be
(a) reproducible across runs and engines, (b) stable under re-partitions
and incremental appends (a row's split never changes when new data
arrives), and (c) free of driver-side state.  Both operators here derive
every decision from md5 of the row's own key — no RNG, no global sort,
no collect — so the same row always lands in the same split/sample, and
the DuckDB oracle can recompute the assignment bit-for-bit.

(The reference has no sampling surface; these serve the training-data
pipeline layer, like ops/dedup and ops/text.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_uniform60(key: Column, salt: str = "", offset: float = 0.0) -> Column:
    """Uniform double in [0, 1) from a 60-bit md5 prefix of salt||key —
    the ONE definition shared by kmv_distinct and weighted_sample so
    the cross-engine determinism argument cannot drift between copies.
    NOT exact in a double (60 > 53 mantissa bits): parity rests on both
    engines rounding the int->double cast nearest-even identically and
    the 2^60 division being exact scaling.  ``offset`` (in units of
    2^-60) shifts the numerator — pass 0.5 to guarantee u > 0 for
    log-based keys.  NULL keys yield NULL (callers must filter)."""
    keyed = F.concat(F.lit(salt), key.cast("string")) if salt else key.cast("string")
    h = F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("double")
    if offset:
        h = h + F.lit(offset)
    return h / F.lit(float(1 << 60))


def _hash_bucket(key: Column, salt: str, buckets: int = 100) -> Column:
    """Uniform bucket in [0, buckets): first 8 md5 hex digits of
    salt||key as an integer, mod buckets.  Portable: DuckDB computes the
    identical value via ('0x' || substr(md5(...), 1, 8))::BIGINT."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % buckets


def hash_split(
    df: DataFrame,
    key_col: str,
    test_pct: int = 10,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/test assignment: rows whose hash bucket
    (0-99) falls below ``test_pct`` are 'test', the rest 'train'.

    Narrow projection — no shuffle, no sampling pass; the expected test
    fraction is test_pct/100 with binomial concentration (exact at
    corpus scale).  Changing ``salt`` yields an independent split
    (cross-validation folds = k salts)."""
    if not 0 <= test_pct <= 100:
        raise ValueError(f"test_pct must be in 0..100, got {test_pct}")
    bucket = _hash_bucket(F.col(key_col), salt)
    return df.withColumn(
        out_col,
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")),
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "fold",
    group_col: str | None = None,
    out_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = md5-bucket(key) % k``.

    Same no-RNG/no-shuffle contract as hash_split — a narrow projection
    stable under repartition, incremental append, and re-run, so every
    worker (and every engine: DuckDB computes the identical bucket) maps
    a row to the same fold forever.  ``group_col`` gives GROUP k-fold:
    the bucket is taken over the group key instead of the row key, so an
    entire group (user, session, near-dup cluster) lands in ONE fold —
    the leakage guard for grouped data (train/test contamination via
    rows of the same entity), cf. cluster_safe_split for the near-dup
    variant of the same idea."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    key = F.col(group_col if group_col is not None else key_col)
    return df.withColumn(
        out_col, _hash_bucket(key, salt, buckets=k).cast("int")
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sample of ceil(fraction * n_stratum)
    rows — EXACT per-group proportions (unlike Bernoulli sampling, which
    only hits the fraction in expectation and can empty small strata).

    Rows are ranked inside each stratum by (md5(salt||key), key) — a
    uniform, reproducible order — and the top ceil(fraction*n) kept.
    One shuffle on the stratum key; count and rank share the single
    window partition.  Skew note: a hot stratum concentrates on one
    partition — acceptable because the per-row work is a hash compare;
    for pathological strata pre-split by a salted sub-key and union.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col)
    rk = F.row_number().over(w.orderBy(h.asc(), F.col(key_col).asc()))
    n = F.count(F.lit(1)).over(w)
    return (
        df.withColumn("__rk", rk)
        .withColumn("__n", n)
        .filter(F.col("__rk") <= F.ceil(F.lit(fraction) * F.col("__n")))
        .drop("__rk", "__n")
    )


def weighted_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement, k per
    stratum (Efraimidis–Spirakis A-ES): rank rows by -ln(u)/w ascending
    — u a uniform (0,1) double derived from md5(salt||key), w the row's
    weight — and keep the top k.  Inclusion probability is proportional
    to weight (the exponential-clocks argument), yet there is NO RNG:
    the same row always draws the same u, so the sample is reproducible
    across runs, partitionings and engines, and a SQL oracle recomputes
    the selection bit-for-bit (same md5 -> same u -> same order; an
    engine-libm last-ulp difference in ln() flips a comparison only
    between keys within one ulp — probability ~2^-50 per pair).

    Rows with NULL or non-positive weight are excluded (their clock
    never fires).  One shuffle on the stratum key; WindowGroupLimit
    prunes to O(k) rows per group map-side, like topk_per_entity."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # shared md5->uniform definition; offset=0.5 keeps u > 0 for the log
    u = md5_uniform60(F.col(key_col), salt=salt, offset=0.5)
    rank_key = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(stratum_col).orderBy(
        rank_key.asc(), F.col(key_col).asc()
    )
    # NULL keys hash to NULL and would rank NULLS FIRST in Spark but
    # NULLS LAST in the oracle (the kmv_distinct hazard) — and a NULL
    # key has no reproducible clock anyway: excluded, like weight <= 0
    return (
        df.filter(
            F.col(key_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0)
        )
        .withColumn("__wrk", F.row_number().over(w))
        .filter(F.col("__wrk") <= k)
        .withColumnRenamed("__wrk", "sample_rank")
    )


def walk_forward_splits(
    df: DataFrame,
    ts_col: str,
    cuts: list[str],
    purge_s: float = 0.0,
    embargo_s: float = 0.0,
) -> DataFrame:
    """Purged + embargoed time-series CV fold assignment (Lopez de
    Prado's purged k-fold, the leakage-safe training-split for
    point-in-time features).

    ``cuts`` = n+1 boundary timestamps defining n test windows
    ``[cut_i, cut_{i+1})``.  Per fold, a row is

    - ``test``  if ts in the window;
    - ``train`` if ts <  window start - purge_s  (past, clear of
      look-ahead features computed over windows that straddle the cut)
      or ts >= window end + embargo_s (future, clear of serially
      correlated leakage right after the test block);
    - dropped for that fold otherwise (the purge/embargo moat).

    Walk-forward = keep only train rows before the window (filter
    ``role = 'train' AND ts_us < start_us``); the assignment itself is
    the general purged form so both schemes come from one operator.

    Scale: the fold table is a literal inline array (n folds, driver
    constants) exploded against the input — a narrow per-row map, zero
    shuffle, output <= n x input rows.  All comparisons are on integer
    epoch-us, so the DuckDB oracle reproduces the assignment exactly.
    Output: (fold, role, <input columns>).
    """
    if len(cuts) < 2:
        raise ValueError("walk_forward_splits needs >= 2 cut timestamps")
    purge_us = int(round(purge_s * 1_000_000))
    embargo_us = int(round(embargo_s * 1_000_000))
    folds = F.array(
        *[
            F.struct(
                F.lit(i).alias("fold"),
                F.unix_micros(
                    F.lit(cuts[i]).cast("timestamp")
                ).alias("start_us"),
                F.unix_micros(
                    F.lit(cuts[i + 1]).cast("timestamp")
                ).alias("end_us"),
            )
            for i in range(len(cuts) - 1)
        ]
    )
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    out = df.withColumn("__ts_us", ts_us).select(
        "*", F.explode(folds).alias("__f")
    )
    role = (
        F.when(
            (F.col("__ts_us") >= F.col("__f.start_us"))
            & (F.col("__ts_us") < F.col("__f.end_us")),
            F.lit("test"),
        )
        .when(
            (F.col("__ts_us") < F.col("__f.start_us") - F.lit(purge_us))
            | (F.col("__ts_us") >= F.col("__f.end_us") + F.lit(embargo_us)),
            F.lit("train"),
        )
    )
    return (
        out.withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .withColumn("fold", F.col("__f.fold"))
        .drop("__f", "__ts_us")
    )


def quota_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    cap: int,
    salt: str = "quota",
) -> DataFrame:
    """Corpus mixing by per-source quota: keep at most ``cap`` rows per
    source, chosen by the deterministic md5 rank (uniform within each
    source) — the LLM-corpus recipe step that stops one crawl dump from
    dominating the mixture.  Sources under their cap keep every row.

    Same determinism contract as stratified_sample (md5 order, key
    tiebreak): reproducible across runs/engines/partitionings and
    append-stable in the sense that an already-kept row is only ever
    displaced by a new row that hashes ahead of it.  One shuffle on the
    source key; WindowGroupLimit prunes to O(cap) rows per source
    map-side, so a billion-row source never materializes its tail."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def temperature_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    alpha: float,
    total: int,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture sampling (the mT5/XLM-R recipe): draw
    ~``total`` rows with per-source budgets proportional to
    ``n_source^alpha`` — alpha=1 keeps natural proportions, alpha→0
    flattens toward uniform-over-sources, the standard dial for keeping
    low-resource sources represented without letting the head dominate.
    Within each source, rows are chosen by the deterministic md5 rank
    (same contract as quota_sample); a budget never exceeds the
    source's size, so tiny sources contribute everything they have.

    Budgets use ``floor(round(total * n^alpha / sum(n^alpha), 6))`` —
    rounded before floor so the one transcendental (pow) cannot flip a
    budget across engines at an integer boundary.  Plan: one source
    count aggregate (tiny) broadcast back, one source-keyed rank window
    with WindowGroupLimit-style pruning via the max budget.  Output =
    input rows that made their source's budget."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if total < 1:
        raise ValueError(f"total must be >= 1, got {total}")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    z = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__z")
    )
    caps = (
        counts.crossJoin(F.broadcast(z))
        .select(
            source_col,
            F.least(
                F.col("__n"),
                F.floor(
                    F.round(
                        F.lit(float(total))
                        * F.pow(F.col("__n").cast("double"), F.lit(alpha))
                        / F.col("__z"),
                        6,
                    )
                ).cast("bigint"),
            ).alias("__cap"),
        )
    )
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .join(F.broadcast(caps), source_col)
        .filter(F.col("__rk") <= F.col("__cap"))
        .drop("__rk", "__cap")
    )


def mixture_plan(
    df: DataFrame,
    domain_col: str,
    weight_col: str | None,
    alpha: float,
    budget: int,
) -> DataFrame:
    """Per-domain temperature mixture PLAN (the LLaMA/Pile data-card
    table): given a corpus with a domain column and an optional
    per-row size column (token counts; ``None`` = count rows), emit
    one row per domain with its natural share, the temperature-scaled
    mixture weight ``n^alpha / sum(n^alpha)``, the token budget that
    weight implies, and the resulting epoch count (how many passes
    over the domain the budget requires — the number every mixture
    table in the LLaMA/GPT-3 papers reports).

    Unlike :func:`temperature_sample`, which *draws* the rows, this
    returns the plan itself — the artifact a 100 TB curation run
    publishes before committing to a sampling pass, and the input a
    downstream weighted sampler consumes.

    Determinism contract: domain sizes are exact BIGINT sums; the one
    transcendental (pow) happens on the tiny per-domain aggregate;
    ``target_tokens`` uses ``floor(round(x, 6))`` so a last-ulp pow
    difference cannot flip a budget across engines (same guard as
    ``temperature_sample``); shares/epochs are rounded to 6 decimals.

    Plan shape: one groupBy shuffle on the domain (map-side combined
    exact integer sums), then a single-row total broadcast back — no
    second scan, no window.  At 10^12 rows this is one pass + a
    scalar broadcast.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    n = (
        F.sum(F.col(weight_col).cast("bigint"))
        if weight_col is not None
        else F.count(F.lit(1))
    )
    agg = df.groupBy(domain_col).agg(n.cast("bigint").alias("n_tokens"))
    tot = agg.agg(
        F.sum("n_tokens").cast("double").alias("__tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias(
            "__z"
        ),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__z")
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("__tot"), 6).alias("raw_share"),
            F.round(w, 6).alias("weight"),
            F.floor(F.round(F.lit(float(budget)) * w, 6))
            .cast("bigint")
            .alias("target_tokens"),
            F.round(F.lit(float(budget)) * w / F.col("n_tokens"), 6).alias(
                "epochs"
            ),
        )
    )


def token_budget_sample(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    key_col: str,
    budgets: DataFrame,
    budget_col: str = "target_tokens",
    salt: str = "budget",
) -> DataFrame:
    """Execute a mixture plan: per domain, take documents in the
    deterministic md5 rank order (same contract as quota_sample /
    temperature_sample) while the RUNNING token total stays within the
    domain's budget — the largest prefix whose cumulative ``token_col``
    is <= budget, i.e. greedy fill without splitting documents.
    ``budgets`` is a tiny (domain, budget) frame — typically
    :func:`mixture_plan` output — broadcast into the scan.

    Epochs above 1 are the SAMPLER'S caller's loop (a budget larger
    than the domain's total simply keeps every row); this op never
    duplicates rows, so output is a subset of input and exactly-once
    semantics survive retries.

    Plan shape: one broadcast hash join (no shuffle of the corpus for
    the budget), one per-domain rank window (cumulative BIGINT sum —
    exact arithmetic, RNG-free, partition-invariant).  At 10^12 rows
    the only wide operation is the per-domain sort the window needs —
    the same cost envelope as every other md5-ranked split here.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = (
        Window.partitionBy(domain_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = F.sum(F.col(token_col).cast("bigint")).over(w)
    b = budgets.select(
        domain_col, F.col(budget_col).cast("bigint").alias("__budget")
    )
    return (
        df.join(F.broadcast(b), domain_col)
        .withColumn("__run", run)
        .filter(F.col("__run") <= F.col("__budget"))
        .drop("__run", "__budget")
    )


def epoch_schedule(
    df: DataFrame,
    domain_col: str,
    token_col: str,
    key_col: str,
    plan: DataFrame,
    salt: str = "budget",
) -> DataFrame:
    """Turn a :func:`mixture_plan` into the executable EPOCH SCHEDULE:
    each domain's token target decomposes into ``floor(target /
    n_tokens)`` full passes over the domain plus one partial epoch
    holding the md5-rank prefix that fills the exact integer remainder
    (``target − full·n_tokens`` — BIGINT arithmetic end to end, no
    float epochs).  Output one row per (domain, epoch):
    ``(domain, epoch_idx, epoch_tokens, is_partial)`` — the loop
    spec a training job consumes; the partial epoch's member rows are
    exactly :func:`token_budget_sample` at the remainder budget, so
    schedule and sampler can never disagree.

    Plan shape: the tiny plan frame explodes into epoch rows
    (broadcast-sized); only the partial remainder touches the corpus —
    one broadcast join + one per-domain rank window, the
    token_budget_sample envelope.  Empty partial epochs (remainder
    too small for even the first document) are dropped."""
    p = plan.select(
        domain_col,
        F.col("n_tokens").cast("bigint").alias("__n"),
        F.col("target_tokens").cast("bigint").alias("__t"),
    )
    full = (
        p.withColumn("__full", F.floor(F.col("__t") / F.col("__n")))
        .filter(F.col("__full") > 0)
        .select(
            domain_col,
            F.explode(F.sequence(F.lit(0), F.col("__full") - 1)).alias(
                "epoch_idx"
            ),
            F.col("__n").alias("epoch_tokens"),
            F.lit(False).alias("is_partial"),
        )
    )
    rem = p.select(
        domain_col,
        F.floor(F.col("__t") / F.col("__n")).alias("__full"),
        (F.col("__t") - F.floor(F.col("__t") / F.col("__n")) * F.col("__n"))
        .cast("bigint")
        .alias("__rem"),
    )
    partial_members = token_budget_sample(
        df,
        domain_col,
        token_col,
        key_col,
        rem.filter(F.col("__rem") > 0),
        budget_col="__rem",
        salt=salt,
    )
    partial = (
        partial_members.groupBy(domain_col)
        .agg(F.sum(F.col(token_col).cast("bigint")).alias("epoch_tokens"))
        .join(F.broadcast(rem.select(domain_col, "__full")), domain_col)
        .select(
            domain_col,
            F.col("__full").alias("epoch_idx"),
            "epoch_tokens",
            F.lit(True).alias("is_partial"),
        )
    )
    return full.unionByName(partial)
