"""Training-batch assembly over image metadata: aspect-ratio bucket
batching and byte-budget shard manifests.

Both operators are METADATA-ONLY: they read ``(w, h)`` ints or a byte
length, never the image payload, so at 10^12 rows they run as narrow
column-pruned scans over the catalog columns — the decode stage
(featurize.py) is never on their path.  This mirrors how production
diffusion/vision trainers plan epochs (SDXL-style aspect bucketing,
WebDataset-style shard layout) from the table's metadata before any
pixel is touched.  Reference contrast: pic2vec resizes every image to
one fixed ``target_size`` (feature_preprocessing.py:244-263) and has
no batch/shard planning at all; these operators are what replaces that
single-shape assumption when the corpus is heterogeneous and too large
to enumerate on one machine.

Aspect bucketing
----------------
``aspect_bucket_assign`` picks, per image, the bucket minimizing the
aspect-ratio distance ``|w/h - bw/bh|``.  Evaluated as
``abs(w*bh - bw*h) / bh`` — the image-constant ``1/h`` factor is
dropped, the numerator is EXACT integer arithmetic in a double, and
the single division by the small constant ``bh`` is the one rounding
step.  Both Spark and DuckDB perform that identical IEEE-754 division
on identical exact operands, so argmin (first-lowest-index tie-break)
is bit-for-bit reproducible across engines — the whole assignment is a
zero-shuffle whole-stage-codegen projection (array_min/array_position
over a compile-time array), no UDF.

``aspect_bucket_batches`` then numbers images inside each bucket
(deterministic ``id`` order) into fixed-size batches.  Per-bucket
numbering is a window over ``bucket_idx`` — with a handful of buckets
that partitioning is inherently coarse, so for cluster scale the
``n_shards`` knob refines it to ``(bucket, shard)`` where ``shard =
pmod(xxhash64(id), n_shards)``: batches stay homogeneous in shape
(that is the only training requirement), the sort becomes
embarrassingly parallel across ``buckets x n_shards`` groups, and the
assignment stays deterministic and partition-invariant.

Shard manifests
---------------
``shard_manifest`` lays a deterministic id-ordered corpus into
fixed-byte-budget output shards: ``shard_id = floor(start_offset /
shard_bytes)`` over the exclusive prefix sum of byte sizes
("concatenate then split at budget boundaries").  The global prefix
sum is computed WITHOUT a single-partition window: a coarse
order-consistent bucket column splits the sort into per-bucket local
window cumsums, per-bucket totals (one tiny row per bucket) get their
exclusive prefix via a window over that bounded frame, and a broadcast
join adds the bucket prefix back — two shuffles of the fact table at
most, and the only single-partition stage runs over ``n_buckets``
rows.  This is the textbook two-phase scan and it survives 100x: the
heavy stages key on the bucket column, whose count the caller scales
with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (bucket_w, bucket_h) resize targets spanning tall 1:4 to wide 4:1
# around a ~64^2 pixel area — the SDXL bucket-list shape scaled to the
# synthetic corpus' size range.  Callers training at 1024^2 pass their
# own list; the operators take any non-empty [(bw, bh), ...].
DEFAULT_ASPECT_BUCKETS: tuple[tuple[int, int], ...] = (
    (32, 128),
    (48, 96),
    (56, 72),
    (64, 64),
    (72, 56),
    (96, 48),
    (128, 32),
)


def _check_buckets(buckets) -> list[tuple[int, int]]:
    bl = [(int(bw), int(bh)) for bw, bh in buckets]
    if not bl:
        raise ValueError("buckets must be a non-empty list of (bw, bh)")
    if any(bw <= 0 or bh <= 0 for bw, bh in bl):
        raise ValueError(f"bucket dims must be positive ints, got {bl}")
    return bl


def aspect_bucket_assign(
    images: DataFrame,
    buckets=DEFAULT_ASPECT_BUCKETS,
    *,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Add ``bucket_idx`` / ``bucket_w`` / ``bucket_h``: the bucket
    minimizing ``|w/h - bw/bh|`` (first lowest index on exact ties).
    Rows with NULL or non-positive dims get NULL in all three columns
    — the caller decides whether to route them to a quarantine bucket.
    Pure projection: no shuffle, no UDF.
    """
    bl = _check_buckets(buckets)
    w, h = F.col(w_col), F.col(h_col)
    dists = F.array(
        *[
            F.abs(w * F.lit(bh) - F.lit(bw) * h).cast("double")
            / F.lit(float(bh))
            for bw, bh in bl
        ]
    )
    ok = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    out = images.withColumn("_d", F.when(ok, dists)).withColumn(
        # array_position is 1-based; first occurrence of the exact min
        "bucket_idx",
        (F.expr("array_position(_d, array_min(_d))") - 1).cast("int"),
    )
    bw_arr = F.array(*[F.lit(bw) for bw, _ in bl])
    bh_arr = F.array(*[F.lit(bh) for _, bh in bl])
    has = F.col("bucket_idx").isNotNull()
    return (
        out.withColumn(
            "bucket_w",
            F.when(has, F.element_at(bw_arr, F.col("bucket_idx") + 1)),
        )
        .withColumn(
            "bucket_h",
            F.when(has, F.element_at(bh_arr, F.col("bucket_idx") + 1)),
        )
        .drop("_d")
    )


def aspect_bucket_batches(
    images: DataFrame,
    batch_size: int,
    buckets=DEFAULT_ASPECT_BUCKETS,
    *,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    n_shards: int = 1,
) -> DataFrame:
    """Deterministic fixed-size batches inside aspect buckets:
    ``(id, bucket_idx, bucket_w, bucket_h, batch_idx, batch_full)``.
    Rows without a bucket (NULL/non-positive dims) are dropped.

    ``n_shards > 1`` forms batches within ``(bucket, shard)`` groups
    (``shard = pmod(xxhash64(id), n_shards)``) so the per-bucket sort
    parallelizes at cluster scale; batch ids are then globally unique
    via ``batch_idx = local_idx * n_shards + shard``.  Every batch is
    still single-bucket (shape-homogeneous) — only which rows share a
    batch changes, which training does not care about.
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    asg = aspect_bucket_assign(
        images, buckets, w_col=w_col, h_col=h_col
    ).filter(F.col("bucket_idx").isNotNull())
    if n_shards == 1:
        shard = F.lit(0)
    else:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    asg = asg.withColumn("_shard", shard)
    win = Window.partitionBy("bucket_idx", "_shard").orderBy(id_col)
    grp = Window.partitionBy("bucket_idx", "_shard")
    local = F.floor((F.row_number().over(win) - 1) / batch_size)
    return (
        asg.withColumn("_local", local)
        .withColumn("_n", F.count(F.lit(1)).over(grp))
        .withColumn(
            "batch_idx", F.col("_local") * n_shards + F.col("_shard")
        )
        .withColumn(
            "batch_full",
            F.col("_local") < F.floor(F.col("_n") / batch_size),
        )
        .select(
            id_col, "bucket_idx", "bucket_w", "bucket_h",
            "batch_idx", "batch_full",
        )
    )


def shard_manifest(
    df: DataFrame,
    shard_bytes: int,
    *,
    id_col: str,
    bytes_col: str = "nbytes",
    bucket_col: str | None = None,
) -> DataFrame:
    """Byte-budget shard layout over the ``id``-ordered corpus:
    ``(id, nbytes, shard_id, shard_offset)`` where ``shard_id =
    floor(start / shard_bytes)`` and ``shard_offset = start mod
    shard_bytes`` over the exclusive prefix sum of ``bytes_col``.
    A row longer than the budget still lands in one shard (its start
    offset decides) — shards are split points of the concatenated
    stream, the WebDataset/tar-shard convention.

    ``bucket_col`` names a coarse ORDER-CONSISTENT bucket (every id in
    bucket b sorts before every id in bucket b+1) that bounds the
    window work per group; omit it only for small frames — a global
    window is a single-partition sort.  The bucket-totals prefix frame
    has one row per bucket, so its window is bounded by construction.
    """
    if shard_bytes <= 0:
        raise ValueError("shard_bytes must be positive")
    nbytes = F.col(bytes_col).cast("long")
    base = df.select(
        F.col(id_col), nbytes.alias("nbytes"),
        (F.lit(0) if bucket_col is None else F.col(bucket_col).cast("long"))
        .alias("_bkt"),
    )
    local_w = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = base.withColumn("_cum", F.sum("nbytes").over(local_w))
    totals = base.groupBy("_bkt").agg(F.sum("nbytes").alias("_tot"))
    prefix_w = (
        Window.orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_tot").over(prefix_w), F.lit(0))
    ).select("_bkt", "_prefix")
    budget = int(shard_bytes)
    return (
        with_local.join(F.broadcast(prefix), "_bkt")
        .withColumn(
            "_start", F.col("_prefix") + F.col("_cum") - F.col("nbytes")
        )
        # integer DIV/pmod, not floor(double division): offsets stay
        # exact past 2^53 total bytes (a petabyte-scale concern)
        .withColumn("shard_id", F.expr(f"_start div {budget}"))
        .withColumn("shard_offset", F.col("_start") - F.col("shard_id") * budget)
        .select(id_col, "nbytes", "shard_id", "shard_offset")
    )
