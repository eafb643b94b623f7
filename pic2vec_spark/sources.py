"""Source operators — the reference's three input modes, Spark-first.

pic2vec accepts (1) an image directory, (2) a CSV of image paths/URLs,
(3) CSV + directory combined (/root/reference/pic2vec/
feature_preprocessing.py:229-274 `_image_paths_finder`).  This module
re-expresses each as a DataFrame source over the engine's canonical
image-table schema, replacing positional row identity with explicit
``image_id`` keys:

- S1 directory scan  (feature_preprocessing.py:94-129): binaryFile scan
  + format filter + natural-sort key (S2, :89-91)
- S3 CSV scan        (:132-170): DROPMALFORMED csv read (same
  drop-bad-lines semantics as error_bad_lines=False) + header check
- S4 combined        (:173-226): left join CSV x directory on path;
  missing paths -> '' sentinel semantics (missing=True downstream);
  zero-overlap guard
- S5 dispatcher      (:229-274): three-case routing
- S8 CSV sink        (image_featurizer.py:484-509, naming :804-857):
  pic2vec-compatible wide CSV export with its file-naming convention
"""

from __future__ import annotations

import time as _time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pic2vec_spark.plan import VALID_FORMATS

_EXT_TO_FMT = {
    "jpg": "jpg", "jpeg": "jpg", "png": "png", "bmp": "bmp", "gif": "gif",
}


def natural_sort_key(col):
    """S2: digit-aware sort key so img2 < img10 (reference natural_key,
    feature_preprocessing.py:89-91).  Every digit run is zero-padded to
    width 20, making lexicographic order equal natural order for any
    run up to 20 digits — beyond epoch-nanosecond ids (Spark has no
    per-match callback, so the padding is applied per run width)."""
    pad_to = 20
    padded = F.regexp_replace(F.lower(col), r"(\d+)", r"__NUM$1NUM__")
    out = padded
    for width in range(1, pad_to):
        out = F.regexp_replace(
            out, rf"__NUM(\d{{{width}}})NUM__", "0" * (pad_to - width) + r"$1"
        )
    return F.regexp_replace(out, r"__NUM(\d+)NUM__", r"$1")


def scan_image_directory(spark: SparkSession, directory: str) -> DataFrame:
    """S1: directory -> (image_id=file name, bytes, fmt) for the valid
    formats only, ordered by natural sort key (deterministic canonical
    order, the reference's row identity for dir-only mode)."""
    df = (
        spark.read.format("binaryFile")
        .load(str(Path(directory) / "*"))
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("image_id"),
            F.col("content").alias("bytes"),
        )
        .withColumn(
            "fmt",
            F.lower(F.element_at(F.split(F.col("image_id"), r"\."), -1)),
        )
        .withColumn(
            "fmt",
            F.when(F.col("fmt") == "jpeg", "jpg").otherwise(F.col("fmt")),
        )
        .filter(F.col("fmt").isin(*VALID_FORMATS))
    )
    return df.withColumn("__sort", natural_sort_key(F.col("image_id"))).orderBy(
        "__sort"
    ).drop("__sort")


def scan_csv(
    spark: SparkSession, csv_path: str, image_column: str
) -> DataFrame:
    """S3: CSV scan with DROPMALFORMED (reference error_bad_lines=False)
    + image-column existence check; CSV order is preserved as row_id."""
    df = spark.read.csv(csv_path, header=True, mode="DROPMALFORMED")
    if image_column not in df.columns:
        raise ValueError(
            f"image column {image_column!r} missing from CSV header {df.columns}"
        )
    return df.withColumn("row_id", F.monotonically_increasing_id())


def fetch_url_images(
    spark: SparkSession,
    refs: DataFrame,
    image_column: str,
    timeout_s: float = 30.0,
    allowed_schemes: tuple[str, ...] = ("http", "https"),
) -> DataFrame:
    """S6: URL-mode ingestion — the reference's csv-only path fetches
    every entry as a URL (feature_preprocessing.py:311-317, urlretrieve
    per image on the driver).  Spark-first shape: DISTINCT URLs only
    (the reference's dedup memo — a URL listed in many rows downloads
    once), fetched executor-side in an Arrow-batched ``mapInPandas``
    stage (urllib supports the same schemes urlretrieve does, incl.
    ``file://`` — which is what the tests exercise; no network exists
    in this sandbox).  A failed fetch yields NULL bytes, which decode
    as missing=True + the zero vector downstream — the same failure
    semantics as an unmatched directory ref.

    Output: (image_id=url, bytes, fmt) — fmt from the URL path's
    extension (query strings stripped), invalid/absent extensions kept
    with fmt='' so they surface as missing rather than silently
    dropping CSV rows (csv-only row identity is the CSV itself).

    Scale: one narrow distinct on the URL key, then an embarrassingly
    parallel fetch stage (round-robin repartition so a few huge
    partitions cannot serialize the I/O); bytes never shuffle again —
    downstream featurize joins back on the url key.

    Security: CSV contents are untrusted, and urllib would happily
    fetch any scheme it knows (``file://`` local reads, ``ftp://``,
    internal hosts) — so only ``allowed_schemes`` are attempted
    (http/https by default; tests opt in to ``file``).  A disallowed
    scheme degrades to NULL bytes → missing=True, never an error."""
    import pandas as pd

    schemes = tuple(s.lower() for s in allowed_schemes)

    urls = (
        refs.select(F.col(image_column).alias("image_id"))
        .filter(F.col("image_id").isNotNull() & (F.col("image_id") != ""))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def fetch(batches):
        import urllib.parse
        import urllib.request

        for pdf in batches:
            if not len(pdf):
                continue
            datas = []
            for u in pdf["image_id"]:
                try:
                    if urllib.parse.urlsplit(u).scheme.lower() not in schemes:
                        datas.append(None)
                        continue
                    with urllib.request.urlopen(u, timeout=timeout_s) as r:
                        datas.append(r.read())
                except Exception:
                    datas.append(None)
            yield pd.DataFrame({"image_id": pdf["image_id"], "bytes": datas})

    fetched = urls.mapInPandas(fetch, "image_id string, bytes binary")
    ext = F.lower(
        F.element_at(
            F.split(
                F.element_at(
                    F.split(F.split("image_id", r"\?").getItem(0), "/"), -1
                ),
                r"\.",
            ),
            -1,
        )
    )
    fmt = F.when(ext == "jpeg", "jpg").otherwise(ext)
    return fetched.withColumn(
        "fmt", F.when(fmt.isin(*VALID_FORMATS), fmt).otherwise(F.lit(""))
    )


def combined_csv_directory(
    spark: SparkSession, csv_path: str, image_column: str, directory: str
) -> DataFrame:
    """S4: CSV rows keep their order; paths present in the directory get
    bytes, absent ones get null bytes (the reference's '' sentinel ->
    zero tensor + missing=True downstream). Errors on zero overlap
    (feature_preprocessing.py:216-222)."""
    csv_df = scan_csv(spark, csv_path, image_column)
    dir_df = scan_image_directory(spark, directory).withColumnRenamed(
        "image_id", image_column
    )
    # never force-broadcast the directory side: it carries raw image
    # BYTES (a broadcast would ship every image to the driver and all
    # executors); let AQE pick the join strategy from actual sizes.
    # The zero-overlap guard probes a bytes-free projection instead of
    # forcing a second evaluation of the full join.
    overlap = csv_df.select(image_column).join(
        dir_df.select(image_column), image_column, "inner"
    )
    if overlap.limit(1).count() == 0:
        raise ValueError(
            "Something is wrong: no images in the directory match "
            "the CSV's image column (zero overlap)."
        )
    return csv_df.join(dir_df, image_column, "left")


def image_source(
    spark: SparkSession,
    image_column: str = "image",
    directory: str | None = None,
    csv_path: str | None = None,
) -> DataFrame:
    """S5 dispatcher: dir-only / csv-only / combined, mirroring
    _image_paths_finder's three cases."""
    if directory and not csv_path:
        # dir-only also *creates* the table (ref _create_df_with_image_paths)
        return scan_image_directory(spark, directory).withColumnRenamed(
            "image_id", image_column
        )
    if csv_path and not directory:
        return scan_csv(spark, csv_path, image_column)
    if csv_path and directory:
        return combined_csv_directory(spark, csv_path, image_column, directory)
    raise ValueError("provide directory and/or csv_path")


def named_path(
    csv_name: str,
    model_str: str,
    model_depth: int,
    model_output: int,
    omit_model: bool = False,
    omit_depth: bool = False,
    omit_output: bool = False,
    omit_time: bool = False,
) -> str:
    """S8 naming with all four independent omit switches, mirroring the
    reference's ``_named_path_finder`` exactly — including its gmtime
    ``%d-%b-%Y-%H.%M.%S`` stamp format (image_featurizer.py:804-857)."""
    saved_time = (
        ""
        if omit_time
        else "_({})".format(_time.strftime("%d-%b-%Y-%H.%M.%S", _time.gmtime()))
    )
    saved_model = "" if omit_model else f"_{model_str}"
    saved_depth = "" if omit_depth else f"_depth-{model_depth}"
    saved_output = "" if omit_output else f"_output-{model_output}"
    return f"{csv_name}{saved_model}{saved_depth}{saved_output}{saved_time}"


def csv_compat_name(
    base: str, model: str, depth: int, num_features: int, omit_time: bool = False
) -> str:
    """S8 naming: {base}_{model}_depth-{d}_output-{n}_({time}).csv
    (image_featurizer.py:804-857).  Kept for back-compat; ``named_path``
    carries the full omit-switch set."""
    stamp = "" if omit_time else f"_({_time.strftime('%Y-%m-%d_%H-%M-%S')})"
    return f"{base}_{model}_depth-{depth}_output-{num_features}{stamp}.csv"


def save_csv_compat(
    df: DataFrame,
    path_base: str,
    column: str,
    model: str,
    depth: int,
    num_features: int,
    omit_time: bool = True,
) -> str:
    """S8 sink: widen features to {col}_missing + {col}_feat_i and write
    a single pic2vec-style CSV (driver-side collect — this sink exists
    for fixture-level compatibility, not the 100 TB path; the scale sink
    is a snapshot commit)."""
    from pic2vec_spark.featurize import widen_features

    wide = widen_features(df, column=column, num_features=num_features)
    name = csv_compat_name(path_base, model, depth, num_features, omit_time)
    wide.toPandas().to_csv(name, index=False)
    return name
