"""spark-submit entrypoint: the flagship point-in-time featurize job.

Launch (the north-rule launch shape — packaged engine via --py-files):

    scripts/submit.sh --images-root /tmp/tbl/images --events /data/events.parquet \
        --output-root /tmp/tbl/features --parallelism 32 [--resume SNAPSHOT_ID]

Reads the image snapshot table, featurizes (digest-dedup -> CNN pandas
UDF), as-of joins onto the event timeline, and commits the result as a
new snapshot with per-partition lineage.  ``--resume`` finishes an
interrupted commit without re-processing completed partitions.

On a real cluster, replace --master via SPARK_MASTER and size
--parallelism to executors*cores; every stage's partition count derives
from it.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images-root", required=True, help="image SnapshotTable root")
    ap.add_argument("--events", required=True, help="events parquet path")
    ap.add_argument("--output-root", required=True, help="feature SnapshotTable root")
    ap.add_argument("--parallelism", type=int, default=None)
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--resume", default=None, help="snapshot id to resume")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pic2vec_spark.metrics import FeaturizeMetrics
    from pic2vec_spark.pipeline import point_in_time_features
    from pic2vec_spark.plan import FeaturizerPlan
    from pic2vec_spark.session import get_spark
    from pic2vec_spark.snapshots import SnapshotTable

    spark = get_spark("pic2vec_spark_job", parallelism=args.parallelism)
    spark.sparkContext.setLogLevel("WARN")

    images = SnapshotTable(args.images_root, spark).scan()
    ev = spark.read.parquet(args.events)
    img_id = F.concat(
        F.lit("img_"), F.lpad((F.col("event_id") % args.n_images).cast("string"), 9, "0")
    )
    timeline = ev.select(
        F.col("user_id").alias("entity_id"),
        "ts",
        F.when(F.col("event_type") != "purchase", img_id).alias("image_id"),
        F.when(F.col("event_type") == "purchase", F.lit("query"))
        .otherwise(F.lit("feature"))
        .alias("kind"),
        F.col("event_id").alias("row_id"),
    )
    plan = FeaturizerPlan.build("squeezenet", depth=args.depth, autosample=True)

    metrics = FeaturizeMetrics(spark)
    t0 = time.perf_counter()
    out = point_in_time_features(images, timeline, plan, metrics=metrics).withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    ).drop("ts", "ts_asof")
    sink = SnapshotTable(args.output_root, spark)
    if args.resume:
        sid = sink.resume(out, args.resume, partition_by="entity_id")
    else:
        sid = sink.write(out, partition_by="entity_id", stats_cols=["ts_us"])
    sec = time.perf_counter() - t0

    lin = sink.lineage(sid)
    print(
        json.dumps(
            {
                "snapshot_id": sid,
                "rows": int(lin.rows.sum()),
                "partitions": int(len(lin)),
                "sec": round(sec, 2),
                "featurize_metrics": metrics.summary(),
                "lineage_sample": lin.head(3).to_dict("records"),
            },
            default=str,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
