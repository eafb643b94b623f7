"""Bucketed-table co-location: pre-bucketing both sides of a repeated
join on the join key lets Spark plan a SortMergeJoin with NO shuffle
exchange — the storage-level technique that amortizes the shuffle of a
100 TB fact table across every downstream join (write once bucketed,
join forever shuffle-free).  This test proves the engine's session
config + snapshot layout support it end-to-end and pins the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    yield "bucketdemo"
    spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = events.select("event_id", "user_id", "value")
    right = events.select(
        "user_id", F.col("event_type")
    ).distinct()

    (left.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
         .saveAsTable(f"{warehouse}.facts"))
    (right.write.mode("overwrite").bucketBy(8, "user_id").sortBy("user_id")
          .saveAsTable(f"{warehouse}.dims"))

    a = spark.table(f"{warehouse}.facts")
    b = spark.table(f"{warehouse}.dims")
    # force the join strategy under test: disable broadcast so the only
    # shuffle-free option is the bucket-aligned sort-merge join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # THE point: bucket alignment removes both exchanges
        assert "Exchange" not in plan, plan
        # and it is not just a plan trick — the result is right
        n = joined.count()
        plain = left.join(right, "user_id").count()
        assert n == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_bucket_pruning_on_key_filter(spark, warehouse):
    """Point lookups on the bucket key scan only the matching bucket
    files (bucket pruning) — the read-side dividend of bucketing."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    (events.select("event_id", "user_id", "value")
           .write.mode("overwrite").bucketBy(8, "user_id")
           .saveAsTable(f"{warehouse}.pruned"))
    # autoBucketedScan drops the bucketed layout when no join benefits;
    # for key-filter pruning the bucketed scan must be kept
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    t = spark.table(f"{warehouse}.pruned")
    one = t.filter(F.col("user_id") == 3)
    # executedPlan().toString() elides FileScan metadata — read the
    # formatted explain, where bucket pruning is reported explicitly
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    try:
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        assert one.count() == events.filter(F.col("user_id") == 3).count()
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        )
