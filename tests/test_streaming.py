"""Structured Streaming: file-source ingest -> incremental featurize
snapshots; watermarked session_window sessionization."""

from __future__ import annotations

import time

import pytest

from pic2vec_spark.plan import FeaturizerPlan
from pic2vec_spark.snapshots import SnapshotTable
from pic2vec_spark.streaming import stream_featurize, streaming_session_counts
from pic2vec_spark.synth import IMAGES_SCHEMA, synth_images_pdf


def _wait(query, timeout_s=120):
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()


def test_stream_featurize_ingests_drops(spark, tmp_path):
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    inp = tmp_path / "drops"
    inp.mkdir()
    all_pdf = synth_images_pdf(24, seed=42)

    # two file drops with overlapping content (replays must be absorbed)
    spark.createDataFrame(all_pdf.iloc[:16], schema=IMAGES_SCHEMA).coalesce(
        1
    ).write.parquet(str(inp / "d1"))
    spark.createDataFrame(all_pdf.iloc[8:], schema=IMAGES_SCHEMA).coalesce(
        1
    ).write.parquet(str(inp / "d2"))

    q = stream_featurize(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_root=str(tmp_path / "feats"),
        plan=plan,
    )
    _wait(q)

    t = SnapshotTable(str(tmp_path / "feats"), spark)
    feats = t.scan().toPandas()
    # every distinct content digest featurized exactly once
    assert feats["__digest"].is_unique
    assert len(feats) > 0
    man = t.manifest()
    assert man["parent"] is not None or len(man["partitions"]) > 0

    # restart with the same checkpoint: no new work, table unchanged
    before = t.current_snapshot_id()
    q2 = stream_featurize(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_root=str(tmp_path / "feats"),
        plan=plan,
    )
    _wait(q2)
    assert t.scan().count() == len(feats)


def test_streaming_session_counts(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "user_id"
    ).withColumnRenamed("user_id", "entity_id")
    src = tmp_path / "events"
    events.coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    out = streaming_session_counts(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_counts").toPandas()

    # batch oracle: gap-sessionize the same data; append mode only emits
    # sessions the final watermark (max_ts - 2h) has passed, so compare
    # the emitted subset exactly and check the withheld remainder is the
    # tail still inside the watermark horizon.
    from pic2vec_spark.ops.windows import sessionize
    import pandas as pd

    batch = sessionize(
        spark.read.parquet(str(src)), gap_s=1800, tiebreak=None
    ).toPandas()
    agg = (
        batch.groupby(["entity_id", "session_id"])
        .agg(start=("ts", "min"), end=("ts", "max"), n=("ts", "size"))
        .reset_index()
    )
    agg["start_us"] = agg.start.astype("int64") // 1000
    agg["end_us"] = agg.end.astype("int64") // 1000 + 1_800_000_000  # end = last + gap
    wm_us = batch.ts.astype("int64").max() // 1000 - 2 * 3600 * 1_000_000
    closed = agg[agg.end_us < wm_us]

    got_set = set(zip(got.entity_id, got.session_start_us, got.n_events))
    exp_set = set(zip(closed.entity_id, closed.start_us, closed.n))
    assert exp_set <= got_set, "a watermark-closed session was not emitted"
    # everything emitted must be a true batch session
    all_set = set(zip(agg.entity_id, agg.start_us, agg.n))
    assert got_set <= all_set
    assert got.n_events.sum() <= events.count()
    assert len(got) >= len(closed) > 0


def test_streaming_asof_matches_batch(spark, tmp_path):
    """Stateful streaming as-of (applyInPandasWithState) over two
    time-ordered drops == batch as-of join on the union."""
    import numpy as np
    import pandas as pd

    from pic2vec_spark.ops.asof import asof_join
    from pic2vec_spark.streaming import streaming_asof
    from pic2vec_spark.synth import synth_timeline_pdf

    tl = synth_timeline_pdf(n_rows=600, n_images=10, n_entities=8, seed=21)
    tl["value"] = np.random.default_rng(4).normal(size=len(tl)).round(6)
    tl = tl[["entity_id", "ts", "row_id", "kind", "value"]]

    # two drops split at the global median ts (event-time ordered between
    # batches — the operator's documented contract)
    cut = tl.ts.quantile(0.5)
    src = tmp_path / "tl"
    src.mkdir()
    spark.createDataFrame(tl[tl.ts <= cut]).coalesce(1).write.parquet(str(src / "d1"))
    spark.createDataFrame(tl[tl.ts > cut]).coalesce(1).write.parquet(str(src / "d2"))

    stream = spark.readStream.schema(
        spark.read.parquet(str(src / "d1")).schema
    ).option("maxFilesPerTrigger", 1).parquet(str(src) + "/*")
    out = streaming_asof(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_asof")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("SELECT row_id, value_asof FROM stream_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )

    feats = tl[tl.kind == "feature"][["entity_id", "ts", "row_id", "value"]]
    queries = tl[tl.kind == "query"][["entity_id", "ts", "row_id"]]
    expected = (
        asof_join(
            spark.createDataFrame(queries),
            spark.createDataFrame(feats),
            value_cols=["value"],
            tiebreak="row_id",
        )
        .select("row_id", "value_asof")
        .toPandas()
        .set_index("row_id")
        .sort_index()
    )
    assert len(got) == len(expected)
    gv = got["value_asof"].astype(float).values
    ev = expected["value_asof"].astype(float).values
    assert ((np.isnan(gv) & np.isnan(ev)) | np.isclose(gv, ev, atol=1e-9)).all()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """In-flight exact dedup: duplicated content across (and within)
    micro-batch files collapses to one row per digest while watermark
    state stays bounded."""
    import pandas as pd

    from pic2vec_spark.streaming import streaming_dedup

    src = tmp_path / "dups"
    src.mkdir()
    pdf = synth_images_pdf(12, seed=42)
    base = pd.Timestamp("2026-01-01 00:00:00")
    pdf["ingest_ts"] = [base + pd.Timedelta(seconds=i) for i in range(len(pdf))]
    # duplicate every row (producer retry), also across the two drops
    dup = pdf.copy()
    dup["ingest_ts"] = dup["ingest_ts"] + pd.Timedelta(seconds=30)
    from pyspark.sql import types as T

    schema_t = T.StructType(
        list(IMAGES_SCHEMA.fields)
        + [T.StructField("ingest_ts", T.TimestampType())]
    )
    spark.createDataFrame(
        pd.concat([pdf, dup.iloc[:6]]), schema=schema_t
    ).coalesce(1).write.parquet(str(src / "d1"))
    spark.createDataFrame(dup.iloc[6:], schema=schema_t).coalesce(
        1
    ).write.parquet(str(src / "d2"))

    stream = spark.readStream.schema(schema_t).parquet(str(src) + "/*")
    out_dir = tmp_path / "out"
    q = (
        streaming_dedup(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _wait(q)
    got = spark.read.parquet(str(out_dir)).toPandas()
    # the 12 source rows carry some synth-duplicate content (hot
    # clusters) — output must have exactly one row per distinct digest
    n_digests = got["__digest"].nunique()
    assert len(got) == n_digests
    assert n_digests <= 12
    assert n_digests >= 6


def test_streaming_rollup_matches_batch_partials(spark, tmp_path):
    """Stream-built hourly histogram partials == batch histogram_rollup
    exactly (same bin arithmetic), for every window the final watermark
    has closed — so backfill and stream feed the same cascade."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(src))

    from pic2vec_spark.streaming import streaming_rollup

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        streaming_rollup(stream, bucket_s=3600, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("hist_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hist_stream").toPandas()
    assert len(got) > 0

    from pic2vec_spark.ops.rollup import histogram_rollup

    batch = histogram_rollup(
        spark.read.parquet(str(src)), "hour"
    ).toPandas()
    bkey = {
        (r.user_id, r.bucket_ts): (r.n_events, list(r.hist))
        for r in batch.itertuples()
    }
    # append mode emits only watermark-closed windows: every emitted row
    # must equal the batch partial bit-for-bit
    for r in got.itertuples():
        assert bkey[(r.user_id, r.bucket_ts)] == (r.n_events, list(r.hist))
    # and the closed set is complete: windows ending before the final
    # watermark (max_ts - 2h) are all present
    wm = batch.bucket_ts.max()  # conservative: last bucket stays open
    import pandas as pd

    max_ts = pd.to_datetime(
        spark.read.parquet(str(src)).agg({"ts": "max"}).collect()[0][0]
    )
    closed = batch[
        batch.bucket_ts + pd.Timedelta(hours=1) < max_ts - pd.Timedelta(hours=2)
    ]
    got_keys = set(zip(got.user_id, got.bucket_ts))
    missing = [
        k for k in zip(closed.user_id, closed.bucket_ts) if k not in got_keys
    ]
    assert not missing, f"watermark-closed windows not emitted: {missing[:3]}"


def test_stream_merge_applies_corrections_in_order(spark, tmp_path):
    """Streaming CDC: two correction file drops upsert into the snapshot
    table; the last correction per key wins, untouched keys survive, and
    the table stays readable between batches."""
    from pyspark.sql import functions as F

    from pic2vec_spark.snapshots import SnapshotTable
    from pic2vec_spark.streaming import stream_merge

    base = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "value")
        .withColumn("seq", F.lit(0).cast("long"))
    )
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    t.write(base, partition_by="event_id", num_partitions=4,
            stats_cols=["event_id"])

    src = tmp_path / "cdc"
    src.mkdir()
    fix1 = base.filter(F.col("event_id") < 30).select(
        "event_id", F.lit(111.0).alias("value"), F.lit(1).cast("long").alias("seq")
    )
    fix2 = base.filter(F.col("event_id") < 10).select(
        "event_id", F.lit(222.0).alias("value"), F.lit(2).cast("long").alias("seq")
    )
    fix1.coalesce(1).write.parquet(str(src / "f1"))
    fix2.coalesce(1).write.parquet(str(src / "f2"))

    q = stream_merge(
        spark, f"{src}/*", str(tmp_path / "ckpt"), root,
        key="event_id", schema=base.schema, order_col="seq",
    )
    q.awaitTermination(120)

    out = t.scan().toPandas().set_index("event_id").sort_index()
    assert len(out) == base.count()
    assert (out.loc[out.index < 10, "value"] == 222.0).all()
    assert (out.loc[(out.index >= 10) & (out.index < 30), "value"] == 111.0).all()
    raw = base.toPandas().set_index("event_id").sort_index()
    assert (
        out.loc[out.index >= 30, "value"].values
        == raw.loc[raw.index >= 30, "value"].values
    ).all()

    # cross-batch staleness: a DELAYED stale correction (seq=1) arriving
    # in a later micro-batch must NOT overwrite the seq=2 rows
    stale = base.filter(F.col("event_id") < 10).select(
        "event_id", F.lit(999.0).alias("value"), F.lit(1).cast("long").alias("seq")
    )
    stale.coalesce(1).write.parquet(str(src / "f3_late"))
    q2 = stream_merge(
        spark, f"{src}/*", str(tmp_path / "ckpt"), root,
        key="event_id", schema=base.schema, order_col="seq",
    )
    q2.awaitTermination(120)
    out2 = t.scan().toPandas().set_index("event_id").sort_index()
    assert (out2.loc[out2.index < 10, "value"] == 222.0).all(), (
        "stale correction overwrote a newer one across batches"
    )


def test_stream_merge_survives_all_null_key_batch(spark, tmp_path):
    """A CDC micro-batch whose rows all carry key=NULL (bad upstream
    extract) must be rejected, not crash the query: NULL keys have no
    merge identity, and F.min/F.max of an all-null column would feed
    None bounds into the stats pruning."""
    from pyspark.sql import functions as F

    from pic2vec_spark.snapshots import SnapshotTable
    from pic2vec_spark.streaming import stream_merge

    base = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "value")
        .withColumn("seq", F.lit(0).cast("long"))
        .limit(50)
    )
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    t.write(base, partition_by="event_id", num_partitions=2,
            stats_cols=["event_id"])
    before = t.scan().toPandas().sort_values("event_id").reset_index(drop=True)

    src = tmp_path / "cdc"
    src.mkdir()
    nulls = spark.createDataFrame(
        [(None, 999.0, 1), (None, 998.0, 1)],
        "event_id bigint, value double, seq long",
    )
    mixed = nulls.union(
        spark.createDataFrame([(3, 777.0, 1)], "event_id bigint, value double, seq long")
    )
    nulls.coalesce(1).write.parquet(str(src / "f1_allnull"))
    mixed.coalesce(1).write.parquet(str(src / "f2_mixed"))

    q = stream_merge(
        spark, f"{src}/*", str(tmp_path / "ckpt"), root,
        key="event_id", schema=base.schema, order_col="seq",
    )
    q.awaitTermination(120)

    after = t.scan().toPandas()
    assert after.event_id.notna().all(), "a NULL-key CDC row was merged"
    assert len(after) == len(before)
    assert float(after.set_index("event_id").loc[3, "value"]) == 777.0


def test_stream_agg_view_matches_direct_and_is_replay_safe(spark, tmp_path):
    """IVM view maintained over 3 micro-batches == direct aggregate of
    all facts; a full replay under a fresh checkpoint changes nothing
    (batch-id guard)."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.ivm import agg_state, finalize_agg
    from pic2vec_spark.streaming import stream_agg_view

    inp = tmp_path / "facts"
    inp.mkdir()
    keys = ["user_id", "event_type"]
    rows = [
        (i % 7, f"t{i % 3}", float(i % 50) if i % 10 else None, i)
        for i in range(300)
    ]
    sdf = spark.createDataFrame(
        rows, "user_id bigint, event_type string, value double, id bigint"
    )
    schema = sdf.drop("id").schema
    for b in range(3):
        sdf.filter(F.col("id") % 3 == b).drop("id").coalesce(1).write.parquet(
            str(inp / f"d{b}")
        )

    root = str(tmp_path / "view")
    q = stream_agg_view(
        spark, str(inp) + "/*", str(tmp_path / "ckpt"), root,
        keys, "value", schema, files_per_trigger=1,
    )
    _wait(q)

    table = SnapshotTable(root, spark)
    got = {
        (r["user_id"], r["event_type"]): (
            r["n_rows"], r["n_vals"], r["sum_value"], r["avg_value"]
        )
        for r in finalize_agg(table.scan().drop("__k"), keys).collect()
    }
    want = {
        (r["user_id"], r["event_type"]): (
            r["n_rows"], r["n_vals"], r["sum_value"], r["avg_value"]
        )
        for r in finalize_agg(
            agg_state(sdf.drop("id"), keys, "value"), keys
        ).collect()
    }
    assert got == want and len(got) == 21
    applied_sid = table.current_snapshot_id()

    # full replay under a FRESH checkpoint: every batch id restarts at 0
    # <= the recorded ivm_last_batch -> skipped, totals unchanged
    q2 = stream_agg_view(
        spark, str(inp) + "/*", str(tmp_path / "ckpt2"), root,
        keys, "value", schema,
    )
    _wait(q2)
    assert table.current_snapshot_id() == applied_sid
    got2 = {
        (r["user_id"], r["event_type"]): (
            r["n_rows"], r["n_vals"], r["sum_value"], r["avg_value"]
        )
        for r in finalize_agg(table.scan().drop("__k"), keys).collect()
    }
    assert got2 == want


def test_streaming_drift_matches_batch_psi(spark, tmp_path):
    """Per-window streaming PSI == the same formula computed in plain
    Python over the batch bin counts — the stream adds windowing and
    state, never different math."""
    import math

    import pandas as pd

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "ev"
    events.coalesce(1).write.parquet(str(src))

    from pic2vec_spark.ops.rollup import hist_bin_col
    from pic2vec_spark.streaming import streaming_drift

    # reference = the whole corpus's own bin counts (PSI of a window
    # against it measures window-vs-global shift)
    from pyspark.sql import functions as F

    ref = [0] * 20
    for r in (
        spark.read.parquet(str(src))
        .select(hist_bin_col("value", 0.0, 100.0, 20).alias("b"))
        .groupBy("b").count().collect()
    ):
        ref[r["b"]] = r["count"]

    stream = spark.readStream.schema(
        spark.read.parquet(str(src)).schema
    ).parquet(str(src))
    q = (
        streaming_drift(stream, ref, bucket_s=3600, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("drift_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM drift_stream").toPandas()
    assert len(got) > 0

    # independent per-window PSI in plain Python
    pdf = spark.read.parquet(str(src)).select(
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("w"),
        hist_bin_col("value", 0.0, 100.0, 20).alias("b"),
    ).toPandas()
    s, k = 0.5, 20
    nr = sum(ref)
    for r in got.itertuples():
        bins = pdf[pdf.w == pd.to_datetime(r.window_ts)].b.value_counts()
        cur = [int(bins.get(i, 0)) for i in range(k)]
        nc = sum(cur)
        assert nc == r.n_events
        psi = sum(
            ((c + s) / (nc + s * k) - (rf + s) / (nr + s * k))
            * math.log(((c + s) / (nc + s * k)) / ((rf + s) / (nr + s * k)))
            for c, rf in zip(cur, ref)
        )
        assert r.psi == pytest.approx(round(psi, 6), abs=2e-6)
    # a window drawn from the reference distribution itself is stable
    assert (got.psi < 0.25).any()


def test_stream_quality_audits_each_batch_once(spark, tmp_path):
    """Per-batch constraint reports land in the audit table exactly once
    (batch-id guard), and a planted bad drop is flagged at ITS batch."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.quality import in_range, not_null
    from pic2vec_spark.streaming import stream_quality

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    inp = tmp_path / "drops"
    inp.mkdir()
    clean = events.filter(F.col("value").between(0, 300))
    good = clean.limit(300)
    bad = clean.exceptAll(good).limit(100).withColumn(
        "value", F.lit(-999.0)
    )
    good.coalesce(1).write.parquet(str(inp / "d1"))
    bad.coalesce(1).write.parquet(str(inp / "d2"))

    q = stream_quality(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_root=str(tmp_path / "audit"),
        constraints=[not_null("event_id"), in_range("value", 0, 300)],
        schema=events.schema,
        files_per_trigger=1,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    audit = SnapshotTable(str(tmp_path / "audit"), spark).scan().toPandas()
    # 2 batches x 2 constraints, each batch audited exactly once
    assert len(audit) == 4
    assert sorted(audit.batch_id.unique()) == [0, 1]
    rng = audit[audit.check_name == "in_range(value,0,300)"]
    by_batch = {int(r.batch_id): (int(r.n_violations), bool(r["pass"])) for _, r in rng.iterrows()}
    assert by_batch[0] == (0, True)
    assert by_batch[1][0] == 100 and by_batch[1][1] is False
    # manifest carries the replay guard
    t = SnapshotTable(str(tmp_path / "audit"), spark)
    man = t.manifest()
    assert man["properties"]["dq_last_batch"] == 1

    # properties carried: a foreign table property set between batches
    # must SURVIVE the next audited batch — the sink merges its
    # dq_last_batch into the parent's properties instead of replacing
    # them wholesale (regression for the first-batch wipe)
    t.append(
        t.scan().limit(0), num_partitions=1,
        properties={**man["properties"], "owner": "dq-team"},
    )
    clean.exceptAll(good).limit(50).coalesce(1).write.parquet(str(inp / "d3"))
    q = stream_quality(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_root=str(tmp_path / "audit"),
        constraints=[not_null("event_id"), in_range("value", 0, 300)],
        schema=events.schema,
        files_per_trigger=1,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    man2 = t.manifest()
    assert man2["properties"]["owner"] == "dq-team"
    assert man2["properties"]["dq_last_batch"] == 2


def test_stream_index_vectors_builds_appends_and_dedups_replays(spark, tmp_path):
    """Streamed IVF ingest: first batch builds, later batches append;
    probe == ivf_topk over everything ingested; a replayed batch id is
    a no-op (no duplicate neighbors)."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.ivf_store import probe_ivf_index
    from pic2vec_spark.ops.knn import ivf_topk, kmeans_centroids, sample_vectors
    from pic2vec_spark.streaming import ivf_index_sink, stream_index_vectors

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    inp = tmp_path / "vecs"
    inp.mkdir()
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(inp / "b1"))
    half_b.coalesce(1).write.parquet(str(inp / "b2"))

    root = str(tmp_path / "ivf_stream")
    q = stream_index_vectors(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        table_root=root,
        centroids=centroids,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    table = SnapshotTable(root, spark)
    man = table.manifest()
    props = man.get("properties") or {}
    assert props.get("ivf_last_batch") == 1
    assert props.get("centroid_digest")  # quantizer digest survives appends
    n_ingested = table.scan().count()
    assert n_ingested == embs.count()

    queries = embs.filter(F.col("vec_id") < 8)
    direct = (
        ivf_topk(embs, queries, centroids, k=5, nprobe=3)
        .toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    )
    stored = (
        probe_ivf_index(root, spark, queries, centroids, k=5, nprobe=3)
        .toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    )
    assert direct[["query_id", "neighbor_id", "rk"]].equals(
        stored[["query_id", "neighbor_id", "rk"]]
    )

    # replayed batch (id == ivf_last_batch: the one foreachBatch can
    # actually replay after a mid-commit failure) must be a no-op
    ivf_index_sink(half_b, 1, root, centroids)
    assert SnapshotTable(root, spark).scan().count() == n_ingested
    # an id BEHIND the stamp is a fresh-checkpoint restart, not a
    # replay — silently dropping it would stop ingest forever
    import pytest as _pt

    with _pt.raises(ValueError, match="checkpoint"):
        ivf_index_sink(half_a, 0, root, centroids)
    # a genuinely new batch still appends
    extra = embs.limit(7).withColumn("vec_id", F.col("vec_id") + 100000)
    ivf_index_sink(extra, 2, root, centroids)
    assert SnapshotTable(root, spark).scan().count() == n_ingested + 7


def test_stream_index_documents_builds_appends_and_dedups_replays(
    spark, tmp_path
):
    """Streamed LSH dedup-index ingest: first batch builds, later
    batches append; the stored pair set == one-shot lsh_candidate_pairs
    over everything ingested; a replayed batch id is a no-op (no
    phantom self-duplicate pairs)."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.dedup import lsh_candidate_pairs
    from pic2vec_spark.ops.dedup_store import neardup_pairs_from_index
    from pic2vec_spark.streaming import lsh_index_sink, stream_index_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    inp = tmp_path / "docs"
    inp.mkdir()
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(inp / "b1"))
    half_b.coalesce(1).write.parquet(str(inp / "b2"))

    root = str(tmp_path / "lsh_stream")
    q = stream_index_documents(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt_lsh"),
        table_root=root,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    table = SnapshotTable(root, spark)
    props = table.manifest().get("properties") or {}
    assert props.get("lsh_last_batch") == 1
    assert props.get("family_digest")  # family survives appends
    n_rows = table.scan().count()

    expect = {
        (r["id1"], r["id2"])
        for r in lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    got = {
        (r["id1"], r["id2"])
        for r in neardup_pairs_from_index(root, spark).collect()
    }
    assert got == expect and expect

    # replayed batch id == stamp: no-op
    lsh_index_sink(half_b, 1, root)
    assert SnapshotTable(root, spark).scan().count() == n_rows
    # an id behind the stamp is a fresh-checkpoint restart — raise
    import pytest as _pt

    with _pt.raises(ValueError, match="checkpoint"):
        lsh_index_sink(half_a, 0, root)
    # a genuinely new batch still appends
    extra = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    lsh_index_sink(extra, 2, root)
    assert SnapshotTable(root, spark).scan().count() > n_rows


def test_stream_index_digests_builds_appends_and_dedups_replays(
    spark, tmp_path
):
    """Streamed EXACT-dup index ingest: first batch builds, later
    batches append; the stored group set == one-shot exact_dedup over
    everything ingested (including a re-keyed re-ingest slice that
    forms real dup groups); a replayed batch id is a no-op and a
    fresh-checkpoint restart raises."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.dedup import exact_dedup
    from pic2vec_spark.ops.dedup_store import (
        duplicate_groups_from_index,
        probe_digest_dedup_index,
    )
    from pic2vec_spark.streaming import digest_index_sink, stream_index_digests

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    inp = tmp_path / "docs"
    inp.mkdir()
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    # second batch re-ingests part of the first under new ids — the
    # stream must link them into dup groups across the batch boundary
    half_b = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )
    half_a.coalesce(1).write.parquet(str(inp / "b1"))
    half_b.coalesce(1).write.parquet(str(inp / "b2"))

    root = str(tmp_path / "dig_stream")
    q = stream_index_digests(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt_dig"),
        table_root=root,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    table = SnapshotTable(root, spark)
    props = table.manifest().get("properties") or {}
    assert props.get("digest_last_batch") == 1
    assert props.get("index") == "digest_dedup"  # identity survives appends
    n_rows = table.scan().count()

    union = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )
    expect = {
        (r["fp_md5"], r["keep_id"], r["n_dups"])
        for r in exact_dedup(union, "doc_id", "text").collect()
    }
    got = {
        (r["fp_md5"], r["keep_id"], r["n_dups"])
        for r in duplicate_groups_from_index(root, spark).collect()
    }
    assert got == expect and {g for g in got if g[2] == 2}

    # the probe gate works against the stream-built index too
    hits = {
        (r["doc_id"], r["keep_id"])
        for r in probe_digest_dedup_index(
            root, spark,
            docs.limit(3).withColumn("doc_id", F.col("doc_id") + 2_000_000),
        ).collect()
    }
    assert hits == {
        (r["doc_id"] + 2_000_000, r["doc_id"]) for r in docs.limit(3).collect()
    }

    # replayed batch id == stamp: no-op
    digest_index_sink(half_b, 1, root)
    assert SnapshotTable(root, spark).scan().count() == n_rows
    # an id behind the stamp is a fresh-checkpoint restart — raise
    import pytest as _pt

    with _pt.raises(ValueError, match="checkpoint"):
        digest_index_sink(half_a, 0, root)
    # a genuinely new batch still appends
    extra = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 3_000_000)
    digest_index_sink(extra, 2, root)
    assert SnapshotTable(root, spark).scan().count() == n_rows + 5


def test_stream_index_fingerprints_builds_appends_and_dedups_replays(
    spark, tmp_path
):
    """Streamed Hamming-index ingest: first batch builds, later batches
    append; the stored pair set == one-shot hamming_neardup_pairs over
    every fingerprint ingested; the probe gate works against the
    stream-built index; a replayed batch id is a no-op and a
    fresh-checkpoint restart raises."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.dedup import hamming_neardup_pairs, simhash
    from pic2vec_spark.ops.dedup_store import (
        neardup_pairs_from_hamming_index,
        probe_hamming_dedup_index,
    )
    from pic2vec_spark.streaming import (
        hamming_index_sink,
        stream_index_fingerprints,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    # the index is signature-agnostic: text simhash exercises it
    # without the image decode cost (same trick as test_dedup_store)
    sims = simhash(docs, "doc_id", "text").localCheckpoint(eager=True)

    inp = tmp_path / "fps"
    inp.mkdir()
    half_a = sims.filter(F.col("doc_id") % 2 == 0)
    half_b = sims.filter(F.col("doc_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(inp / "b1"))
    half_b.coalesce(1).write.parquet(str(inp / "b2"))

    root = str(tmp_path / "ham_stream")
    q = stream_index_fingerprints(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt_ham"),
        table_root=root,
        id_col="doc_id",
        sig_col="simhash",
        max_distance=3,
        bits=60,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    table = SnapshotTable(root, spark)
    props = table.manifest().get("properties") or {}
    assert props.get("hamming_last_batch") == 1
    assert props.get("index") == "hamming_dedup"  # identity survives
    n_rows = table.scan().count()

    def pairs(df):
        return {
            (r["id1"], r["id2"], r["hamming"])
            for r in df.select("id1", "id2", "hamming").collect()
        }

    expect = pairs(
        hamming_neardup_pairs(sims, "doc_id", max_distance=3,
                              sig_col="simhash", bits=60)
    )
    assert pairs(neardup_pairs_from_hamming_index(root, spark)) == expect
    assert expect  # the synth corpus has real near-dup pairs

    # the ingest-time gate works against the stream-built index: a
    # re-keyed re-ingest of a slice must hit its committed originals
    batch = sims.limit(3).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    hits = pairs(
        probe_hamming_dedup_index(root, spark, batch,
                                  id_col="doc_id", sig_col="simhash")
    )
    assert {(r["doc_id"], r["doc_id"] + 1_000_000, 0)
            for r in sims.limit(3).collect()} <= hits

    # replayed batch id == stamp: no-op
    hamming_index_sink(half_b, 1, root, id_col="doc_id",
                       sig_col="simhash")
    assert SnapshotTable(root, spark).scan().count() == n_rows
    # an id behind the stamp is a fresh-checkpoint restart — raise
    with pytest.raises(ValueError, match="checkpoint"):
        hamming_index_sink(half_a, 0, root, id_col="doc_id",
                           sig_col="simhash")
    # a genuinely new batch still appends (5 sigs x 4 chunks = 20 rows)
    extra = sims.limit(5).withColumn(
        "doc_id", F.col("doc_id") + F.lit(2_000_000)
    )
    hamming_index_sink(extra, 2, root, id_col="doc_id", sig_col="simhash")
    assert SnapshotTable(root, spark).scan().count() == n_rows + 20


def test_stream_media_gate_end_to_end(spark, tmp_path):
    """The streaming image-ingest pipeline: drop 1 becomes the corpus
    (all 'new'), drop 2 (odd ∪ re-keyed exact copies ∪ BMP transcodes)
    is classified identically to a one-shot media_ingest_gate over the
    same committed state; replay is a no-op and a fresh-checkpoint
    restart raises."""
    from pyspark.sql import functions as F

    from pic2vec_spark.codecs import decode_image, encode_image
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        build_hamming_dedup_index,
        media_ingest_gate,
    )
    from pic2vec_spark.ops.multimodal import compute_phash
    from pic2vec_spark.streaming import media_gate_sink, stream_media_gate
    from pic2vec_spark.synth import synth_images_df

    images = (
        synth_images_df(spark, 48, seed=42)
        .withColumn("idx", F.substring("image_id", 5, 9).cast("long"))
        .localCheckpoint(eager=True)
    )
    rows = images.collect()
    tc = []
    for r in rows:
        if r["idx"] % 8 != 4:
            continue
        try:
            px = decode_image(r["bytes"], r["fmt"])
        except Exception:
            continue
        tc.append(("tc_" + r["image_id"], encode_image(px, "bmp"), "bmp"))
    b1 = images.filter(F.col("idx") % 2 == 0).select(
        "image_id", "bytes", "fmt"
    )
    b2 = (
        images.filter(F.col("idx") % 2 == 1)
        .unionByName(
            images.filter(F.col("idx") % 8 == 0).withColumn(
                "image_id", F.concat(F.lit("re_"), F.col("image_id"))
            )
        )
        .select("image_id", "bytes", "fmt")
        .unionByName(
            spark.createDataFrame(
                tc, "image_id string, bytes binary, fmt string"
            )
        )
    )
    inp = tmp_path / "imgdrops"
    inp.mkdir()
    b1.coalesce(1).write.parquet(str(inp / "b1"))
    b2.coalesce(1).write.parquet(str(inp / "b2"))

    droot = str(tmp_path / "gate_dig")
    hroot = str(tmp_path / "gate_ham")
    decroot = str(tmp_path / "gate_dec")
    q = stream_media_gate(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt_gate"),
        digest_root=droot,
        hamming_root=hroot,
        decisions_root=decroot,
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()

    dec = SnapshotTable(decroot, spark)
    props = dec.manifest().get("properties") or {}
    assert props.get("gate_last_batch") == 1
    got = dec.scan().collect()
    by_batch = {}
    for r in got:
        by_batch.setdefault(r["batch_id"], {})[r["image_id"]] = (
            r["disposition"], r["keep_id"]
        )
    # drop 1 became the corpus: every row 'new'
    assert set(by_batch[0]) == {r["image_id"] for r in b1.collect()}
    assert all(d == ("new", None) for d in by_batch[0].values())

    # drop 2 classifies exactly like a one-shot gate over the same
    # committed state (fresh reference indexes, append=False)
    droot2 = str(tmp_path / "ref_dig")
    hroot2 = str(tmp_path / "ref_ham")
    build_digest_dedup_index(
        b1, droot2, spark, id_col="image_id", text_col="bytes",
        norm="binary",
    )
    build_hamming_dedup_index(
        compute_phash(b1).filter(F.col("phash64_ok")), hroot2, spark,
    )
    expect = {
        r["image_id"]: (r["disposition"], r["keep_id"])
        for r in media_ingest_gate(
            b2, droot2, hroot2, spark, append=False
        ).collect()
    }
    assert by_batch[1] == expect
    assert {d for d, _ in expect.values()} == {"exact_dup", "near_dup", "new"}
    n_dec = len(got)

    # replayed batch id == stamp: no-op
    media_gate_sink(b2, 1, droot, hroot, decroot)
    assert SnapshotTable(decroot, spark).scan().count() == n_dec
    # an id behind the stamp is a fresh-checkpoint restart — raise
    with pytest.raises(ValueError, match="checkpoint"):
        media_gate_sink(b1, 0, droot, hroot, decroot)
    # a genuinely new batch still gates and appends decisions: an
    # exact re-ingest of batch-2 SURVIVORS must now hit the index
    survivors = [b for b, (d, _) in by_batch[1].items() if d == "new"]
    b3 = b2.filter(F.col("image_id").isin(*survivors)).withColumn(
        "image_id", F.concat(F.lit("x_"), F.col("image_id"))
    )
    media_gate_sink(b3, 2, droot, hroot, decroot)
    dec3 = {
        r["image_id"]: (r["disposition"], r["keep_id"])
        for r in SnapshotTable(decroot, spark).scan()
        .filter(F.col("batch_id") == 2).collect()
    }
    assert set(dec3) == {"x_" + b for b in survivors}
    assert all(d == "exact_dup" for d, _ in dec3.values())


def test_stream_repost_gate_flags_match_brute_force(spark, tmp_path):
    """The streaming repost gate: two time-ordered drops of
    fingerprinted posts; every emitted flag row must equal a driver-side
    brute force of the trailing-24h near-dup counts over the full
    history (time-ordered arrival makes as-of-arrival == retrospective).
    Also pins: within-batch earlier rows count, replay is a no-op, a
    behind-stamp batch raises, and a crash-between-commits replay
    (posts already appended) is value-identical thanks to the event_id
    dedup."""
    from pyspark.sql import functions as F

    from pic2vec_spark.streaming import repost_gate_sink, stream_repost_gate

    T0 = 1_700_000_000_000_000  # epoch us
    H = 3_600_000_000
    A = 0x0123456789ABCDEF
    B = 0x7EDCBA9876543210
    rows = [
        # (user, event, ts_us, phash, batch)
        (1, 10, T0, A, 1),
        (1, 11, T0 + 1 * H, A, 1),            # exact dup of 10
        (2, 20, T0, B, 1),
        (1, 12, T0 + 2 * H, A ^ 0b11, 1),     # near (ham 2) of 10+11
        (1, 13, T0 + 30 * H, A, 2),           # outside every window
        (2, 21, T0 + 25 * H, B ^ 0xFF00, 2),  # ham 8 from 20: not near
        (2, 22, T0 + 26 * H, B ^ 0xFF00, 2),  # exact dup of 21
    ]

    def brute(eid):
        u, _, ts, ph, _ = next(r for r in rows if r[1] == eid)
        prior = [
            r for r in rows
            if r[0] == u and ts - 24 * H <= r[2] < ts
            and bin(r[3] ^ ph).count("1") <= 4
        ]
        exact = [r for r in prior if r[3] == ph]
        gap = min((ts - r[2] for r in prior), default=None)
        return (len(prior), len(exact), gap)

    inp = tmp_path / "postdrops"
    inp.mkdir()
    for b in (1, 2):
        pdf = [
            (r[0], r[1], r[2], r[3]) for r in rows if r[4] == b
        ]
        spark.createDataFrame(
            pdf, "user_id bigint, event_id bigint, ts_us bigint, phash64 bigint"
        ).withColumn(
            "ts", F.timestamp_micros("ts_us")
        ).select("user_id", "event_id", "ts", "phash64").coalesce(
            1
        ).write.parquet(str(inp / f"b{b}"))

    proot = str(tmp_path / "posts")
    froot = str(tmp_path / "flags")
    q = stream_repost_gate(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt"),
        posts_root=proot,
        flags_root=froot,
    )
    _wait(q, 180)

    flags = SnapshotTable(froot, spark)
    got = {
        r["event_id"]: (
            r["prior_neardups"], r["prior_exact"], r["last_gap_us"]
        )
        for r in flags.scan().collect()
    }
    assert set(got) == {r[1] for r in rows}
    for eid in got:
        assert got[eid] == brute(eid), f"event {eid}"
    # spot-check the hand-derived values too (guards the brute force)
    assert got[11] == (1, 1, H)          # within-batch earlier row
    assert got[12] == (2, 0, H)          # near-dups across the batch
    assert got[13] == (0, 0, None)       # 30h gap: outside the window
    assert got[22] == (1, 1, H)          # committed batch-2 sibling? no:
    # 21 and 22 are both in batch 2 — earlier-in-batch again, cross-user
    # isolation (user 1's identical timestamps never leak into user 2)

    props = flags.manifest().get("properties") or {}
    assert props.get("gate_last_batch") == 1  # stream batch ids are 0,1

    # replay of the stamped batch is a no-op
    b2 = spark.read.parquet(str(inp / "b2"))
    n_before = flags.scan().count()
    repost_gate_sink(b2, 1, proot, froot)
    assert flags.scan().count() == n_before

    # a batch behind the stamp means a foreign/reset checkpoint: raise
    with pytest.raises(ValueError, match="behind"):
        repost_gate_sink(b2, 0, proot, froot)

    # crash-between-commits replay: posts already contain batch 3, the
    # flags stamp does not — re-running the sink must produce the same
    # values as a clean run (event_id dedup absorbs the committed copy)
    b3_rows = [(1, 14, T0 + 31 * H, A), (1, 15, T0 + 31 * H + 1, A ^ 0b1)]
    b3 = spark.createDataFrame(
        b3_rows, "user_id bigint, event_id bigint, ts_us bigint, phash64 bigint"
    ).withColumn("ts", F.timestamp_micros("ts_us")).select(
        "user_id", "event_id", "ts", "phash64"
    )
    posts = SnapshotTable(proot, spark)
    posts.append(
        b3.select(
            "user_id", "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "phash64",
        ),
        stats_cols=["ts_us"],
    )  # the simulated half-commit
    repost_gate_sink(b3, 2, proot, froot)
    got3 = {
        r["event_id"]: (
            r["prior_neardups"], r["prior_exact"], r["last_gap_us"]
        )
        for r in flags.scan().filter(F.col("batch_id") == 2).collect()
    }
    # 14: only 13 (T0+30h, same phash) is within [T0+7h, T0+31h) -> 1 prior
    assert got3[14] == (1, 1, H)
    # 15: 13 and 14 are both near (ham 1 / 1) and earlier -> 2 priors,
    # exact 0 (A^0b1 differs from both), gap 1 us to event 14
    assert got3[15] == (2, 0, 1)


def test_stream_video_frame_index_with_string_keys(spark, tmp_path):
    """Streamed VIDEO frame-hash ingest: composite string keys
    (video\\x1fframe) flow through stream_index_fingerprints with
    id_type='string'; after two drops (base corpus, then more base
    videos) the stream-built index gates an incoming requant copy
    exactly like a batch-built index — alignment vote included."""
    import numpy as np
    from pyspark.sql import functions as F

    from pic2vec_spark.codecs import decode_image, encode_image, encode_video
    from pic2vec_spark.ops.multimodal import (
        probe_video_reposts,
        video_frame_phashes,
        video_frames_cid,
    )
    from pic2vec_spark.streaming import stream_index_fingerprints
    from pic2vec_spark.synth import synth_images_pdf

    bases = []
    for _, r in synth_images_pdf(40, seed=42).iterrows():
        try:
            bases.append(decode_image(bytes(r["bytes"]), r["fmt"]))
        except Exception:
            continue
        if len(bases) == 4:
            break
    vids = {}
    for i, px in enumerate(bases):
        w = px.shape[1]
        vids[f"v{i}"] = [np.roll(px, (j * w) // 6, axis=1) for j in range(6)]
    rows = [(k, encode_video(f, "bmp")) for k, f in vids.items()]
    requant = [
        decode_image(encode_image(f, "jpeg"), "jpeg") for f in vids["v2"]
    ]
    batch_rows = [("v2_requant", encode_video(requant, "bmp"))]

    def hashed(rs):
        return video_frame_phashes(
            spark.createDataFrame(rs, "video_id string, bytes binary")
        ).filter(F.col("video_ok"))

    inp = tmp_path / "vfh"
    inp.mkdir()
    video_frames_cid(hashed(rows[:2])).coalesce(1).write.parquet(
        str(inp / "d1")
    )
    video_frames_cid(hashed(rows[2:])).coalesce(1).write.parquet(
        str(inp / "d2")
    )
    root = str(tmp_path / "vid_stream_idx")
    q = stream_index_fingerprints(
        spark,
        input_dir=str(inp) + "/*",
        checkpoint_dir=str(tmp_path / "ckpt_vfh"),
        table_root=root,
        id_col="__cid",
        sig_col="__fh",
        id_type="string",
        max_distance=4,
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    gated = {
        (r.vid1, r.vid2): (r.offset, r.matched_frames)
        for r in probe_video_reposts(
            root, spark, hashed(batch_rows), min_frames=3
        ).collect()
    }
    assert gated[("v2", "v2_requant")] == (0, 6)


def test_stream_datacard_equals_batch_card(spark, tmp_path):
    """Documents streamed in three drops: the finalized streaming card
    equals the batch corpus_datacard row-for-row (the KMV dup row is
    exact below k), and a replayed batch id is a no-op."""
    from pyspark.sql import functions as F

    from pic2vec_spark.ops.datacard import corpus_datacard
    from pic2vec_spark.snapshots import SnapshotTable
    from pic2vec_spark.streaming import (
        datacard_from_state,
        stream_datacard,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang", "source")
    )
    in_dir = str(tmp_path / "in")
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
    q = stream_datacard(
        spark,
        in_dir,
        str(tmp_path / "ckpt"),
        str(tmp_path / "card"),
        schema=docs.schema,
        files_per_trigger=1,
    )
    q.awaitTermination(120)
    table = SnapshotTable(str(tmp_path / "card"), spark)
    got = {
        (r["section"], r["metric"]): r["value"]
        for r in datacard_from_state(table.scan()).collect()
    }
    want = {
        (r["section"], r["metric"]): r["value"]
        for r in corpus_datacard(docs).collect()
    }
    assert got == want
    # replay guard: re-running the same backlog folds nothing twice
    stamp = table.manifest()["properties"]["datacard_last_batch"]
    q2 = stream_datacard(
        spark,
        in_dir,
        str(tmp_path / "ckpt"),
        str(tmp_path / "card"),
        schema=docs.schema,
        files_per_trigger=1,
    )
    q2.awaitTermination(120)
    got2 = {
        (r["section"], r["metric"]): r["value"]
        for r in datacard_from_state(table.scan()).collect()
    }
    assert got2 == want
    assert table.manifest()["properties"]["datacard_last_batch"] == stamp
