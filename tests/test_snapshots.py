"""Snapshot layer: write/scan round-trip, lineage, manifest pruning,
kill-and-resume with no partition double-processing."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from pic2vec_spark.snapshots import SnapshotTable


@pytest.fixture()
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet")


def test_write_scan_roundtrip(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    sid = t.write(events, partition_by="user_id", num_partitions=8)
    assert t.current_snapshot_id() == sid
    back = t.scan()
    assert back.count() == events.count()
    assert set(back.columns) == set(events.columns)
    # lineage rows: every partition accounted for, digests nonzero
    lin = t.lineage()
    assert lin.rows.sum() == events.count()
    assert (lin.digest != 0).all()
    assert (lin.write_sec >= 0).all()


def test_snapshot_chain_and_time_travel(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    s1 = t.write(events.limit(100), num_partitions=4)
    s2 = t.write(events, num_partitions=4)
    assert t.manifest(s2)["parent"] == s1
    assert t.scan(s1).count() == 100
    assert t.scan(s2).count() == events.count()
    assert t.current_snapshot_id() == s2


def test_manifest_stats_pruning(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    t.write(events, partition_by="user_id", num_partitions=8, stats_cols=["user_id"])
    man = t.manifest()
    assert all("user_id" in p["stats"] for p in man["partitions"])
    uid = events.first()["user_id"]
    pruned = t.scan(min_stats={"user_id": (uid, uid)})
    full = t.scan()
    # pruning must preserve all matching rows while reading <= all files
    assert (
        pruned.filter(f"user_id = {uid}").count()
        == full.filter(f"user_id = {uid}").count()
    )
    kept = [
        p for p in man["partitions"]
        if p["stats"]["user_id"][0] <= uid <= p["stats"]["user_id"][1]
    ]
    assert len(kept) < len(man["partitions"])


def test_kill_and_resume_no_double_processing(spark, events, tmp_path):
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    # run 1: crash after >=3 partitions are written
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.write(
            events, partition_by="user_id", num_partitions=8,
            fail_after_partitions=3,
        )
    assert t.current_snapshot_id() is None  # nothing committed
    partials = list((Path(root) / "snapshots").glob("*.partials"))
    assert len(partials) == 1
    sid = partials[0].name.replace(".partials", "")
    pre_files = {
        f.name: f.stat().st_mtime_ns for f in (Path(root) / "data").glob("*.parquet")
    }
    assert len(pre_files) >= 3

    # run 2: resume the same snapshot id
    sid2 = t.resume(events, sid, partition_by="user_id", num_partitions=8)
    assert sid2 == sid
    assert t.current_snapshot_id() == sid
    back = t.scan()
    assert back.count() == events.count()
    # pre-crash partition files were NOT rewritten (no double-processing)
    for name, mtime in pre_files.items():
        assert (Path(root) / "data" / name).stat().st_mtime_ns == mtime
    # and the manifest's lineage covers each pid exactly once
    lin = t.lineage()
    assert lin.pid.is_unique
    assert lin.rows.sum() == events.count()


def test_crash_preserves_previous_snapshot(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    s1 = t.write(events.limit(50), num_partitions=2)
    with pytest.raises(RuntimeError):
        t.write(events, num_partitions=8, fail_after_partitions=2)
    # reader still sees s1, untouched
    assert t.current_snapshot_id() == s1
    assert t.scan().count() == 50


def test_resume_recovers_properties(spark, events, tmp_path):
    """A resumed write must not lose the original write's properties
    (e.g. plan_fingerprint): they are recorded in _mode.json at first
    write and recovered when resume() is called without properties."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    props = {"plan_fingerprint": "squeezenet/d1/seed0/n256/v2"}
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.write(
            events, partition_by="user_id", num_partitions=8,
            fail_after_partitions=3, properties=props,
        )
    sid = next((Path(root) / "snapshots").glob("*.partials")).name.replace(
        ".partials", ""
    )
    t.resume(events, sid, partition_by="user_id", num_partitions=8)
    assert t.manifest()["properties"] == props


def test_merge_upsert_copy_on_write(spark, events, tmp_path):
    """merge(): updated keys replaced, new keys inserted, untouched
    partitions carried forward file-identical (copy-on-write at
    partition granularity), lineage rows present for rewritten ones."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    # range-clustered layout (partition on a key bucket, the feature-
    # store norm): per-partition event_id stats are then DISJOINT
    # ranges, which is what lets merge carry untouched files forward
    base = events.select(
        "event_id", "user_id", "value",
        (F.col("event_id") / 100).cast("long").alias("key_bucket"),
    )
    t.write(base, partition_by="key_bucket", num_partitions=8,
            stats_cols=["event_id"])
    old_files = {p["file"] for p in t.manifest()["partitions"]}

    # update a narrow key slice + insert brand-new keys
    upd = base.filter(F.col("event_id") < 50).withColumn(
        "value", F.col("value") + F.lit(1000.0)
    )
    new = base.filter(F.col("event_id") < 10).select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "user_id",
        F.lit(-1.0).alias("value"),
        ((F.col("event_id") + 10_000_000) / 100).cast("long").alias("key_bucket"),
    )
    sid = t.merge(upd.unionByName(new), "event_id")

    out = t.scan().toPandas().set_index("event_id").sort_index()
    raw = base.toPandas().set_index("event_id").sort_index()
    assert len(out) == len(raw) + 10  # inserts
    updated = out.loc[out.index < 50, "value"]
    assert (updated.values == raw.loc[raw.index < 50, "value"].values + 1000.0).all()
    untouched = out.loc[(out.index >= 50) & (out.index < 10_000_000), "value"]
    assert (untouched.values == raw.loc[raw.index >= 50, "value"].values).all()
    assert (out.loc[out.index >= 10_000_000, "value"] == -1.0).all()

    man = t.manifest(sid)
    carried = {p["file"] for p in man["partitions"]} & old_files
    assert man["properties"]["merge_carried"] == len(carried)
    assert man["properties"]["merge_touched"] > 0
    # copy-on-write: at least one parent file survives verbatim when the
    # update keys cluster in a subset of the key space
    assert carried, "expected untouched partitions to carry forward"
    # every rewritten partition has a fresh lineage row with a digest
    new_parts = [p for p in man["partitions"] if p["file"] not in old_files]
    assert new_parts and all(p["digest"] != 0 for p in new_parts if p["rows"])


def test_merge_rejects_duplicate_update_keys(spark, events, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    base = events.select("event_id", "value").limit(20)
    t.write(base, partition_by="event_id", num_partitions=2,
            stats_cols=["event_id"])
    dup = base.limit(2).unionByName(base.limit(2))
    with pytest.raises(ValueError, match="unique per merge key"):
        t.merge(dup, "event_id")


def test_merge_crash_preserves_parent_and_retry_succeeds(
    spark, events, tmp_path
):
    """A merge killed mid-write leaves CURRENT on the parent snapshot
    (old data fully readable); retrying the same merge from scratch
    lands the correct final state — kill-and-resume-safe CDC."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    base = events.select("event_id", "value")
    s1 = t.write(base, partition_by="event_id", num_partitions=8,
                 stats_cols=["event_id"])
    upd = base.withColumn("value", F.lit(7.0))  # touches every partition
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.merge(upd, "event_id", fail_after_partitions=2)
    assert t.current_snapshot_id() == s1  # parent intact
    assert t.scan().count() == base.count()
    sid = t.merge(upd, "event_id")
    assert t.current_snapshot_id() == sid
    vals = t.scan().select("value").distinct().collect()
    assert [r["value"] for r in vals] == [7.0]


def test_merge_without_stats_rewrites_everything(spark, events, tmp_path):
    """No per-partition key stats -> every partition is a candidate:
    still correct, and the manifest records merge_carried == 0."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    base = events.select("event_id", "value").limit(100)
    t.write(base, partition_by="event_id", num_partitions=4)  # no stats
    upd = base.limit(5).withColumn("value", F.lit(0.5))
    sid = t.merge(upd, "event_id")
    man = t.manifest(sid)
    assert man["properties"]["merge_carried"] == 0
    out = t.scan().toPandas()
    assert len(out) == 100
    assert (out.value == 0.5).sum() == 5


def test_compact_bin_packs_small_files(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    # 1 big partition + many small appends = the streaming-accretion shape
    big = events.limit(600)
    rest = events.exceptAll(big)
    t.write(big, num_partitions=1, stats_cols=["user_id"])
    t.append(rest, num_partitions=12, stats_cols=["user_id"])
    before = t.lineage()
    n_rows = events.count()
    assert before.rows.sum() == n_rows and len(before) == 13

    sid = t.compact(target_rows=500)
    assert sid is not None and t.current_snapshot_id() == sid
    after = t.lineage()
    # the big file was carried forward untouched (same file name)
    big_files = set(before[before.rows >= 500].file)
    assert big_files <= set(after.file)
    # small files were packed: strictly fewer files, same total rows
    assert len(after) < len(before)
    assert after.rows.sum() == n_rows
    # data is identical across the rewrite
    assert t.scan().exceptAll(events).count() == 0
    assert events.exceptAll(t.scan()).count() == 0
    # stats were re-derived so merge() pruning still works
    man = t.manifest()
    assert all(p.get("stats", {}).get("user_id") for p in man["partitions"])
    assert man["properties"]["compact_in_files"] == 12
    assert man["parent"] is not None


def test_compact_noop_and_validation(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    t.write(events, num_partitions=2, stats_cols=["user_id"])
    # both partitions are >= target: nothing to pack
    assert t.compact(target_rows=10) is None
    with pytest.raises(ValueError):
        t.compact(target_rows=0)
    with pytest.raises(FileNotFoundError):
        SnapshotTable(str(tmp_path / "nope"), spark).compact(target_rows=10)


def test_compact_then_merge_still_prunes(spark, events, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    t.write(events, partition_by="event_id", num_partitions=10,
            stats_cols=["event_id"])
    # make the layout small-file-heavy, then compact
    t.append(events.limit(40), num_partitions=8, stats_cols=["event_id"])
    # (the 40 appended rows duplicate event_ids; merge below keys on
    # event_id so dedupe first via compaction-data equality is not the
    # goal here — pruning behavior is)
    sid = t.compact(target_rows=100000)  # packs everything into 1 file
    assert sid is not None
    man = t.manifest()
    live = [p for p in man["partitions"] if p["rows"] > 0]
    assert len(live) == 1
    # merge on the compacted snapshot works and records touched counts
    one = t.scan().limit(1)
    from pyspark.sql import functions as F
    upd = one.withColumn("value", F.lit(-1.0))
    t.merge(upd, key="event_id", stats_cols=["event_id"])
    assert t.manifest()["properties"]["merge_touched"] >= 1


def test_delete_copy_on_write(spark, events, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    ev = events.withColumn(
        "key_bucket", (F.col("event_id") / 100).cast("long")
    )
    t.write(ev, partition_by="key_bucket", num_partitions=8,
            stats_cols=["event_id"])
    before_files = set(t.lineage().file)
    n = ev.count()

    # delete a narrow key range (hits few partitions) + one ghost key
    doomed = ev.filter(F.col("event_id") <= 30).select("event_id")
    ghost = spark.createDataFrame([(10**12,)], "event_id bigint")
    n_del = doomed.count()
    t.delete(doomed.unionByName(ghost), key="event_id")

    back = t.scan()
    assert back.count() == n - n_del
    assert back.filter(F.col("event_id") <= 30).count() == 0
    # untouched partitions carried forward (files reused)
    man = t.manifest()
    assert man["properties"]["delete_key"] == "event_id"
    assert man["properties"]["delete_carried"] >= 1
    carried = before_files & set(t.lineage().file)
    assert len(carried) == man["properties"]["delete_carried"]
    # parent still has the rows (time travel)
    assert t.scan(man["parent"]).count() == n


def test_delete_without_stats_and_errors(spark, events, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    with pytest.raises(FileNotFoundError):
        t.delete(events.select("event_id"), key="event_id")
    t.write(events, num_partitions=4)  # no stats -> full rewrite, still correct
    n = events.count()
    doomed = events.limit(25).select("event_id")
    t.delete(doomed, key="event_id")
    assert t.scan().count() == n - 25
    assert t.manifest()["properties"]["delete_touched"] == 4


def test_append_schema_evolution(spark, events, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    base = events.select("event_id", "user_id", "value")
    t.write(base.limit(100), num_partitions=2)
    extra = (
        base.exceptAll(base.limit(100)).limit(50)
        .withColumn("quality", F.lit(0.9))
    )
    # evolution is opt-in
    with pytest.raises(ValueError, match="allow_evolution"):
        t.append(extra, num_partitions=1)
    t.append(extra, num_partitions=1, allow_evolution=True)
    back = t.scan()
    assert set(back.columns) == {"event_id", "user_id", "value", "quality"}
    pdf = back.toPandas()
    assert len(pdf) == 150
    # pre-evolution rows surface NULL in the new column
    assert pdf.quality.isna().sum() == 100
    assert (pdf.quality.dropna() == 0.9).all()
    # dropping or retyping a column is refused outright
    with pytest.raises(ValueError, match="missing columns"):
        t.append(extra.drop("value"), num_partitions=1, allow_evolution=True)
    with pytest.raises(ValueError, match="retyped columns"):
        t.append(
            extra.withColumn("value", F.col("value").cast("string")),
            num_partitions=1, allow_evolution=True,
        )
    # time travel: the pre-evolution snapshot still scans with ITS schema
    first = t.manifest(t.manifest()["parent"])
    assert first is not None
    old = t.scan(first["snapshot_id"])
    assert "quality" not in old.columns and old.count() == 100


def test_evolved_table_survives_compact_delete_merge(spark, events, tmp_path):
    """Maintenance ops after a schema-evolving append must read touched
    files under the MANIFEST schema, not footer inference: pre-evolution
    files lack the new column, and footer sampling used to silently drop
    it from the compacted/merged files AND from the committed manifest
    (every later scan lost the column)."""
    from pyspark.sql import functions as F

    base = events.select("event_id", "user_id", "value").limit(100)
    extra = (
        events.select("event_id", "user_id", "value")
        .exceptAll(base).limit(50)
        .withColumn("quality", F.lit(0.9))
    )
    full_cols = {"event_id", "user_id", "value", "quality"}

    def fresh(name):
        t = SnapshotTable(str(tmp_path / name), spark)
        t.write(base, partition_by="event_id", num_partitions=4,
                stats_cols=["event_id"])
        t.append(extra, partition_by="event_id", num_partitions=2,
                 stats_cols=["event_id"], allow_evolution=True)
        return t

    # compact: every file is below target -> all are rewritten
    t = fresh("compact")
    t.compact(target_rows=1000)
    back = t.scan()
    assert set(back.columns) == full_cols
    pdf = back.toPandas()
    assert len(pdf) == 150 and pdf.quality.isna().sum() == 100
    assert json.loads(t.manifest()["schema"])  # manifest carries quality
    man_cols = {
        f["name"] for f in json.loads(t.manifest()["schema"])["fields"]
    }
    assert man_cols == full_cols

    # delete: touch pre-evolution partitions; evolved column must remain
    t = fresh("delete")
    victims = spark.createDataFrame(
        base.select("event_id").limit(10).toPandas()
    )
    t.delete(victims, "event_id")
    back = t.scan()
    assert set(back.columns) == full_cols
    assert back.count() == 140
    man_cols = {
        f["name"] for f in json.loads(t.manifest()["schema"])["fields"]
    }
    assert man_cols == full_cols

    # merge: updates carry the full evolved schema, touch old partitions
    t = fresh("merge")
    upd = spark.createDataFrame(
        base.limit(5).toPandas()
    ).withColumn("value", F.lit(-1.0)).withColumn("quality", F.lit(0.5))
    t.merge(upd, "event_id")
    back = t.scan()
    assert set(back.columns) == full_cols
    pdf = back.toPandas()
    assert len(pdf) == 150
    assert (pdf.value == -1.0).sum() == 5
    assert (pdf.quality == 0.5).sum() == 5


def test_expire_snapshots_retention_and_orphans(spark, events, tmp_path):
    """expire_snapshots drops old manifests + unreferenced data files
    (the physical-erasure step delete() defers), keeps every file any
    retained snapshot references (incl. carried copy-on-write files),
    removes orphan files from crashed writes, and never touches
    CURRENT.  Time travel inside retention keeps working; beyond it the
    manifest is gone."""
    from pyspark.sql import functions as F

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    base = events.select("event_id", "user_id", "value").limit(100)
    s1 = t.write(base, partition_by="event_id", num_partitions=4,
                 stats_cols=["event_id"])
    # merge rewrites SOME partitions; untouched files are carried into s2
    upd = spark.createDataFrame(
        base.limit(5).toPandas()
    ).withColumn("value", F.lit(-2.0))
    s2 = t.merge(upd, "event_id")
    victims = spark.createDataFrame(base.select("event_id").limit(3).toPandas())
    s3 = t.delete(victims, "event_id")
    # plant an orphan data file (a write that crashed pre-manifest)
    orphan = t.data_dir / "part-deadbeef-00000.parquet"
    orphan.write_bytes(b"not really parquet")

    before = t.scan().toPandas().sort_values("event_id").reset_index(drop=True)

    # dry run deletes nothing
    rep = t.expire_snapshots(keep_last=2, dry_run=True)
    assert s1 in rep["expired_manifests"] and orphan.name in rep["deleted_files"]
    assert (t.snap_dir / f"{s1}.json").exists() and orphan.exists()

    rep = t.expire_snapshots(keep_last=2)
    assert rep["retained"] == sorted([s2, s3])
    assert not (t.snap_dir / f"{s1}.json").exists()
    assert not orphan.exists()
    assert t.current_snapshot_id() == s3

    # current + previous snapshots still scan IDENTICALLY (carried
    # copy-on-write files survived expiry)
    after = t.scan().toPandas().sort_values("event_id").reset_index(drop=True)
    assert after.equals(before)
    assert t.scan(s2).count() == 100
    # beyond retention: gone
    assert t.manifest(s1) is None
    with pytest.raises(FileNotFoundError):
        t.scan(s1)
    # every file the retained manifests reference exists on disk
    for sid in (s2, s3):
        for p in t.manifest(sid)["partitions"]:
            assert (t.data_dir / p["file"]).exists()
    # idempotent + guard
    rep2 = t.expire_snapshots(keep_last=2)
    assert rep2["expired_manifests"] == [] and rep2["deleted_files"] == []
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots(keep_last=0)


def test_expire_protects_resumable_write(spark, events, tmp_path):
    """Routine retention must NOT destroy an uncommitted resumable
    write: its .partials sidecar carries _mode.json and its
    part-<sid>-*.parquet files are excluded from the orphan set, so
    resume() still works after expire_snapshots().  force=True declares
    the write abandoned and reclaims both."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    s1 = t.write(events.limit(20), num_partitions=2)
    s2 = t.write(events.limit(40), num_partitions=2)
    # crash a resumable write: partials + some data files, no manifest
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.write(
            events, partition_by="user_id", num_partitions=8,
            fail_after_partitions=3,
        )
    sid = next(
        d.name.removesuffix(".partials")
        for d in t.snap_dir.glob("*.partials")
        if not (t.snap_dir / f"{d.name.removesuffix('.partials')}.json").exists()
    )
    inflight = sorted(f.name for f in t.data_dir.glob(f"part-{sid}-*.parquet"))
    assert len(inflight) >= 2

    rep = t.expire_snapshots(keep_last=1)
    assert rep["protected_resumable"] == [sid]
    assert s1 in rep["expired_manifests"]
    # sidecar and every in-flight data file survived
    assert (t.snap_dir / f"{sid}.partials" / "_mode.json").exists()
    for name in inflight:
        assert (t.data_dir / name).exists()
    assert not any(name in rep["deleted_files"] for name in inflight)

    # the protected write resumes and commits cleanly
    assert t.resume(events, sid, partition_by="user_id", num_partitions=8) == sid
    assert t.current_snapshot_id() == sid
    assert t.scan().count() == events.count()

    # now crash ANOTHER write and force-expire: declared abandoned
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.write(
            events, partition_by="user_id", num_partitions=8,
            fail_after_partitions=2,
        )
    sid2 = next(
        d.name.removesuffix(".partials")
        for d in t.snap_dir.glob("*.partials")
        if not (t.snap_dir / f"{d.name.removesuffix('.partials')}.json").exists()
    )
    rep2 = t.expire_snapshots(keep_last=1, force=True)
    assert rep2["protected_resumable"] == []
    assert f"{sid2}.partials" in rep2["deleted_partials"]
    assert not (t.snap_dir / f"{sid2}.partials").exists()
    assert not list(t.data_dir.glob(f"part-{sid2}-*.parquet"))
    # the committed table is untouched
    assert t.scan().count() == events.count()
    assert s2 is not None


def test_snapshot_diff_reads_only_churn(spark, events, tmp_path):
    from pyspark.sql import functions as F

    from pic2vec_spark.snapshots import snapshot_diff

    t = SnapshotTable(str(tmp_path / "tbl"), spark)
    ev = events.select("event_id", "user_id", "value").withColumn(
        "key_bucket", (F.col("event_id") / 100).cast("long")
    )
    t.write(ev, partition_by="key_bucket", num_partitions=8,
            stats_cols=["event_id"])
    # updates: bump 3 known keys; insert 1; delete 2 (via merge+delete)
    upd = ev.filter(F.col("event_id").isin(5, 6, 7)).withColumn(
        "value", F.col("value") + 1000.0
    )
    ins = spark.createDataFrame(
        [(10**9, 1, 42.0, 10**7)],
        "event_id bigint, user_id bigint, value double, key_bucket bigint",
    )
    t.merge(upd.unionByName(ins), key="event_id", stats_cols=["event_id"])
    mid = t.current_snapshot_id()
    diff1 = snapshot_diff(t, "event_id").toPandas()
    by = diff1.groupby("change").size().to_dict()
    assert by.get("insert", 0) == 1
    assert by.get("update_pre", 0) == 3 and by.get("update_post", 0) == 3
    assert by.get("delete", 0) in (0, None) or "delete" not in by
    pre = diff1[diff1.change == "update_pre"].set_index("event_id")["value"]
    post = diff1[diff1.change == "update_post"].set_index("event_id")["value"]
    import numpy as np

    assert np.allclose((post - pre).values, 1000.0)

    t.delete(spark.createDataFrame([(5,), (10**9,)], "event_id bigint"),
             key="event_id")
    diff2 = snapshot_diff(t, "event_id", old_sid=mid).toPandas()
    assert (diff2.change == "delete").all() and len(diff2) == 2
    assert set(diff2.event_id) == {5, 10**9}
    # chained diff across two commits: old grandparent -> current
    diff3 = snapshot_diff(
        t, "event_id", old_sid=t.manifest(mid)["parent"]
    ).toPandas()
    b3 = diff3.groupby("change").size().to_dict()
    # key 5: updated then deleted -> net delete; 10**9 inserted+deleted -> absent
    assert b3 == {"delete": 1, "update_pre": 2, "update_post": 2}
    with pytest.raises(ValueError):
        snapshot_diff(t, "event_id", old_sid=None, new_sid=t.manifest(mid)["parent"])


def test_expire_crash_between_steps_converges(spark, events, tmp_path):
    """A crash mid-expiry must not convert an expired COMMITTED snapshot
    into a protected 'resumable' ghost: expiry retires each expired
    snapshot's _mode.json BEFORE unlinking its manifest, so either crash
    window leaves a state the next routine expire fully reclaims."""
    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    s1 = t.write(events.limit(20), num_partitions=2)
    t.write(events.limit(40), num_partitions=2)
    s1_files = sorted(f.name for f in t.data_dir.glob(f"part-{s1}-*.parquet"))
    assert s1_files and (t.snap_dir / f"{s1}.partials" / "_mode.json").exists()

    # crash window A: _mode.json gone, manifest still present -> s1 is
    # still committed; re-run expires it normally
    (t.snap_dir / f"{s1}.partials" / "_mode.json").unlink()
    # crash window B (the round-4 hazard): manifest unlinked, partials
    # dir (sans _mode.json after the fix) + data files left behind
    (t.snap_dir / f"{s1}.json").unlink()

    rep = t.expire_snapshots(keep_last=1)
    assert rep["protected_resumable"] == []
    assert f"{s1}.partials" in rep["deleted_partials"]
    assert not (t.snap_dir / f"{s1}.partials").exists()
    assert not list(t.data_dir.glob(f"part-{s1}-*.parquet"))
    assert t.scan().count() == 40


def test_all_null_column_write_then_valued_append_scans(spark, tmp_path):
    """An all-NULL string column in the first commit must land in
    parquet as STRING (from the declared Spark schema), not the
    pandas-inferred Arrow `null` type (INT32 physical) — otherwise a
    later append where the column has values makes the mixed-file scan
    crash with SchemaColumnConvertNotSupportedException."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    root = str(tmp_path / "tbl")
    t = SnapshotTable(root, spark)
    base = spark.range(10).select(
        F.col("id"),
        F.lit(None).cast("string").alias("keep_id"),
        F.lit(None).cast("double").alias("score"),
    )
    t.write(base, num_partitions=2)
    t.append(
        spark.range(10, 15).select(
            F.col("id"),
            F.concat(F.lit("k"), F.col("id")).cast("string").alias("keep_id"),
            (F.col("id") * 0.5).alias("score"),
        )
    )
    got = t.scan()
    assert got.schema["keep_id"].dataType == T.StringType()
    assert got.schema["score"].dataType == T.DoubleType()
    rows = {r["id"]: (r["keep_id"], r["score"]) for r in got.collect()}
    assert len(rows) == 15
    assert rows[3] == (None, None)
    assert rows[12] == ("k12", 6.0)
