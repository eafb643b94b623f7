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
