"""End-to-end test of the north-rule launch shape: the engine packaged
as a zip and launched via spark-submit --py-files (scripts/submit.sh →
scripts/run_job.py), committing a feature snapshot with per-partition
lineage — the same path a real multi-executor cluster would use with
SPARK_MASTER=yarn/spark://...

Reference parity: pic2vec runs as an in-process library; this engine's
unit of deployment is a spark-submit job (north rule: "run via
spark-submit --py-files on a multi-executor cluster")."""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF_SMOKE = "/root/testdata/sf0.001"


def test_spark_submit_flagship_job(spark, tmp_path):
    """submit.sh packages pic2vec_spark, launches run_job.py in a FRESH
    JVM via spark-submit --py-files, and the job commits a queryable
    snapshot: lineage rows cover every partition, and the output scans
    back with features + zero temporal leakage."""
    from pic2vec_spark.snapshots import SnapshotTable
    from pic2vec_spark.synth import synth_images_df

    n_images = 64
    images_root = str(tmp_path / "images")
    out_root = str(tmp_path / "features")
    SnapshotTable(images_root, spark).write(
        synth_images_df(spark, n_images, seed=42), num_partitions=4
    )

    env = dict(os.environ)
    env["SPARK_MASTER"] = "local[4]"
    proc = subprocess.run(
        [
            str(REPO / "scripts" / "submit.sh"),
            "--images-root", images_root,
            "--events", f"{SF_SMOKE}/events.parquet",
            "--output-root", out_root,
            "--parallelism", "4",
            "--n-images", str(n_images),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # run_job prints ONE summary JSON line on stdout
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["rows"] > 0
    assert summary["partitions"] >= 1
    assert summary["featurize_metrics"]["images"] > 0

    # the committed table scans back from THIS session (cross-JVM
    # round-trip through the snapshot manifest)
    t = SnapshotTable(out_root, spark)
    assert t.current_snapshot_id() == summary["snapshot_id"]
    out = t.scan()
    cols = set(out.columns)
    assert {"entity_id", "features_asof", "ts_us"} <= cols
    assert out.count() == summary["rows"]
    lin = t.lineage(summary["snapshot_id"])
    assert int(lin.rows.sum()) == summary["rows"]
