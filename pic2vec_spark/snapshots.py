"""Iceberg-style snapshot tables: Parquet + JSON manifests, per-partition
lineage, checkpoint/resume.

No Iceberg runtime jar exists in this environment, so the snapshot layer
is built from scratch — which is exactly the checkpoint/lineage surface
the north rule demands (resumable jobs, per-partition lineage rows with
partition id, snapshot id, row counts, digest, metrics).

Layout of a table directory::

    <root>/
      data/part-<snapshot>-<partition>.parquet     one file per partition
      snapshots/<snapshot_id>.json                 manifest (atomic rename)
      CURRENT                                      text file -> snapshot id

Manifest schema::

    {"snapshot_id", "parent", "created_utc", "schema", "properties", "partitions": [
        {"pid", "file", "rows", "digest", "bytes", "write_sec"}]}

Commit protocol (task-then-driver, idempotent):

1. Each Spark task writes its partition to ``data/`` and emits a lineage
   row (pid, rows, xxhash64 digest, bytes, timing) — via a single
   ``mapInPandas`` pass so data + lineage come from the same scan.
2. The driver writes the manifest JSON to a temp name and atomically
   renames it, then flips ``CURRENT``.  A crash before the rename leaves
   the previous snapshot fully intact (orphan data files are ignored by
   readers and cleaned by the next commit).

Resume: ``resume_missing`` anti-joins the planned partition ids against
the lineage of a partial snapshot directory, so a killed job re-processes
only unfinished partitions — no double-processing (verified by
tests/test_snapshots.py kill-and-resume).

Merge/upsert: ``merge`` is the CDC path — keyed updates REPLACE matching
rows and insert new keys, copy-on-write at partition granularity:
partitions whose key-range stats cannot contain an update key are
carried forward untouched, only overlapping partitions are rewritten
(with fresh lineage rows).  The correction path an incremental feature
store needs when an entity's feature row changes rather than appends.

At 100 TB the manifest stays driver-sized: one JSON row per partition
(~10^5 partitions → MBs), and scan planning prunes files by the min/max
stats recorded per partition before ``spark.read.parquet(paths)``.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _stat_norm(v):
    """Normalize a partition-stat bound to a JSON-stable comparable:
    datetimes -> epoch microseconds (int), numpy scalars -> python
    scalars.  Applied on BOTH the write side and scan(min_stats=...)
    bounds, so pruning compares typed values, never reprs."""
    if v is None:
        return None
    import datetime as _dt

    import numpy as _np

    if isinstance(v, (pd.Timestamp, _np.datetime64, _dt.datetime)):
        return int(pd.Timestamp(v).value // 1000)
    if hasattr(v, "item"):
        return v.item()
    return v


def _digest_frame(pdf: pd.DataFrame) -> int:
    """Order-insensitive 64-bit content digest of a pandas partition."""
    if not len(pdf):
        return 0
    safe = pdf.copy()
    for c in safe.columns:
        if safe[c].dtype == object:
            # repr, not str: binary columns must not be utf-8 decoded
            safe[c] = safe[c].map(repr)
    h = pd.util.hash_pandas_object(safe, index=False)
    return int(h.values.sum() % (2**63))


@dataclass
class SnapshotTable:
    root: str
    spark: SparkSession

    @property
    def data_dir(self) -> Path:
        return Path(self.root) / "data"

    @property
    def snap_dir(self) -> Path:
        return Path(self.root) / "snapshots"

    # ------------------------------------------------------------ read

    def current_snapshot_id(self) -> str | None:
        cur = Path(self.root) / "CURRENT"
        if not cur.exists():
            return None
        return cur.read_text().strip() or None

    def manifest(self, snapshot_id: str | None = None) -> dict | None:
        sid = snapshot_id or self.current_snapshot_id()
        if sid is None:
            return None
        p = self.snap_dir / f"{sid}.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def scan(
        self,
        snapshot_id: str | None = None,
        min_stats: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """Read a snapshot. ``min_stats`` optionally prunes partitions by
        recorded per-partition column (min, max) ranges before the scan —
        file-level pruning the way an Iceberg manifest does it."""
        man = self.manifest(snapshot_id)
        if man is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        parts = man["partitions"]
        if min_stats:
            def keep(p: dict) -> bool:
                for col, (lo, hi) in min_stats.items():
                    lo, hi = _stat_norm(lo), _stat_norm(hi)
                    st = p.get("stats", {}).get(col)
                    if st is not None and None not in st and (st[1] < lo or st[0] > hi):
                        return False
                return True
            parts = [p for p in parts if keep(p)]
        files = [str(self.data_dir / p["file"]) for p in parts if p["rows"] > 0]
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        if not files:
            return self.spark.createDataFrame([], schema=schema)
        # read under the MANIFEST schema, not footer inference: after a
        # schema-evolving append (add-column), files written before the
        # evolution lack the new column and must surface it as NULL —
        # and a scan's schema must never depend on which footer the
        # reader sampled first
        return self.spark.read.schema(schema).parquet(*files)

    def lineage(self, snapshot_id: str | None = None) -> pd.DataFrame:
        man = self.manifest(snapshot_id)
        if man is None:
            return pd.DataFrame(
                columns=["pid", "file", "rows", "digest", "bytes", "write_sec"]
            )
        return pd.DataFrame(man["partitions"])

    # ----------------------------------------------------------- write

    def write(
        self,
        df: DataFrame,
        partition_by: str | None = None,
        num_partitions: int | None = None,
        stats_cols: list[str] | None = None,
        parent: str | None = None,
        fail_after_partitions: int | None = None,
        properties: dict | None = None,
    ) -> str:
        """Commit ``df`` as a new snapshot; returns the snapshot id.

        ``properties`` are free-form table metadata recorded in the
        manifest (e.g. the featurizer-plan fingerprint — readers can
        refuse to mix incompatible feature spaces).
        ``fail_after_partitions`` deliberately crashes the driver commit
        after N task files are written — test hook for kill/resume.
        """
        sid = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        return self._write_partitions(
            df, sid, partition_by, num_partitions, stats_cols, parent,
            skip_pids=None, fail_after_partitions=fail_after_partitions,
            carry_partitions=[], properties=properties,
        )

    def append(
        self,
        df: DataFrame,
        partition_by: str | None = None,
        num_partitions: int | None = None,
        stats_cols: list[str] | None = None,
        properties: dict | None = None,
        allow_evolution: bool = False,
    ) -> str:
        """Iceberg-style APPEND snapshot: new data files are written for
        ``df`` only; the manifest carries the parent's partitions forward
        untouched (their files are never rewritten).  This is the
        incremental-ingest path: commit cost is proportional to the NEW
        data, not the table.  ``properties`` default to the parent's
        (carried forward across appends).

        Schema contract: ``df`` must carry every parent column with the
        same type (dropping or retyping a column raises — silent drift
        is how feature stores rot).  EXTRA columns are the add-column
        evolution path and require ``allow_evolution=True``: the
        manifest schema advances to the union and ``scan`` (manifest-
        schema read) surfaces the new column as NULL for pre-evolution
        files — old data files are never rewritten."""
        parent_man = self.manifest()
        if parent_man is not None:
            old = {
                f.name: f.dataType
                for f in T.StructType.fromJson(
                    json.loads(parent_man["schema"])
                ).fields
            }
            new = {f.name: f.dataType for f in df.schema.fields}
            missing = sorted(n for n in old if n not in new)
            retyped = sorted(
                n for n, t in old.items() if n in new and new[n] != t
            )
            if missing or retyped:
                raise ValueError(
                    f"append schema mismatch: missing columns {missing}, "
                    f"retyped columns {retyped} — appends must carry every "
                    "parent column with its type"
                )
            extra = sorted(n for n in new if n not in old)
            if extra and not allow_evolution:
                raise ValueError(
                    f"append adds new columns {extra}; pass "
                    "allow_evolution=True to evolve the table schema "
                    "(older files will scan with NULLs in them)"
                )
        carry = list(parent_man["partitions"]) if parent_man else []
        pid_offset = (max((p["pid"] for p in carry), default=-1)) + 1
        sid = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        if properties is None and parent_man is not None:
            properties = parent_man.get("properties")
        return self._write_partitions(
            df, sid, partition_by, num_partitions, stats_cols,
            parent=parent_man["snapshot_id"] if parent_man else None,
            skip_pids=None, fail_after_partitions=None,
            carry_partitions=carry, pid_offset=pid_offset,
            properties=properties,
        )

    def resume(
        self,
        df: DataFrame,
        snapshot_id: str,
        partition_by: str | None = None,
        num_partitions: int | None = None,
        stats_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> str:
        """Finish an interrupted ``write`` of the same ``df``: partitions
        whose data files + lineage sidecars already exist are anti-joined
        out (not recomputed); only the missing ones run.

        Requires DATA-DERIVED pids: the original write (and this call)
        must use the same ``partition_by``.  Scheduling-derived pids
        (``partition_by=None``) can map rows to different pids across
        runs, silently losing or duplicating rows — refused here."""
        mode_file = self.snap_dir / f"{snapshot_id}.partials" / "_mode.json"
        mode = json.loads(mode_file.read_text()) if mode_file.exists() else {}
        orig_key = mode.get("partition_by")
        orig_n = mode.get("num_partitions")
        if orig_key is None:
            # covers both a missing marker and an original write with
            # scheduling-derived pids — neither is replay-stable
            raise ValueError(
                "resume requires the original write to have used "
                "data-derived pids (partition_by=<key column>); this "
                "snapshot's pids came from repartition()+spark_partition_id(), "
                "which is not stable across runs"
            )
        if partition_by != orig_key:
            raise ValueError(
                f"resume must use the original write's partition key: "
                f"original partition_by={orig_key!r}, got {partition_by!r}"
            )
        if num_partitions is None:
            num_partitions = orig_n  # pid = pmod(hash, n): n must match
        elif orig_n is not None and num_partitions != orig_n:
            raise ValueError(
                f"resume must use the original write's partition count: "
                f"original num_partitions={orig_n}, got {num_partitions} "
                "(pids are pmod(hash(key), n) — a different n skips/"
                "duplicates rows)"
            )
        if properties is None:
            # recover the original write's properties (mirrors the
            # num_partitions recovery above): a resumed write must not
            # lose its plan_fingerprint protection
            properties = mode.get("properties")
        done = self._orphan_lineage(snapshot_id)
        return self._write_partitions(
            df, snapshot_id, partition_by, num_partitions, stats_cols,
            parent=None, skip_pids={p["pid"] for p in done},
            fail_after_partitions=None, carry_partitions=[],
            properties=properties,
        )

    def merge(
        self,
        updates: DataFrame,
        key: str,
        stats_cols: list[str] | None = None,
        properties: dict | None = None,
        fail_after_partitions: int | None = None,
    ) -> str:
        """Iceberg-style MERGE/upsert (copy-on-write at partition
        granularity): rows in ``updates`` REPLACE current rows with the
        same ``key``; new keys are inserted.  Returns the new snapshot id.

        Scale shape: partitions whose recorded per-partition (min, max)
        ``key`` stats cannot contain any update key keep their data
        files untouched (carried forward in the manifest, like
        ``append``); only overlapping partitions are read, anti-joined
        against the updates, unioned with them, and rewritten as fresh
        files with fresh pids + lineage rows.  Touched-partition
        detection is a broadcast range-join of the update keys against
        the driver-sized (pid, lo, hi) stats list — never a scan of the
        table.  Commit cost is proportional to the TOUCHED data, not the
        table; a corrected feature row in a 100 TB store rewrites one
        partition.  Crash safety is the standard snapshot protocol: the
        manifest rename + CURRENT flip happen last, so a killed merge
        leaves the parent snapshot fully intact and a retried merge
        recomputes from it (verified by tests/test_snapshots.py).

        Requires the table's partitions to carry ``stats`` for ``key``
        (write with ``stats_cols=[key]``); without them every partition
        is a candidate (still correct, rewrites the whole table — the
        manifest records which it was via the ``merge_touched``
        property).  ``updates`` must be unique per key (checked)."""
        man = self.manifest()
        if man is None:
            raise FileNotFoundError(f"no snapshot at {self.root} to merge into")
        # materialize the updates ONCE: the plan is otherwise re-executed
        # by the dup check, the touched-pid range join, the anti-join and
        # the write — four runs of an arbitrary (possibly expensive or
        # nondeterministic) plan, where a key set that shifts between
        # detection and write would leave duplicate keys behind
        updates = updates.localCheckpoint(eager=True)
        dup = (
            updates.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"updates must be unique per merge key {key!r} — got "
                "duplicate keys (pre-aggregate to one row per key first)"
            )
        parts = man["partitions"]
        live = [p for p in parts if p["rows"] > 0]
        have_stats = bool(live) and all(
            p.get("stats", {}).get(key) is not None
            and None not in p["stats"][key]
            for p in live
        )
        if have_stats:
            bounds = self.spark.createDataFrame(
                pd.DataFrame(
                    {
                        "pid": [p["pid"] for p in live],
                        "lo": [p["stats"][key][0] for p in live],
                        "hi": [p["stats"][key][1] for p in live],
                    }
                )
            )
            # stats were normalized at write time (_stat_norm: datetimes
            # -> epoch MICROSECONDS); probe with the same normalization,
            # or a timestamp key would compare against a bigint and
            # touch nothing (duplicate keys after the merge)
            key_type = updates.schema[key].dataType
            if isinstance(key_type, (T.TimestampType, T.TimestampNTZType)):
                probe_key = F.unix_micros(F.col(key).cast("timestamp"))
            else:
                probe_key = F.col(key)
            touched_pids = {
                r["pid"]
                for r in updates.select(probe_key.alias("__k"))
                .distinct()
                .join(
                    F.broadcast(bounds),
                    (F.col("__k") >= F.col("lo")) & (F.col("__k") <= F.col("hi")),
                )
                .select("pid")
                .distinct()
                .collect()
            }
        else:
            touched_pids = {p["pid"] for p in live}
        touched = [p for p in live if p["pid"] in touched_pids]
        carry = [p for p in parts if p["pid"] not in touched_pids]
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        if touched:
            # read under the MANIFEST schema, never footer inference:
            # after a schema-evolving append, touched files written
            # before the evolution lack the new column — footer sampling
            # would either narrow the committed schema or fail unionByName
            old = self.spark.read.schema(schema).parquet(
                *[str(self.data_dir / p["file"]) for p in touched]
            )
        else:
            old = self.spark.createDataFrame([], schema=schema)
        merged = old.join(updates, key, "left_anti").unionByName(
            updates.select(*[f.name for f in schema.fields])
        )
        if properties is None:
            properties = dict(man.get("properties") or {})
        properties = {
            **properties,
            "merge_key": key,
            "merge_touched": len(touched),
            "merge_carried": len(carry),
        }
        pid_offset = (max((p["pid"] for p in parts), default=-1)) + 1
        sid = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        n = max(len(touched), 1)
        return self._write_partitions(
            merged, sid, key, n, stats_cols or [key],
            parent=man["snapshot_id"], skip_pids=None,
            fail_after_partitions=fail_after_partitions,
            carry_partitions=carry, pid_offset=pid_offset,
            properties=properties,
        )

    def delete(
        self,
        keys: DataFrame,
        key: str,
        stats_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> str:
        """Keyed DELETE (the right-to-erasure / tombstone path):
        rows whose ``key`` appears in ``keys`` are removed, producing a
        new snapshot.  Same copy-on-write shape as ``merge``: partitions
        whose (min, max) ``key`` stats cannot contain any delete key are
        carried forward untouched; only overlapping partitions are read,
        anti-joined, and rewritten.  The parent snapshot still holds the
        deleted rows (time travel keeps working) — physical erasure of
        history is snapshot expiry, a separate retention decision.

        Cost ∝ touched data; crash safety is the snapshot protocol
        (manifest + CURRENT flip last).  Deleting keys that don't exist
        is a no-op for those keys (the anti-join ignores them)."""
        man = self.manifest()
        if man is None:
            raise FileNotFoundError(f"no snapshot at {self.root} to delete from")
        keys = keys.select(key).distinct().localCheckpoint(eager=True)
        parts = man["partitions"]
        live = [p for p in parts if p["rows"] > 0]
        have_stats = bool(live) and all(
            p.get("stats", {}).get(key) is not None
            and None not in p["stats"][key]
            for p in live
        )
        if have_stats:
            bounds = self.spark.createDataFrame(
                pd.DataFrame(
                    {
                        "pid": [p["pid"] for p in live],
                        "lo": [p["stats"][key][0] for p in live],
                        "hi": [p["stats"][key][1] for p in live],
                    }
                )
            )
            key_type = keys.schema[key].dataType
            if isinstance(key_type, (T.TimestampType, T.TimestampNTZType)):
                probe_key = F.unix_micros(F.col(key).cast("timestamp"))
            else:
                probe_key = F.col(key)
            touched_pids = {
                r["pid"]
                for r in keys.select(probe_key.alias("__k"))
                .join(
                    F.broadcast(bounds),
                    (F.col("__k") >= F.col("lo")) & (F.col("__k") <= F.col("hi")),
                )
                .select("pid")
                .distinct()
                .collect()
            }
        else:
            touched_pids = {p["pid"] for p in live}
        touched = [p for p in live if p["pid"] in touched_pids]
        carry = [p for p in parts if p["pid"] not in touched_pids]
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        if touched:
            # manifest-schema read (see merge): pre-evolution files must
            # surface evolved columns as NULL, not drop them
            old = self.spark.read.schema(schema).parquet(
                *[str(self.data_dir / p["file"]) for p in touched]
            )
        else:
            old = self.spark.createDataFrame([], schema=schema)
        remaining = old.join(keys, key, "left_anti")
        if properties is None:
            properties = dict(man.get("properties") or {})
        properties = {
            **properties,
            "delete_key": key,
            "delete_touched": len(touched),
            "delete_carried": len(carry),
        }
        pid_offset = (max((p["pid"] for p in parts), default=-1)) + 1
        sid = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        n = max(len(touched), 1)
        return self._write_partitions(
            remaining, sid, key, n, stats_cols or [key],
            parent=man["snapshot_id"], skip_pids=None,
            fail_after_partitions=None,
            carry_partitions=carry, pid_offset=pid_offset,
            properties=properties,
        )

    def compact(
        self,
        target_rows: int,
        stats_cols: list[str] | None = None,
        properties: dict | None = None,
    ) -> str | None:
        """Small-file compaction (Iceberg ``rewrite_data_files`` bin-pack):
        partitions below ``target_rows`` are read back and rewritten as
        ~target_rows files; partitions already at/above target are
        carried forward in the manifest untouched (their files are never
        re-read or rewritten).  Zero-row partitions are dropped.  Returns
        the new snapshot id, or None when fewer than two small files
        exist (nothing to pack).

        This is the maintenance pass an incremental 100 TB store needs:
        streaming/append commits accrete driver-cheap but scan-expensive
        small files (each costs a task + open + footer read), and
        compaction restores scan efficiency at a cost proportional to
        the SMALL data only.  Data is bit-identical across the rewrite
        (same rows, new file layout) — pinned by tests; crash safety is
        the standard snapshot protocol (manifest rename + CURRENT flip
        last), so a killed compaction leaves the parent intact and
        re-running it is idempotent in effect.

        ``stats_cols`` defaults to the columns the parent's partitions
        already carry stats for, so merge()'s pruning keeps working on
        the compacted snapshot."""
        if target_rows < 1:
            raise ValueError(f"target_rows must be >= 1, got {target_rows}")
        man = self.manifest()
        if man is None:
            raise FileNotFoundError(f"no snapshot at {self.root} to compact")
        parts = man["partitions"]
        small = [p for p in parts if 0 < p["rows"] < target_rows]
        if len(small) < 2:
            return None
        carry = [p for p in parts if p["rows"] >= target_rows]
        if stats_cols is None:
            stats_cols = sorted(
                {c for p in parts for c in (p.get("stats") or {})}
            )
        # manifest-schema read: small files written before a schema
        # evolution lack the evolved column; footer inference here would
        # silently drop it from the compacted files AND from the manifest
        # this commit stamps (df.schema flows into _write_partitions)
        schema = T.StructType.fromJson(json.loads(man["schema"]))
        df = self.spark.read.schema(schema).parquet(
            *[str(self.data_dir / p["file"]) for p in small]
        )
        small_rows = sum(p["rows"] for p in small)
        n_out = max(1, -(-small_rows // target_rows))  # ceil
        if properties is None:
            properties = dict(man.get("properties") or {})
        properties = {
            **properties,
            "compact_in_files": len(small),
            "compact_out_files": n_out,
            "compact_rows": small_rows,
        }
        pid_offset = (max((p["pid"] for p in parts), default=-1)) + 1
        sid = time.strftime("%Y%m%d%H%M%S") + "-" + uuid.uuid4().hex[:8]
        return self._write_partitions(
            df, sid, None, n_out, stats_cols,
            parent=man["snapshot_id"], skip_pids=None,
            fail_after_partitions=None, carry_partitions=carry,
            pid_offset=pid_offset, properties=properties,
        )

    def expire_snapshots(
        self,
        keep_last: int = 1,
        dry_run: bool = False,
        force: bool = False,
    ) -> dict:
        """Retention maintenance (Iceberg ``expire_snapshots``): drop all
        but the ``keep_last`` most recent snapshots on the CURRENT
        lineage chain and delete every data file no retained snapshot
        references.  This is the PHYSICAL-erasure step that ``delete``
        deliberately defers (a keyed DELETE keeps the parent snapshot's
        files so time travel works; right-to-erasure completes only
        when the snapshots still holding the rows expire).

        Also removes ORPHAN data files: files referenced by NO manifest
        at all (left behind by writes that crashed before their
        manifest committed) and stale ``.partials`` sidecar dirs of
        non-current, non-resumable snapshots.

        Driver-only metadata work — no Spark job: the manifest set is
        driver-sized by design, and deletion is file unlinks.  Safe
        ordering: manifests of expired snapshots are deleted BEFORE
        their now-unreferenced data files, so a crash mid-expiry never
        leaves a manifest pointing at missing files; CURRENT is never
        touched.  Returns a report dict; ``dry_run=True`` reports
        without deleting.

        Resumable in-flight writes are PROTECTED by default: a
        ``.partials`` dir carrying ``_mode.json`` marks an uncommitted
        write awaiting ``resume()``, so that sidecar AND its already
        written ``part-<sid>-*.parquet`` data files are excluded from
        the orphan set unless ``force=True`` (which declares the write
        abandoned and reclaims both).  Expiry assumes a single
        maintenance writer: run it from the same coordinator that owns
        writes, not concurrently with one."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        cur = self.current_snapshot_id()
        if cur is None:
            raise FileNotFoundError(f"no snapshot at {self.root}")
        # walk the current lineage chain, newest first
        chain = []
        sid = cur
        while sid is not None:
            man = self.manifest(sid)
            if man is None:
                break
            chain.append(sid)
            sid = man.get("parent")
        retained = set(chain[:keep_last])
        # every manifest on disk (incl. dead side-branches) not retained
        all_manifests = {p.stem: p for p in self.snap_dir.glob("*.json")}
        expired = sorted(set(all_manifests) - retained)
        keep_files = set()
        for sid in retained:
            man = self.manifest(sid)
            keep_files |= {p["file"] for p in man["partitions"]}
        # a retained snapshot must never lose files referenced through
        # an expired ancestor: carried partitions repeat the SAME file
        # name in the child manifest, so keep_files already covers them
        # a .partials dir with _mode.json but NO manifest on disk is an
        # UNCOMMITTED RESUMABLE write: unless force'd, keep its sidecar
        # and its part-<sid>-*.parquet files, or routine retention would
        # destroy a crashed write awaiting resume() / unlink files a
        # concurrent write has already produced (whose later-committed
        # manifest would then point at nothing).  Committed snapshots
        # keep their .partials dirs as lineage sidecars — those are
        # ordinary retention targets once their snapshot expires.
        resumable_sids = set()
        stale_partials = []
        for d in self.snap_dir.glob("*.partials"):
            sid_p = d.name.removesuffix(".partials")
            if sid_p in retained:
                continue
            uncommitted = sid_p not in all_manifests
            if uncommitted and (d / "_mode.json").exists() and not force:
                resumable_sids.add(sid_p)
            else:
                stale_partials.append(d.name)
        stale_partials.sort()
        on_disk = {p.name for p in self.data_dir.glob("part-*.parquet")}
        doomed_files = sorted(
            f
            for f in on_disk - keep_files
            if not any(f.startswith(f"part-{sid_p}-") for sid_p in resumable_sids)
        )
        report = {
            "retained": sorted(retained),
            "expired_manifests": expired,
            "deleted_files": doomed_files,
            "deleted_partials": stale_partials,
            "protected_resumable": sorted(resumable_sids),
            "dry_run": dry_run,
        }
        if dry_run:
            return report
        # retire each expired snapshot's resume marker BEFORE its
        # manifest: a crash between the manifest unlink and the partials
        # rmtree would otherwise leave a _mode.json-bearing .partials dir
        # with no manifest — exactly the uncommitted-resumable signature,
        # so every later expire would protect it forever and resume()
        # could re-commit the long-expired snapshot as CURRENT
        for sid in expired:
            ((self.snap_dir / f"{sid}.partials") / "_mode.json").unlink(
                missing_ok=True
            )
        for sid in expired:  # then manifests (crash-safe ordering)
            all_manifests[sid].unlink(missing_ok=True)
        import shutil

        for name in stale_partials:
            shutil.rmtree(self.snap_dir / name, ignore_errors=True)
        for fname in doomed_files:
            (self.data_dir / fname).unlink(missing_ok=True)
        return report

    def _orphan_lineage(self, sid: str) -> list[dict]:
        """Lineage sidecars written by tasks of an uncommitted snapshot."""
        side = self.snap_dir / f"{sid}.partials"
        if not side.exists():
            return []
        rows = []
        for f in sorted(side.glob("*.json")):
            if f.name.startswith("_"):  # metadata markers (e.g. _mode.json)
                continue
            rec = json.loads(f.read_text())
            if (self.data_dir / rec["file"]).exists():
                rows.append(rec)
        return rows

    def _write_partitions(
        self, df, sid, partition_by, num_partitions, stats_cols, parent,
        skip_pids, fail_after_partitions, carry_partitions, pid_offset: int = 0,
        properties: dict | None = None,
    ) -> str:
        self.data_dir.mkdir(parents=True, exist_ok=True)
        self.snap_dir.mkdir(parents=True, exist_ok=True)
        partials = self.snap_dir / f"{sid}.partials"
        partials.mkdir(exist_ok=True)
        n = num_partitions or self.spark.sparkContext.defaultParallelism
        # record the pid-derivation mode so resume() can verify both the
        # key AND the modulus (pids are pmod(hash(key), n): resuming with
        # a different n would skip/duplicate rows silently)
        mode_file = partials / "_mode.json"
        if not mode_file.exists():
            # properties are recorded too, so resume() can recover the
            # original write's metadata (e.g. plan_fingerprint) instead
            # of committing a manifest that silently dropped it
            mode_file.write_text(
                json.dumps(
                    {
                        "partition_by": partition_by,
                        "num_partitions": n,
                        "properties": properties,
                    },
                    default=str,
                )
            )
        if partition_by:
            # partition id derives from the DATA (hash of the key), not
            # from scheduling: AQE may coalesce/split physical partitions
            # between runs, but pid->rows stays stable, which is what the
            # resume anti-join requires.
            work = df.withColumn(
                "__pid",
                (
                    F.pmod(F.xxhash64(F.col(partition_by)), F.lit(n)) + pid_offset
                ).cast("int"),
            )
        else:
            work = df.repartition(n).withColumn(
                "__pid", F.spark_partition_id() + F.lit(pid_offset)
            )
        if skip_pids:
            work = work.filter(~F.col("__pid").isin(*[int(p) for p in skip_pids]))

        data_dir = str(self.data_dir)
        partials_dir = str(partials)
        stats_cols = stats_cols or []
        schema_json = df.schema.json()

        def write_pdf(out: pd.DataFrame, pid: int):
            import pyarrow as pa
            import pyarrow.parquet as pq

            t0 = time.time()
            fname = f"part-{sid}-{pid:05d}.parquet"
            fpath = os.path.join(data_dir, fname)
            tbl = pa.Table.from_pandas(out, preserve_index=False)
            # The pandas round-trip loses Spark types in two ways that
            # later crash Spark's vectorized reader on mixed files
            # (PARQUET_COLUMN_DATA_TYPE_MISMATCH): an all-NULL object
            # column is inferred as Arrow `null` (INT32 physical), and a
            # NULLABLE int/long column with any NULL becomes float64
            # (DOUBLE physical).  Pin every column whose inferred Arrow
            # type disagrees with the table's declared Spark schema;
            # NaN→null and lossless value casts via from_pandas
            # semantics, so a genuinely lossy mismatch still raises.
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            want = to_arrow_schema(_ST.fromJson(json.loads(schema_json)))
            for i, f in enumerate(tbl.schema):
                if f.name not in want.names:
                    continue
                tgt = want.field(f.name).type
                if f.type.equals(tgt):
                    continue
                if pa.types.is_timestamp(f.type) and pa.types.is_timestamp(tgt):
                    continue  # coerce_timestamps handles ns→us at write
                if pa.types.is_null(f.type):
                    arr = tbl.column(i).cast(tgt)
                else:
                    arr = pa.chunked_array(
                        [
                            pa.array(c.to_pandas(), type=tgt, from_pandas=True)
                            for c in tbl.column(i).chunks
                        ]
                        or [pa.array([], type=tgt)]
                    )
                tbl = tbl.set_column(i, pa.field(f.name, tgt), arr)
            # Spark's parquet reader rejects TIMESTAMP(NANOS); pandas
            # datetime64[ns] must land as microseconds.
            pq.write_table(
                tbl, fpath, coerce_timestamps="us", allow_truncated_timestamps=True
            )
            rec = {
                "pid": pid,
                "file": fname,
                "rows": int(len(out)),
                "digest": _digest_frame(out),
                "bytes": int(os.path.getsize(fpath)),
                "write_sec": round(time.time() - t0, 4),
                "stats": {
                    c: [
                        None if out[c].isna().all() else _stat_norm(out[c].min()),
                        None if out[c].isna().all() else _stat_norm(out[c].max()),
                    ]
                    for c in stats_cols
                },
            }
            side = os.path.join(partials_dir, f"{pid:05d}.json")
            with open(side + ".tmp", "w") as fh:
                json.dump(rec, fh, default=str)
            os.rename(side + ".tmp", side)
            return pd.DataFrame({"pid": [pid]})

        if partition_by:
            # one group per data-derived pid -> one file, AQE-proof
            def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
                if not len(pdf):
                    return pd.DataFrame({"pid": []})
                pid = int(pdf["__pid"].iloc[0])
                return write_pdf(pdf.drop(columns="__pid"), pid)

            done = work.groupBy("__pid").applyInPandas(write_group, "pid int")
        else:
            def write_stream(batches):
                chunks, pid = [], None
                for pdf in batches:
                    if len(pdf):
                        pid = int(pdf["__pid"].iloc[0])
                    chunks.append(pdf.drop(columns="__pid"))
                if pid is None:
                    return
                yield write_pdf(pd.concat(chunks, ignore_index=True), pid)

            done = work.mapInPandas(write_stream, "pid int")
        done_pids = [r["pid"] for r in done.collect()]
        if fail_after_partitions is not None and len(done_pids) >= fail_after_partitions:
            raise RuntimeError(
                f"simulated crash after {len(done_pids)} partitions (snapshot {sid})"
            )

        lineage = list(carry_partitions) + self._orphan_lineage(sid)
        man = {
            "snapshot_id": sid,
            "parent": parent if parent is not None else self.current_snapshot_id(),
            "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "schema": schema_json,
            "properties": properties or {},
            "partitions": sorted(lineage, key=lambda r: r["pid"]),
        }
        tmp = self.snap_dir / f"{sid}.json.tmp"
        tmp.write_text(json.dumps(man, indent=1, default=str))
        os.rename(tmp, self.snap_dir / f"{sid}.json")
        cur_tmp = Path(self.root) / "CURRENT.tmp"
        cur_tmp.write_text(sid)
        os.rename(cur_tmp, Path(self.root) / "CURRENT")
        return sid


def snapshot_diff(
    table: SnapshotTable,
    key: str,
    old_sid: str | None = None,
    new_sid: str | None = None,
) -> DataFrame:
    """Changelog read (CDC) between two snapshots of a copy-on-write
    table: (change ∈ insert|delete|update_pre|update_post, key, row
    columns) — what downstream consumers replay to stay in sync without
    rescanning the table.

    Scale shape: partitions carried UNCHANGED between the manifests
    (same data file) are skipped outright — copy-on-write guarantees
    their rows are identical — so the diff reads only files that were
    added or removed between the snapshots; cost ∝ churn, not table
    size.  Inside the churned files, a full-outer join on ``key``
    classifies rows; updates emit a _pre/_post row pair (the standard
    changelog convention).  Rows must be unique per key within each
    churned side (copy-on-write maintains this for merge/delete
    lineages; enforced here with a cheap duplicate probe).

    ``old_sid`` defaults to the current snapshot's parent; ``new_sid``
    to the current snapshot."""
    new_man = table.manifest(new_sid)
    if new_man is None:
        raise FileNotFoundError(f"no snapshot at {table.root}")
    if old_sid is None:
        old_sid = new_man.get("parent")
        if old_sid is None:
            raise ValueError("snapshot has no parent; pass old_sid explicitly")
    old_man = table.manifest(old_sid)
    if old_man is None:
        raise FileNotFoundError(f"no snapshot {old_sid!r} at {table.root}")

    old_files = {p["file"] for p in old_man["partitions"] if p["rows"] > 0}
    new_files = {p["file"] for p in new_man["partitions"] if p["rows"] > 0}
    spark = table.spark
    schema = T.StructType.fromJson(json.loads(new_man["schema"]))

    def read(files: set[str]) -> DataFrame:
        if not files:
            return spark.createDataFrame([], schema=schema)
        return spark.read.schema(schema).parquet(
            *[str(table.data_dir / f) for f in sorted(files)]
        )

    removed = read(old_files - new_files)   # rows as of old, churned
    added = read(new_files - old_files)     # rows as of new, churned
    for side, name in ((removed, "old"), (added, "new")):
        dup = side.groupBy(key).count().filter(F.col("count") > 1).limit(1)
        if dup.count():
            raise ValueError(
                f"snapshot_diff requires unique keys per churned side; "
                f"duplicate {key!r} in the {name} snapshot's churned files"
            )
    cols = [f.name for f in schema.fields]
    o = removed.select(F.col(key).alias("__k"), F.struct(*cols).alias("__o"))
    n = added.select(F.col(key).alias("__k"), F.struct(*cols).alias("__n"))
    j = o.join(n, "__k", "full_outer")
    ins = j.filter(F.col("__o").isNull()).select(
        F.lit("insert").alias("change"), F.col("__n.*")
    )
    dele = j.filter(F.col("__n").isNull()).select(
        F.lit("delete").alias("change"), F.col("__o.*")
    )
    upd = j.filter(
        F.col("__o").isNotNull()
        & F.col("__n").isNotNull()
        & (F.col("__o") != F.col("__n"))
    )
    pre = upd.select(F.lit("update_pre").alias("change"), F.col("__o.*"))
    post = upd.select(F.lit("update_post").alias("change"), F.col("__n.*"))
    return ins.unionByName(dele).unionByName(pre).unionByName(post)
