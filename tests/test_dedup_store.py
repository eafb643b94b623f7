"""Persisted LSH dedup index: build+append == one-shot rebuild, the
ingest-time probe equals the full pair set restricted to the batch,
and the family digest refuses incompatible appends/probes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df) -> set[tuple]:
    return {
        (r["id1"], r["id2"])
        for r in df.select("id1", "id2").collect()
    }


def test_index_pairs_equal_one_shot_lsh(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import lsh_candidate_pairs
    from pic2vec_spark.ops.dedup_store import (
        build_lsh_dedup_index,
        neardup_pairs_from_index,
    )

    root = str(tmp_path / "lsh")
    build_lsh_dedup_index(docs, root, spark)
    expect = _pairs(lsh_candidate_pairs(docs, "doc_id", "text"))
    got = _pairs(neardup_pairs_from_index(root, spark))
    assert got == expect and expect  # non-trivial corpus: some dups


def test_append_equals_rebuild(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import lsh_candidate_pairs
    from pic2vec_spark.ops.dedup_store import (
        append_to_lsh_dedup_index,
        build_lsh_dedup_index,
        neardup_pairs_from_index,
    )
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "lsh_app")
    build_lsh_dedup_index(docs.filter(F.col("doc_id") % 2 == 0), root, spark)
    base_files = {
        p["file"] for p in SnapshotTable(root, spark).manifest()["partitions"]
    }
    append_to_lsh_dedup_index(
        docs.filter(F.col("doc_id") % 2 == 1), root, spark
    )
    man = SnapshotTable(root, spark).manifest()
    # append carried every original file forward untouched — ingest
    # cost is the new files only
    assert base_files <= {p["file"] for p in man["partitions"]}
    assert (man.get("properties") or {}).get("index") == "lsh_dedup"

    expect = _pairs(lsh_candidate_pairs(docs, "doc_id", "text"))
    assert _pairs(neardup_pairs_from_index(root, spark)) == expect


def test_probe_equals_full_pairs_touching_batch(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import lsh_candidate_pairs
    from pic2vec_spark.ops.dedup_store import (
        build_lsh_dedup_index,
        probe_lsh_dedup_index,
    )

    root = str(tmp_path / "lsh_probe")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    build_lsh_dedup_index(old, root, spark)

    full = _pairs(lsh_candidate_pairs(docs, "doc_id", "text"))
    touching = {
        (a, b) for a, b in full if a % 2 == 1 or b % 2 == 1
    }
    got = _pairs(probe_lsh_dedup_index(root, spark, new))
    assert got == touching and touching < full  # old-old pairs excluded


def test_probe_empty_batch_returns_empty(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import (
        build_lsh_dedup_index,
        probe_lsh_dedup_index,
    )

    root = str(tmp_path / "lsh_empty")
    build_lsh_dedup_index(docs, root, spark)
    out = probe_lsh_dedup_index(root, spark, docs.filter(F.lit(False)))
    assert out.count() == 0 and set(out.columns) == {"id1", "id2"}


def test_family_digest_guards_append_and_probe(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import (
        append_to_lsh_dedup_index,
        build_lsh_dedup_index,
        probe_lsh_dedup_index,
    )
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "lsh_guard")
    build_lsh_dedup_index(docs, root, spark)

    # simulate an index built by a build whose permutation constants
    # differ (e.g. a changed seed): the recorded digest no longer
    # matches what this build derives from the manifest's family params
    table = SnapshotTable(root, spark)
    man = table.manifest()
    man["properties"]["family_digest"] = "0" * 32
    sid = man["snapshot_id"]
    (table.snap_dir / f"{sid}.json").write_text(__import__("json").dumps(man))

    with pytest.raises(ValueError, match="family_digest"):
        append_to_lsh_dedup_index(docs.limit(1), root, spark)
    with pytest.raises(ValueError, match="family_digest"):
        probe_lsh_dedup_index(root, spark, docs.limit(1))


def test_not_an_index_refused(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import neardup_pairs_from_index
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "plain")
    SnapshotTable(root, spark).write(docs.limit(3))
    with pytest.raises(ValueError, match="not an LSH dedup index"):
        neardup_pairs_from_index(root, spark)
