"""Persisted IVF index: probe-over-snapshot == query-time ivf_topk
exactly, and the manifest's cell stats actually prune files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_probe_matches_ivf_topk_exactly(spark, embs, tmp_path):
    from pic2vec_spark.ops.ivf_store import build_ivf_index, probe_ivf_index
    from pic2vec_spark.ops.knn import ivf_topk, kmeans_centroids, sample_vectors

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    queries = embs.filter(F.col("vec_id") < 8)

    root = str(tmp_path / "ivf")
    build_ivf_index(embs, centroids, root, spark)

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
    assert (direct["cos"] - stored["cos"]).abs().max() == 0.0


def test_index_files_are_pruned_by_cell_stats(spark, embs, tmp_path):
    """A single-cell probe must open strictly fewer data files than the
    table has (the point of writing the cells into the layout), and the
    pruned scan still returns every member of that cell."""
    from pic2vec_spark.ops.ivf_store import assign_cells, build_ivf_index
    from pic2vec_spark.ops.knn import kmeans_centroids, sample_vectors
    from pic2vec_spark.snapshots import SnapshotTable

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    root = str(tmp_path / "ivf")
    build_ivf_index(embs, centroids, root, spark)
    t = SnapshotTable(root, spark)
    man = t.manifest()
    live = [p for p in man["partitions"] if p["rows"] > 0]
    assert all(p["stats"]["cell"][0] is not None for p in live)

    cell = int(live[0]["stats"]["cell"][0])
    kept = [
        p for p in live
        if p["stats"]["cell"][0] <= cell <= p["stats"]["cell"][1]
    ]
    assert len(kept) < len(live), "cell probe should prune files"

    pruned = t.scan(min_stats={"cell": (cell, cell)}).filter(
        F.col("cell") == cell
    )
    full_members = (
        assign_cells(embs, centroids).filter(F.col("cell") == cell).count()
    )
    assert pruned.count() == full_members > 0


def test_probe_is_deterministic_across_partitionings(spark, embs, tmp_path):
    from pic2vec_spark.ops.ivf_store import build_ivf_index, probe_ivf_index
    from pic2vec_spark.ops.knn import kmeans_centroids, sample_vectors

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    queries = embs.filter(F.col("vec_id") < 4)
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_ivf_index(embs, centroids, r1, spark)
    build_ivf_index(embs.repartition(7), centroids, r2, spark)
    a = (
        probe_ivf_index(r1, spark, queries, centroids)
        .toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    )
    b = (
        probe_ivf_index(r2, spark, queries, centroids)
        .toPandas().sort_values(["query_id", "rk"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_probe_rejects_mismatched_centroids(spark, embs, tmp_path):
    """The quantizer is part of the index: probing with different
    centroids would scan the wrong cells and return silently wrong
    neighbors, so the manifest's centroid digest must refuse."""
    from pic2vec_spark.ops.ivf_store import build_ivf_index, probe_ivf_index
    from pic2vec_spark.ops.knn import kmeans_centroids, sample_vectors

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    root = str(tmp_path / "ivf")
    build_ivf_index(embs, centroids, root, spark)

    other = centroids.copy()
    other[0, 0] += 1.0
    queries = embs.filter(F.col("vec_id") < 4)
    with pytest.raises(ValueError, match="centroid_digest"):
        probe_ivf_index(root, spark, queries, other)


def test_probe_empty_queries_returns_typed_empty(spark, embs, tmp_path):
    """Drop-in equivalence with ivf_topk: an empty query set yields the
    correctly-typed empty frame, not an IndexError, and opens no files."""
    from pic2vec_spark.ops.ivf_store import build_ivf_index, probe_ivf_index
    from pic2vec_spark.ops.knn import kmeans_centroids, sample_vectors

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    root = str(tmp_path / "ivf")
    build_ivf_index(embs, centroids, root, spark)

    out = probe_ivf_index(
        root, spark, embs.filter(F.col("vec_id") < 0), centroids
    )
    assert out.columns == ["query_id", "neighbor_id", "cos", "rk"]
    assert out.count() == 0
    assert out.schema["query_id"].dataType == embs.schema["vec_id"].dataType


def test_append_then_probe_equals_full_rebuild(spark, embs, tmp_path):
    """Incremental maintenance: build on half the corpus, append the
    other half -> probe results equal ivf_topk over the FULL corpus,
    old files untouched, digest-mismatched appends refused."""
    from pic2vec_spark.ops.ivf_store import (
        append_to_ivf_index,
        build_ivf_index,
        probe_ivf_index,
    )
    from pic2vec_spark.ops.knn import ivf_topk, kmeans_centroids, sample_vectors
    from pic2vec_spark.snapshots import SnapshotTable

    centroids = kmeans_centroids(sample_vectors(embs, 128), 8, iters=5)
    queries = embs.filter(F.col("vec_id") < 8)
    half_a = embs.filter(F.col("vec_id") % 2 == 0)
    half_b = embs.filter(F.col("vec_id") % 2 == 1)

    root = str(tmp_path / "ivf_inc")
    build_ivf_index(half_a, centroids, root, spark)
    man_before = SnapshotTable(root, spark).manifest()
    files_before = {p["file"] for p in man_before["partitions"]}
    append_to_ivf_index(half_b, centroids, root, spark)
    man_after = SnapshotTable(root, spark).manifest()
    # old data files are carried forward byte-identical (paths reused)
    paths_after = {p["file"] for p in man_after["partitions"]}
    assert files_before <= paths_after
    # properties (quantizer digest) carried across the append
    assert (man_after.get("properties") or {}).get("centroid_digest") == (
        man_before.get("properties") or {}
    ).get("centroid_digest")

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
    assert (direct["cos"] - stored["cos"]).abs().max() == 0.0

    # a caller-supplied properties dict must not wipe the index-identity
    # keys (append replaces the manifest properties wholesale otherwise)
    from pic2vec_spark.ops.ivf_store import append_to_ivf_index as _app

    more = embs.limit(3).withColumn("vec_id", F.col("vec_id") + 500000)
    _app(more, centroids, root, spark, properties={"owner": "etl"})
    props2 = SnapshotTable(root, spark).manifest()["properties"]
    assert props2.get("owner") == "etl"
    assert props2.get("centroid_digest") == (
        man_before.get("properties") or {}
    ).get("centroid_digest")
    assert props2.get("index") == "ivf"

    # a drifted quantizer is refused (silent wrong-cell appends banned)
    with pytest.raises(ValueError, match="centroid_digest"):
        append_to_ivf_index(half_b, centroids + 0.5, root, spark)
    with pytest.raises(FileNotFoundError):
        append_to_ivf_index(half_b, centroids, str(tmp_path / "nope"), spark)
