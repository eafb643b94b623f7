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
    with pytest.raises(ValueError, match="not a lsh_dedup index"):
        neardup_pairs_from_index(root, spark)


# --------------------------------------------------- exact digest index


def _groups(df) -> set[tuple]:
    return {
        (r["fp_md5"], r["keep_id"], r["n_dups"])
        for r in df.select("fp_md5", "keep_id", "n_dups").collect()
    }


def _with_reingest(docs):
    """odd half (new) ∪ doc_id%10==0 re-keyed +1e6 (exact re-ingest)."""
    return docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )


def test_digest_groups_equal_exact_dedup(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import exact_dedup
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        duplicate_groups_from_index,
    )

    root = str(tmp_path / "dig")
    build_digest_dedup_index(docs, root, spark)
    assert _groups(duplicate_groups_from_index(root, spark)) == _groups(
        exact_dedup(docs, "doc_id", "text")
    )


def test_digest_append_equals_rebuild(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import exact_dedup
    from pic2vec_spark.ops.dedup_store import (
        append_to_digest_dedup_index,
        build_digest_dedup_index,
        duplicate_groups_from_index,
    )
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "dig_app")
    build_digest_dedup_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, spark
    )
    base_files = {
        p["file"] for p in SnapshotTable(root, spark).manifest()["partitions"]
    }
    append_to_digest_dedup_index(_with_reingest(docs), root, spark)
    man = SnapshotTable(root, spark).manifest()
    assert base_files <= {p["file"] for p in man["partitions"]}
    assert (man.get("properties") or {}).get("index") == "digest_dedup"

    union = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1_000_000)
        )
    )
    got = _groups(duplicate_groups_from_index(root, spark))
    assert got == _groups(exact_dedup(union, "doc_id", "text"))
    # the re-ingested slice really forms dup groups of 2
    assert {g for g in got if g[2] == 2}


def test_digest_probe_finds_reingested_docs(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        probe_digest_dedup_index,
    )

    root = str(tmp_path / "dig_probe")
    build_digest_dedup_index(
        docs.filter(F.col("doc_id") % 2 == 0), root, spark
    )
    got = {
        (r["doc_id"], r["keep_id"])
        for r in probe_digest_dedup_index(
            root, spark, _with_reingest(docs)
        ).collect()
    }
    expect = {
        (r["doc_id"] + 1_000_000, r["doc_id"])
        for r in docs.filter(F.col("doc_id") % 10 == 0).collect()
    }
    assert got == expect and expect  # odd docs are new: no false hits


def test_digest_probe_empty_batch(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        probe_digest_dedup_index,
    )

    root = str(tmp_path / "dig_empty")
    build_digest_dedup_index(docs, root, spark)
    out = probe_digest_dedup_index(root, spark, docs.filter(F.lit(False)))
    assert out.count() == 0 and set(out.columns) == {"doc_id", "keep_id"}


def test_ingest_gate_classifies_and_appends_survivors(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup import lsh_candidate_pairs
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        build_lsh_dedup_index,
        duplicate_groups_from_index,
        ingest_gate,
        probe_digest_dedup_index,
    )

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    droot = str(tmp_path / "gate_dig")
    lroot = str(tmp_path / "gate_lsh")
    build_digest_dedup_index(corpus, droot, spark)
    build_lsh_dedup_index(corpus, lroot, spark)

    batch = _with_reingest(docs)
    got = {
        r["doc_id"]: (r["disposition"], r["keep_id"])
        for r in ingest_gate(batch, droot, lroot, spark).collect()
    }
    assert set(got) == {r["doc_id"] for r in batch.collect()}

    # exact hits are exactly the re-keyed slice, keep_id = the original
    rekeyed = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 0).collect()}
    assert {
        d: k for d, (disp, k) in got.items() if disp == "exact_dup"
    } == {orig + 1_000_000: orig for orig in rekeyed}

    # near hits = odd docs with an even LSH candidate partner (min)
    full = lsh_candidate_pairs(docs, "doc_id", "text").collect()
    near_expect: dict[int, int] = {}
    for r in full:
        a, b = r["id1"], r["id2"]
        if a % 2 != b % 2:
            odd, even = (a, b) if a % 2 == 1 else (b, a)
            near_expect[odd] = min(near_expect.get(odd, even), even)
    assert {
        d: k for d, (disp, k) in got.items() if disp == "near_dup"
    } == near_expect and near_expect

    # survivors (and ONLY survivors) were appended to both indexes
    new_ids = {d for d, (disp, _) in got.items() if disp == "new"}
    n_corpus = corpus.count()
    assert duplicate_groups_from_index(droot, spark).count() == (
        n_corpus + len(new_ids)  # all texts distinct → one group each
    )
    # a re-probe of the survivors now exact-hits themselves
    survivors = batch.join(
        spark.createDataFrame([(i,) for i in new_ids], "doc_id bigint"),
        "doc_id", "semi",
    ).withColumn("doc_id", F.col("doc_id") + F.lit(5_000_000))
    hits = {
        (r["doc_id"], r["keep_id"])
        for r in probe_digest_dedup_index(droot, spark, survivors).collect()
    }
    assert hits == {(i + 5_000_000, i) for i in new_ids}


# ---------------------------------------------- Hamming (phash) index


@pytest.fixture(scope="module")
def sims(spark, docs):
    """(doc_id, simhash) — the Hamming index is signature-agnostic;
    text simhash exercises it without the image decode cost."""
    from pic2vec_spark.ops.dedup import simhash

    return simhash(docs, "doc_id", "text").localCheckpoint(eager=True)


def _hpairs(df) -> set[tuple]:
    return {
        (r["id1"], r["id2"], r["hamming"])
        for r in df.select("id1", "id2", "hamming").collect()
    }


def test_hamming_index_pairs_equal_one_shot(spark, sims, tmp_path):
    from pic2vec_spark.ops.dedup import hamming_neardup_pairs
    from pic2vec_spark.ops.dedup_store import (
        append_to_hamming_dedup_index,
        build_hamming_dedup_index,
        neardup_pairs_from_hamming_index,
    )
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "ham")
    build_hamming_dedup_index(
        sims.filter(F.col("doc_id") % 2 == 0), root, spark,
        id_col="doc_id", sig_col="simhash", max_distance=3, bits=60,
    )
    base_files = {
        p["file"] for p in SnapshotTable(root, spark).manifest()["partitions"]
    }
    append_to_hamming_dedup_index(
        sims.filter(F.col("doc_id") % 2 == 1), root, spark,
        id_col="doc_id", sig_col="simhash",
    )
    man = SnapshotTable(root, spark).manifest()
    assert base_files <= {p["file"] for p in man["partitions"]}

    expect = _hpairs(
        hamming_neardup_pairs(sims, "doc_id", max_distance=3,
                              sig_col="simhash", bits=60)
    )
    got = _hpairs(neardup_pairs_from_hamming_index(root, spark))
    assert got == expect and expect


def test_hamming_probe_equals_pairs_touching_batch(spark, sims, tmp_path):
    from pic2vec_spark.ops.dedup import hamming_neardup_pairs
    from pic2vec_spark.ops.dedup_store import (
        build_hamming_dedup_index,
        probe_hamming_dedup_index,
    )

    root = str(tmp_path / "ham_probe")
    build_hamming_dedup_index(
        sims.filter(F.col("doc_id") % 2 == 0), root, spark,
        id_col="doc_id", sig_col="simhash", max_distance=3, bits=60,
    )
    full = _hpairs(
        hamming_neardup_pairs(sims, "doc_id", max_distance=3,
                              sig_col="simhash", bits=60)
    )
    touching = {(a, b, h) for a, b, h in full if a % 2 == 1 or b % 2 == 1}
    got = _hpairs(
        probe_hamming_dedup_index(
            root, spark, sims.filter(F.col("doc_id") % 2 == 1),
            id_col="doc_id", sig_col="simhash",
        )
    )
    assert got == touching and touching < full


def test_hamming_index_guards(spark, sims, tmp_path):
    import json

    from pic2vec_spark.ops.dedup_store import (
        append_to_hamming_dedup_index,
        build_hamming_dedup_index,
    )
    from pic2vec_spark.snapshots import SnapshotTable

    root = str(tmp_path / "ham_guard")
    build_hamming_dedup_index(
        sims, root, spark, id_col="doc_id", sig_col="simhash",
        max_distance=3, bits=60,
    )
    with pytest.raises(ValueError, match="id_col"):
        append_to_hamming_dedup_index(
            sims.withColumnRenamed("doc_id", "other"), root, spark,
            id_col="other", sig_col="simhash",
        )
    table = SnapshotTable(root, spark)
    man = table.manifest()
    man["properties"]["family_digest"] = "0" * 32
    (table.snap_dir / f"{man['snapshot_id']}.json").write_text(
        json.dumps(man)
    )
    with pytest.raises(ValueError, match="family_digest"):
        append_to_hamming_dedup_index(
            sims.limit(1), root, spark, id_col="doc_id", sig_col="simhash"
        )


def test_digest_index_guards(spark, docs, tmp_path):
    from pic2vec_spark.ops.dedup_store import (
        append_to_digest_dedup_index,
        build_digest_dedup_index,
        build_lsh_dedup_index,
        duplicate_groups_from_index,
    )

    root = str(tmp_path / "dig_guard")
    build_digest_dedup_index(docs, root, spark)
    with pytest.raises(ValueError, match="id_col"):
        append_to_digest_dedup_index(
            docs.withColumnRenamed("doc_id", "other"), root, spark,
            id_col="other",
        )
    # kind mismatch: a digest reader refuses an LSH index and vice versa
    lsh_root = str(tmp_path / "lsh_kind")
    build_lsh_dedup_index(docs, lsh_root, spark)
    with pytest.raises(ValueError, match="not a digest_dedup index"):
        duplicate_groups_from_index(lsh_root, spark)
