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


# ------------------------------------------------- media ingest gate


@pytest.fixture(scope="module")
def images(spark):
    """Deterministic synth images with a numeric idx — the hot
    duplicate clusters make exact AND near dups occur naturally."""
    from pic2vec_spark.synth import synth_images_df

    return (
        synth_images_df(spark, 96, seed=42)
        .withColumn("idx", F.substring("image_id", 5, 9).cast("long"))
        .select("image_id", "bytes", "fmt", "idx")
        .localCheckpoint(eager=True)
    )


def test_media_ingest_gate_classifies_and_appends(spark, images, tmp_path):
    """The image gate's dispositions equal a driver-side brute force
    (hashlib md5 for exact, all-pairs Hamming for near, exact wins),
    and survivors (and only survivors) are appended to both indexes."""
    import hashlib as hl

    from pic2vec_spark.codecs import decode_image
    from pic2vec_spark.ops.dedup_store import (
        build_digest_dedup_index,
        build_hamming_dedup_index,
        media_ingest_gate,
        probe_digest_dedup_index,
    )
    from pic2vec_spark.codecs import encode_image
    from pic2vec_spark.ops.multimodal import compute_phash, phash64

    rows = images.collect()
    # format-transcoded copies of committed images: same pixels (same
    # pHash), usually different bytes — the canonical image near-dup
    tc = []
    for r in rows:
        if r["idx"] % 8 != 4:
            continue
        try:
            px = decode_image(r["bytes"], r["fmt"])
        except Exception:
            continue
        tc.append(("tc_" + r["image_id"], encode_image(px, "bmp"), "bmp"))
    corpus = images.filter(F.col("idx") % 2 == 0)
    batch = (
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
    droot = str(tmp_path / "img_dig")
    hroot = str(tmp_path / "img_ham")
    build_digest_dedup_index(
        corpus, droot, spark,
        id_col="image_id", text_col="bytes", norm="binary",
    )
    build_hamming_dedup_index(
        compute_phash(corpus).filter(F.col("phash64_ok")), hroot, spark,
        max_distance=4, bits=64,
    )

    got = {
        r["image_id"]: (r["disposition"], r["keep_id"])
        for r in media_ingest_gate(batch, droot, hroot, spark).collect()
    }
    assert set(got) == {r["image_id"] for r in batch.collect()}

    # driver-side brute force with INDEPENDENT kernels (hashlib md5;
    # python phash64 over decode_image) over each batch row's ACTUAL
    # bytes (transcodes digest differently from their source)
    def fingerprint(data, fmt):
        try:
            h = phash64(decode_image(data, fmt))
        except Exception:
            h = None
        return hl.md5(data).hexdigest(), h

    cfp, cph = {}, {}
    for r in rows:
        if r["idx"] % 2 == 0:
            cfp[r["image_id"]], cph[r["image_id"]] = fingerprint(
                r["bytes"], r["fmt"]
            )
    batch_items = [
        (r["image_id"], r["bytes"], r["fmt"])
        for r in rows if r["idx"] % 2 == 1
    ] + [
        ("re_" + r["image_id"], r["bytes"], r["fmt"])
        for r in rows if r["idx"] % 8 == 0
    ] + tc
    expect = {}
    for bid, data, fmt in batch_items:
        bfp, bph = fingerprint(data, fmt)
        exact = [c for c, f in cfp.items() if f == bfp]
        near = [
            c for c, h in cph.items()
            if bph is not None and h is not None
            and bin(bph ^ h).count("1") <= 4
        ]
        if exact:
            expect[bid] = ("exact_dup", min(exact))
        elif near:
            expect[bid] = ("near_dup", min(near))
        else:
            expect[bid] = ("new", None)
    assert got == expect
    assert {d for d, _ in got.values()} == {"exact_dup", "near_dup", "new"}

    # survivors re-probe as exact hits of themselves
    new_ids = {b for b, (disp, _) in got.items() if disp == "new"}
    survivors = batch.filter(F.col("image_id").isin(*new_ids)).withColumn(
        "image_id", F.concat(F.lit("x_"), F.col("image_id"))
    )
    hit_map = {
        r["image_id"]: r["keep_id"]
        for r in probe_digest_dedup_index(
            droot, spark, survivors, "image_id", "bytes"
        ).collect()
    }
    # every survivor now exact-hits the index, and the keep target is
    # byte-identical to it (keep = the GROUP min — within-batch
    # identical survivors were both appended, so it may not be the
    # probed original itself)
    assert set(hit_map) == {"x_" + b for b in new_ids}
    fpb = {bid: fingerprint(data, fmt)[0] for bid, data, fmt in batch_items}
    all_fp = {**cfp, **fpb}
    for b in new_ids:
        assert all_fp[hit_map["x_" + b]] == fpb[b]


def test_digest_norm_is_manifest_sticky(spark, images, tmp_path):
    """A binary-norm index appends and probes with the binary digest
    read from the manifest — and an unknown stored norm raises instead
    of silently mixing incomparable digests."""
    import json

    from pic2vec_spark.ops.dedup_store import (
        append_to_digest_dedup_index,
        build_digest_dedup_index,
        duplicate_groups_from_index,
        probe_digest_dedup_index,
    )

    root = str(tmp_path / "bin_dig")
    build_digest_dedup_index(
        images.filter(F.col("idx") % 2 == 0), root, spark,
        id_col="image_id", text_col="bytes", norm="binary",
    )
    append_to_digest_dedup_index(
        images.filter(F.col("idx") % 2 == 1), root, spark,
        id_col="image_id", text_col="bytes",
    )
    # byte-identical hot-cluster images form groups across the halves
    groups = duplicate_groups_from_index(root, spark)
    assert groups.filter(F.col("n_dups") >= 2).count() > 0
    # a re-keyed re-ingest exact-hits its original through the probe
    batch = images.limit(3).withColumn(
        "image_id", F.concat(F.lit("re_"), F.col("image_id"))
    )
    hits = {
        (r["image_id"], r["keep_id"])
        for r in probe_digest_dedup_index(
            root, spark, batch, "image_id", "bytes"
        ).collect()
    }
    assert {("re_" + r["image_id"], r["image_id"])
            for r in images.limit(3).collect()} <= hits

    # unknown norm in the manifest → refuse, don't mix digests
    with pytest.raises(ValueError):
        build_digest_dedup_index(
            images, str(tmp_path / "bad"), spark,
            id_col="image_id", text_col="bytes", norm="sha9000",
        )
    import pathlib

    sid = (pathlib.Path(root) / "CURRENT").read_text().strip()
    man_path = pathlib.Path(root) / "snapshots" / f"{sid}.json"
    man = json.loads(man_path.read_text())
    man["properties"]["norm"] = "rot13_md5"
    man_path.write_text(json.dumps(man))
    with pytest.raises(ValueError, match="norm"):
        probe_digest_dedup_index(root, spark, batch, "image_id", "bytes")
