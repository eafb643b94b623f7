"""Persisted MinHash-LSH dedup index: incremental near-duplicate
detection without re-shingling the corpus.

``ops.dedup.lsh_candidate_pairs`` is the right one-shot shape, but it
recomputes every document's shingles, MinHash signature, and band
buckets on every run.  At 10^12 documents the corpus side of that is
the entire cost: a daily ingest of 0.1% new documents would pay the
full 100 TB shingle pass each day.  This module persists the band
buckets — (doc_id, band, band_sig), ~bands rows of a few dozen bytes
per document, orders of magnitude smaller than the text — with the
engine's own snapshot layer, so:

- ``build_lsh_dedup_index``: one shingle+MinHash pass over the corpus,
  ever.  Buckets are committed partitioned by a band_sig hex prefix
  with per-file prefix min/max stats in the manifest (the same
  Iceberg-style file pruning as ``ops.ivf_store``).
- ``append_to_lsh_dedup_index``: bucket ONLY the new documents and
  append them as new data files; existing files are carried forward
  untouched.  Ingest cost ∝ new data.  The hash family (permutation
  constants, band split, shingle width) is digest-verified — an append
  under a different family would land signatures no probe can match,
  silently missing every cross-batch duplicate.
- ``probe_lsh_dedup_index``: near-dup candidate pairs between a NEW
  batch and the indexed corpus (plus within the batch) BEFORE
  committing it — the ingest-time dedup gate.  The new batch's buckets
  are broadcast against the index scan (no corpus shuffle), and the
  scan itself is file-pruned to the batch's band_sig prefixes.
- ``neardup_pairs_from_index``: the full candidate pair set from the
  stored buckets alone — equals ``lsh_candidate_pairs`` over the same
  documents (same bucket definition, shared code), with zero text
  reads.

The same layout carries an EXACT-duplicate index (``*_digest_dedup_*``):
one md5 digest row per document (a few dozen bytes vs the full text),
prefix-partitioned so an ingest-time probe file-prunes the corpus scan.
Build once, append only the new batch's digests, and
``probe_digest_dedup_index`` answers "which of these incoming documents
are byte-identical (post-normalization) to something already committed"
without rescanning a single committed byte.

Reference contrast: pic2vec keeps no state between runs (it re-reads
its CSV/directory per call, image_featurizer.py:250); this module is
part of the engine's 100 TB ingest layer, not a parity item.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pic2vec_spark.ops.dedup import _norm_text, _perm_constants, lsh_band_buckets
from pic2vec_spark.snapshots import SnapshotTable


def _family_digest(
    n_hashes: int, bands: int, shingle_n: int, prefix_chars: int
) -> str:
    """Digest of the full hash family: an index is only probeable /
    appendable under the exact family it was built with (the MinHash
    permutation constants are included, so even a seed change is
    caught)."""
    parts = [n_hashes, bands, shingle_n, prefix_chars, *(
        v for ab in _perm_constants(n_hashes) for v in ab
    )]
    return hashlib.md5(",".join(map(str, parts)).encode()).hexdigest()


def _bucket_frame(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int,
    bands: int,
    shingle_n: int,
    prefix_chars: int,
) -> DataFrame:
    """(id, band, band_sig, sig_pfx) — band buckets plus the integer
    band_sig hex prefix used as the file-partition / pruning key."""
    return lsh_band_buckets(
        docs, id_col, text_col, n_hashes, bands, shingle_n
    ).withColumn(
        "sig_pfx",
        F.conv(F.substring("band_sig", 1, prefix_chars), 16, 10).cast("int"),
    )


def build_lsh_dedup_index(
    docs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    prefix_chars: int = 1,
    extra_properties: dict | None = None,
) -> str:
    """Commit the corpus's band buckets as a prefix-partitioned snapshot;
    returns the snapshot id.  ``prefix_chars`` hex chars of band_sig
    (16**prefix_chars buckets) drive file layout and probe pruning —
    1 suits tests, 2 (256-way) a production table."""
    buckets = _bucket_frame(
        docs, id_col, text_col, n_hashes, bands, shingle_n, prefix_chars
    )
    table = SnapshotTable(table_root, spark)
    return table.write(
        buckets,
        partition_by="sig_pfx",
        # 2x prefixes: same rule as ops.ivf_store — hash collisions then
        # rarely co-locate two prefixes in one file, keeping per-file
        # prefix ranges tight so probe pruning stays near-exact
        num_partitions=2 * (16 ** prefix_chars),
        stats_cols=["sig_pfx"],
        properties={
            **(extra_properties or {}),
            "index": "lsh_dedup",
            "id_col": id_col,
            "n_hashes": int(n_hashes),
            "bands": int(bands),
            "shingle_n": int(shingle_n),
            "prefix_chars": int(prefix_chars),
            "family_digest": _family_digest(
                n_hashes, bands, shingle_n, prefix_chars
            ),
        },
    )


def _index_family(
    table_root: str, spark: SparkSession, kind: str = "lsh_dedup"
) -> tuple:
    """(table, properties) with the family fields validated present."""
    table = SnapshotTable(table_root, spark)
    man = table.manifest()
    if man is None:
        raise FileNotFoundError(
            f"no {kind} index at {table_root} — build it first"
        )
    props = man.get("properties") or {}
    if props.get("index") != kind:
        raise ValueError(
            f"snapshot table at {table_root} is not a {kind} index "
            f"(index={props.get('index')!r})"
        )
    return table, props


def _check_family(props: dict, action: str) -> tuple[int, int, int, int]:
    n_hashes = int(props["n_hashes"])
    bands = int(props["bands"])
    shingle_n = int(props["shingle_n"])
    prefix_chars = int(props["prefix_chars"])
    expect = _family_digest(n_hashes, bands, shingle_n, prefix_chars)
    if props.get("family_digest") not in (None, expect):
        raise ValueError(
            f"{action}: this build's MinHash permutation constants do not "
            "reproduce the family this index was built with "
            "(family_digest mismatch) — signatures would be incomparable "
            "and every cross-batch duplicate silently missed; rebuild the "
            "index"
        )
    return n_hashes, bands, shingle_n, prefix_chars


def append_to_lsh_dedup_index(
    new_docs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    properties: dict | None = None,
) -> str:
    """Incremental index maintenance: bucket ONLY the new documents
    (family read from the manifest, digest-verified) and append them as
    new prefix-partitioned files.  Existing files are carried forward
    untouched — ingest cost ∝ new data.  Returns the new snapshot id
    (the parent stays readable: time travel across index versions)."""
    table, props = _index_family(table_root, spark)
    n_hashes, bands, shingle_n, prefix_chars = _check_family(props, "append")
    if props.get("id_col") != id_col:
        raise ValueError(
            f"append id_col {id_col!r} != index id_col {props.get('id_col')!r}"
        )
    buckets = _bucket_frame(
        new_docs, id_col, text_col, n_hashes, bands, shingle_n, prefix_chars
    )
    # same merge rule as ops.ivf_store.append_to_ivf_index: caller
    # properties must not displace the index-identity keys, or the next
    # append/probe would go unguarded
    if properties is not None:
        properties = {
            **properties,
            **{k: props[k] for k in (
                "index", "id_col", "n_hashes", "bands", "shingle_n",
                "prefix_chars", "family_digest",
            ) if k in props},
        }
    return table.append(
        buckets,
        partition_by="sig_pfx",
        num_partitions=2 * (16 ** prefix_chars),
        stats_cols=["sig_pfx"],
        properties=properties,
    )


def neardup_pairs_from_index(
    table_root: str, spark: SparkSession
) -> DataFrame:
    """All near-dup candidate pairs (id1 < id2) from the stored buckets
    — equals ``lsh_candidate_pairs`` over every indexed document (the
    bucket definition is shared code), but reads only the bucket files:
    no text, no shingling, no MinHash recompute."""
    table, props = _index_family(table_root, spark)
    id_col = props.get("id_col", "doc_id")
    buckets = table.scan().select(id_col, "band", "band_sig")
    a = buckets.select(F.col(id_col).alias("id1"), "band", "band_sig")
    b = buckets.select(F.col(id_col).alias("id2"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def probe_lsh_dedup_index(
    table_root: str,
    spark: SparkSession,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingest-time dedup gate: candidate pairs (id1 < id2) where at
    least one side is in ``new_docs`` — batch-vs-corpus (the index scan,
    file-pruned to the batch's band_sig prefixes, broadcast-joined
    against the batch's buckets: no corpus shuffle) unioned with
    batch-internal pairs.  Run BEFORE ``append_to_lsh_dedup_index`` so
    duplicates can be dropped from the batch; equals the full
    ``lsh_candidate_pairs`` over (corpus ∪ batch) restricted to pairs
    touching the batch."""
    table, props = _index_family(table_root, spark)
    n_hashes, bands, shingle_n, prefix_chars = _check_family(props, "probe")
    idx_id = props.get("id_col", "doc_id")
    delta = _bucket_frame(
        new_docs, id_col, text_col, n_hashes, bands, shingle_n, prefix_chars
    ).localCheckpoint(eager=True)  # used 3x: prefix set, corpus join, self-join
    # the distinct prefix set is bounded by 16**prefix_chars (≤256) —
    # a driver-sized collect that drives manifest file pruning, the
    # same shape as probe_ivf_index's probed-cell set
    pfx = sorted(
        r["sig_pfx"] for r in delta.select("sig_pfx").distinct().collect()
    )
    if not pfx:
        return delta.select(
            F.col(id_col).alias("id1"), F.col(id_col).alias("id2")
        ).limit(0)
    corpus = table.scan(
        min_stats={"sig_pfx": (pfx[0], pfx[-1])}
    ).filter(F.col("sig_pfx").isin(*pfx))
    cross = (
        corpus.select(F.col(idx_id).alias("ia"), "band", "band_sig")
        .join(
            F.broadcast(
                delta.select(F.col(id_col).alias("ib"), "band", "band_sig")
            ),
            ["band", "band_sig"],
        )
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("id1"),
            F.greatest("ia", "ib").alias("id2"),
        )
    )
    da = delta.select(F.col(id_col).alias("id1"), "band", "band_sig")
    db = delta.select(F.col(id_col).alias("id2"), "band", "band_sig")
    within = (
        da.join(db, ["band", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )
    return cross.unionByName(within).distinct()


# --------------------------------------------------- exact digest index

def _digest_frame(
    docs: DataFrame, id_col: str, text_col: str, prefix_chars: int,
    norm: str = "lower_trim",
) -> DataFrame:
    """(id, fp_md5, fp_pfx) — one md5 row per document.  ``norm``
    picks the digest definition: ``lower_trim`` matches
    ``ops.dedup.exact_dedup`` (text corpora, so index answers equal
    the one-shot operator's); ``binary`` hashes the raw column bytes
    (image/audio blobs, where case-folding is meaningless)."""
    if norm == "lower_trim":
        digest = F.md5(_norm_text(text_col))
    elif norm == "binary":
        digest = F.md5(F.col(text_col))
    else:
        raise ValueError(f"unknown digest norm {norm!r}")
    return docs.select(
        F.col(id_col), digest.alias("fp_md5")
    ).withColumn(
        "fp_pfx",
        F.conv(F.substring("fp_md5", 1, prefix_chars), 16, 10).cast("int"),
    )


def build_digest_dedup_index(
    docs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 1,
    norm: str = "lower_trim",
    extra_properties: dict | None = None,
) -> str:
    """Commit one md5 digest row per document, prefix-partitioned with
    per-file fp_pfx min/max stats — the exact-dup complement of
    ``build_lsh_dedup_index``.  ``norm='binary'`` makes this an exact
    image/blob index (digest over raw bytes).  Returns the snapshot
    id."""
    table = SnapshotTable(table_root, spark)
    return table.write(
        _digest_frame(docs, id_col, text_col, prefix_chars, norm),
        partition_by="fp_pfx",
        num_partitions=2 * (16 ** prefix_chars),
        stats_cols=["fp_pfx"],
        properties={
            **(extra_properties or {}),
            "index": "digest_dedup",
            "id_col": id_col,
            "norm": f"{norm}_md5",
            "prefix_chars": int(prefix_chars),
        },
    )


def _digest_norm(props: dict, action: str) -> str:
    """The digest definition this index was built with — the manifest
    is the source of truth, so appends and probes digest new rows the
    same way forever (mixed-norm digests would be incomparable)."""
    norm_prop = props.get("norm", "lower_trim_md5")
    if norm_prop not in ("lower_trim_md5", "binary_md5"):
        raise ValueError(
            f"{action}: index digest norm {norm_prop!r} is not one this "
            "build can reproduce — digests would be incomparable; "
            "rebuild the index"
        )
    return norm_prop[: -len("_md5")]


def append_to_digest_dedup_index(
    new_docs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    properties: dict | None = None,
) -> str:
    """Digest ONLY the new documents and append them as new
    prefix-partitioned files; committed files are carried forward
    untouched — ingest cost ∝ new data.  Returns the new snapshot id."""
    table, props = _index_family(table_root, spark, "digest_dedup")
    if props.get("id_col") != id_col:
        raise ValueError(
            f"append id_col {id_col!r} != index id_col {props.get('id_col')!r}"
        )
    norm = _digest_norm(props, "append")
    prefix_chars = int(props["prefix_chars"])
    if properties is not None:
        properties = {
            **properties,
            **{k: props[k] for k in (
                "index", "id_col", "norm", "prefix_chars",
            ) if k in props},
        }
    return table.append(
        _digest_frame(new_docs, id_col, text_col, prefix_chars, norm),
        partition_by="fp_pfx",
        num_partitions=2 * (16 ** prefix_chars),
        stats_cols=["fp_pfx"],
        properties=properties,
    )


def duplicate_groups_from_index(
    table_root: str, spark: SparkSession
) -> DataFrame:
    """(fp_md5, keep_id, n_dups) over every indexed document — equals
    ``ops.dedup.exact_dedup`` on the same documents (shared digest
    definition), but reads only the digest files: no text scan."""
    table, props = _index_family(table_root, spark, "digest_dedup")
    id_col = props.get("id_col", "doc_id")
    return (
        table.scan()
        .groupBy("fp_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def probe_digest_dedup_index(
    table_root: str,
    spark: SparkSession,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingest-time exact-dup gate: (id, keep_id) for each new document
    whose normalized text is byte-identical to a committed one (keep_id
    = the smallest such committed id).  The batch's digests are
    broadcast against the index scan, file-pruned to the batch's digest
    prefixes — zero committed text or digest is re-read beyond the
    pruned files, and the corpus side never shuffles.  Run BEFORE
    ``append_to_digest_dedup_index`` so exact duplicates can be dropped
    from (or linked in) the incoming batch."""
    table, props = _index_family(table_root, spark, "digest_dedup")
    idx_id = props.get("id_col", "doc_id")
    prefix_chars = int(props["prefix_chars"])
    delta = _digest_frame(
        new_docs, id_col, text_col, prefix_chars,
        _digest_norm(props, "probe"),
    ).localCheckpoint(eager=True)  # used 2x: prefix set + corpus join
    # bounded by 16**prefix_chars (≤256) — driver-sized, drives pruning
    pfx = sorted(
        r["fp_pfx"] for r in delta.select("fp_pfx").distinct().collect()
    )
    if not pfx:
        return delta.select(
            F.col(id_col), F.col(id_col).alias("keep_id")
        ).limit(0)
    corpus = table.scan(
        min_stats={"fp_pfx": (pfx[0], pfx[-1])}
    ).filter(F.col("fp_pfx").isin(*pfx))
    return (
        corpus.select(F.col(idx_id).alias("_corpus_id"), "fp_md5")
        .join(
            F.broadcast(delta.select(F.col(id_col), "fp_md5")), "fp_md5"
        )
        .groupBy(id_col)
        .agg(F.min("_corpus_id").alias("keep_id"))
    )


# --------------------------------------------- Hamming (phash) index

def _hamming_family_digest(max_distance: int, bits: int,
                           bucket_mod: int) -> str:
    return hashlib.md5(
        f"hamming,{max_distance},{bits},{bucket_mod}".encode()
    ).hexdigest()


def _chunk_frame(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_distance: int,
    bits: int,
    bucket_mod: int,
) -> DataFrame:
    """(id, sig, chunk, chunk_val, pfx) — the pigeonhole chunk buckets
    of ``ops.dedup.hamming_neardup_pairs`` (same split: max_distance+1
    chunks, last chunk absorbs remainder bits), plus the bounded
    pruning key pfx = chunk * bucket_mod + chunk_val % bucket_mod."""
    chunks = max_distance + 1
    width = bits // chunks

    def chunk_val(c: int):
        w = width if c < chunks - 1 else bits - width * (chunks - 1)
        return F.shiftright(F.col(sig_col), c * width).bitwiseAND(
            F.lit((1 << w) - 1)
        )

    entries = F.array(
        *[
            F.struct(F.lit(c).alias("chunk"), chunk_val(c).alias("chunk_val"))
            for c in range(chunks)
        ]
    )
    return sigs.select(
        F.col(id_col),
        F.col(sig_col).alias("sig"),
        F.explode(entries).alias("__cb"),
    ).select(
        id_col,
        "sig",
        F.col("__cb.chunk").alias("chunk"),
        F.col("__cb.chunk_val").alias("chunk_val"),
        (
            F.col("__cb.chunk") * bucket_mod
            + F.pmod(F.col("__cb.chunk_val"), F.lit(bucket_mod))
        ).cast("int").alias("pfx"),
    )


def build_hamming_dedup_index(
    sigs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "image_id",
    sig_col: str = "phash64",
    max_distance: int = 4,
    bits: int = 64,
    bucket_mod: int = 16,
    extra_properties: dict | None = None,
) -> str:
    """Persisted Hamming-ball index over any <=64-bit fingerprint
    (image pHash, text SimHash): commit each row's pigeonhole chunk
    buckets — any pair within ``max_distance`` bits shares at least one
    exact chunk — partitioned by the bounded pruning key with per-file
    stats.  The same incremental story as the LSH/digest stores: one
    fingerprint pass over the corpus, ever; appends touch only new
    data; probes broadcast the batch against a file-pruned scan."""
    table = SnapshotTable(table_root, spark)
    return table.write(
        _chunk_frame(sigs, id_col, sig_col, max_distance, bits, bucket_mod),
        partition_by="pfx",
        num_partitions=2 * (max_distance + 1) * bucket_mod,
        stats_cols=["pfx"],
        properties={
            **(extra_properties or {}),
            "index": "hamming_dedup",
            "id_col": id_col,
            "max_distance": int(max_distance),
            "bits": int(bits),
            "bucket_mod": int(bucket_mod),
            "family_digest": _hamming_family_digest(
                max_distance, bits, bucket_mod
            ),
        },
    )


def _hamming_family(table_root: str, spark: SparkSession,
                    action: str) -> tuple:
    table, props = _index_family(table_root, spark, "hamming_dedup")
    max_distance = int(props["max_distance"])
    bits = int(props["bits"])
    bucket_mod = int(props["bucket_mod"])
    expect = _hamming_family_digest(max_distance, bits, bucket_mod)
    if props.get("family_digest") not in (None, expect):
        raise ValueError(
            f"{action}: this build's chunk family does not reproduce the "
            "one this index was built with (family_digest mismatch) — "
            "chunk buckets would be incomparable; rebuild the index"
        )
    return table, props, max_distance, bits, bucket_mod


def append_to_hamming_dedup_index(
    new_sigs: DataFrame,
    table_root: str,
    spark: SparkSession,
    id_col: str = "image_id",
    sig_col: str = "phash64",
    properties: dict | None = None,
) -> str:
    """Chunk ONLY the new fingerprints (family read from the manifest,
    digest-verified) and append them as new files — ingest cost ∝ new
    data.  Returns the new snapshot id."""
    table, props, max_distance, bits, bucket_mod = _hamming_family(
        table_root, spark, "append"
    )
    if props.get("id_col") != id_col:
        raise ValueError(
            f"append id_col {id_col!r} != index id_col {props.get('id_col')!r}"
        )
    if properties is not None:
        properties = {
            **properties,
            **{k: props[k] for k in (
                "index", "id_col", "max_distance", "bits", "bucket_mod",
                "family_digest",
            ) if k in props},
        }
    return table.append(
        _chunk_frame(
            new_sigs, id_col, sig_col, max_distance, bits, bucket_mod
        ),
        partition_by="pfx",
        num_partitions=2 * (max_distance + 1) * bucket_mod,
        stats_cols=["pfx"],
        properties=properties,
    )


def neardup_pairs_from_hamming_index(
    table_root: str, spark: SparkSession
) -> DataFrame:
    """(id1, id2, hamming) for every indexed pair within max_distance —
    equals ``hamming_neardup_pairs`` over the same fingerprints (the
    chunk definition is shared), with zero fingerprint recompute."""
    table, props, max_distance, _, _ = _hamming_family(
        table_root, spark, "pairs"
    )
    id_col = props.get("id_col", "image_id")
    buckets = table.scan().select(id_col, "sig", "chunk", "chunk_val")
    a = buckets.select(
        F.col(id_col).alias("id1"), F.col("sig").alias("s1"),
        "chunk", "chunk_val",
    )
    b = buckets.select(
        F.col(id_col).alias("id2"), F.col("sig").alias("s2"),
        "chunk", "chunk_val",
    )
    return (
        a.join(b, ["chunk", "chunk_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_distance)
        .select("id1", "id2", "hamming")
    )


def probe_hamming_dedup_index(
    table_root: str,
    spark: SparkSession,
    new_sigs: DataFrame,
    id_col: str = "image_id",
    sig_col: str = "phash64",
) -> DataFrame:
    """Ingest-time near-dup gate for fingerprinted media: (id1, id2,
    hamming) pairs within max_distance where at least one side is in
    ``new_sigs`` — batch-vs-corpus via the broadcast batch buckets
    against the file-pruned index scan (no corpus shuffle), unioned
    with batch-internal pairs.  Run BEFORE appending so near-duplicate
    images can be dropped from the incoming batch."""
    table, props, max_distance, bits, bucket_mod = _hamming_family(
        table_root, spark, "probe"
    )
    idx_id = props.get("id_col", "image_id")
    delta = _chunk_frame(
        new_sigs, id_col, sig_col, max_distance, bits, bucket_mod
    ).localCheckpoint(eager=True)  # used 3x: pfx set, corpus join, self-join
    pfx = sorted(
        r["pfx"] for r in delta.select("pfx").distinct().collect()
    )
    if not pfx:
        return delta.select(
            F.col(id_col).alias("id1"),
            F.col(id_col).alias("id2"),
            F.lit(0).alias("hamming"),
        ).limit(0)
    corpus = table.scan(
        min_stats={"pfx": (pfx[0], pfx[-1])}
    ).filter(F.col("pfx").isin(*pfx))
    cross = (
        corpus.select(
            F.col(idx_id).alias("ia"), F.col("sig").alias("sa"),
            "chunk", "chunk_val",
        )
        .join(
            F.broadcast(
                delta.select(
                    F.col(id_col).alias("ib"), F.col("sig").alias("sb"),
                    "chunk", "chunk_val",
                )
            ),
            ["chunk", "chunk_val"],
        )
        .filter(F.col("ia") != F.col("ib"))
        .select(
            F.least("ia", "ib").alias("id1"),
            F.greatest("ia", "ib").alias("id2"),
            F.col("sa").alias("s1"),
            F.col("sb").alias("s2"),
        )
    )
    da = delta.select(
        F.col(id_col).alias("id1"), F.col("sig").alias("s1"),
        "chunk", "chunk_val",
    )
    db = delta.select(
        F.col(id_col).alias("id2"), F.col("sig").alias("s2"),
        "chunk", "chunk_val",
    )
    within = (
        da.join(db, ["chunk", "chunk_val"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "s1", "s2")
    )
    return (
        cross.unionByName(within)
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_distance)
        .select("id1", "id2", "hamming")
    )


# -------------------------------------------------------- ingest gate

def ingest_gate(
    batch: DataFrame,
    digest_root: str,
    lsh_root: str,
    spark: SparkSession,
    id_col: str = "doc_id",
    text_col: str = "text",
    append: bool = True,
) -> DataFrame:
    """The full ingest-time dedup gate in one call: classify every
    incoming document against BOTH persisted indexes and (optionally)
    append only the survivors.  Returns one row per batch document:

    - ``disposition='exact_dup'``, keep_id = the smallest committed id
      with byte-identical normalized text (digest index);
    - ``disposition='near_dup'``, keep_id = the smallest committed
      LSH near-dup candidate partner (exact wins when both hit);
    - ``disposition='new'``, keep_id = NULL — appended to both indexes
      when ``append=True``.

    Batch ids must be disjoint from committed ids (the gate's contract
    — ingests assign fresh ids).  Within-batch near-dup pairs are NOT
    dropped here (both sides are unseen; resolve them upstream with
    ``lsh_candidate_pairs`` if single-batch dedup is wanted) — the gate
    answers "is this new against the committed corpus".  Plan shape:
    both probes broadcast the (micro-)batch against file-pruned index
    scans; the committed corpus never shuffles and no committed text is
    re-read."""
    # pay the batch's upstream plan (file read + transforms) exactly
    # once — it feeds the id projection, both probes, and the
    # survivors join
    batch = batch.localCheckpoint(eager=True)
    batch_ids = batch.select(F.col(id_col))
    exact = probe_digest_dedup_index(
        digest_root, spark, batch, id_col, text_col
    ).withColumnRenamed("keep_id", "_exact_keep")
    pairs = probe_lsh_dedup_index(lsh_root, spark, batch, id_col, text_col)
    b1 = batch_ids.select(F.col(id_col).alias("id1"))
    b2 = batch_ids.select(F.col(id_col).alias("id2"))
    # corpus partner = the pair side that is NOT a batch id
    near = (
        pairs.join(F.broadcast(b1), "id1", "semi")
        .join(F.broadcast(b2), "id2", "anti")
        .select(F.col("id1").alias(id_col), F.col("id2").alias("_partner"))
        .unionByName(
            pairs.join(F.broadcast(b2), "id2", "semi")
            .join(F.broadcast(b1), "id1", "anti")
            .select(
                F.col("id2").alias(id_col), F.col("id1").alias("_partner")
            )
        )
        .groupBy(id_col)
        .agg(F.min("_partner").alias("_near_keep"))
    )
    decisions = (
        batch_ids.join(F.broadcast(exact), id_col, "left")
        .join(F.broadcast(near), id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact_keep").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_keep").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("disposition"),
            F.coalesce("_exact_keep", "_near_keep").alias("keep_id"),
        )
        # materialize BEFORE the appends mutate the indexes the probes
        # read — decisions must reflect the pre-ingest corpus
        .localCheckpoint(eager=True)
    )
    if append:
        survivors = batch.join(
            decisions.filter(F.col("disposition") == "new").select(id_col),
            id_col,
            "semi",
        ).localCheckpoint(eager=True)
        # a fully-duplicate batch (the very case the gate exists for)
        # must not commit two empty snapshot versions per micro-batch
        if not survivors.isEmpty():
            append_to_digest_dedup_index(
                survivors, digest_root, spark, id_col, text_col
            )
            append_to_lsh_dedup_index(
                survivors, lsh_root, spark, id_col, text_col
            )
    return decisions


def media_ingest_gate(
    batch: DataFrame,
    digest_root: str,
    hamming_root: str,
    spark: SparkSession,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    sig_col: str = "phash64",
    append: bool = True,
) -> DataFrame:
    """``ingest_gate`` for binary media: classify every incoming image
    (or any fingerprintable blob) against a persisted exact-byte
    digest index (``norm='binary'``) and a persisted pHash Hamming
    index, then (optionally) append only the survivors.  One row per
    batch image:

    - ``disposition='exact_dup'``, keep_id = the smallest committed id
      with byte-identical content (digest index);
    - ``disposition='near_dup'``, keep_id = the smallest committed
      pHash partner within the index's max_distance (exact wins when
      both hit);
    - ``disposition='new'``, keep_id = NULL — appended to the digest
      index, and to the Hamming index when its pHash decoded.

    Undecodable blobs (``phash64_ok`` false) still get the exact-byte
    check — a corrupt file re-ingested twice is still a duplicate —
    but can only be exact_dup or new.  Batch ids must be disjoint from
    committed ids (ingests assign fresh ids); within-batch near-dup
    pairs are NOT dropped here (both sides are unseen — resolve them
    upstream with ``hamming_neardup_pairs`` if single-batch dedup is
    wanted).  Plan shape: the pHash decode pass runs ONCE over the
    batch (checkpointed), both probes broadcast the batch against
    file-pruned index scans, and the committed corpus never shuffles —
    no committed byte is re-read or re-hashed."""
    from pic2vec_spark.ops.multimodal import compute_phash

    # one decode+DCT pass over the batch — it feeds the id projection,
    # both probes, and the survivors join
    fp = compute_phash(
        batch, bytes_col=bytes_col, fmt_col=fmt_col, out_col=sig_col
    ).localCheckpoint(eager=True)
    batch_ids = fp.select(F.col(id_col))
    exact = probe_digest_dedup_index(
        digest_root, spark, fp, id_col, bytes_col
    ).withColumnRenamed("keep_id", "_exact_keep")
    pairs = probe_hamming_dedup_index(
        hamming_root, spark, fp.filter(F.col(f"{sig_col}_ok")),
        id_col, sig_col,
    )
    b1 = batch_ids.select(F.col(id_col).alias("id1"))
    b2 = batch_ids.select(F.col(id_col).alias("id2"))
    # corpus partner = the pair side that is NOT a batch id
    near = (
        pairs.join(F.broadcast(b1), "id1", "semi")
        .join(F.broadcast(b2), "id2", "anti")
        .select(F.col("id1").alias(id_col), F.col("id2").alias("_partner"))
        .unionByName(
            pairs.join(F.broadcast(b2), "id2", "semi")
            .join(F.broadcast(b1), "id1", "anti")
            .select(
                F.col("id2").alias(id_col), F.col("id1").alias("_partner")
            )
        )
        .groupBy(id_col)
        .agg(F.min("_partner").alias("_near_keep"))
    )
    decisions = (
        batch_ids.join(F.broadcast(exact), id_col, "left")
        .join(F.broadcast(near), id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact_keep").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_keep").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("disposition"),
            F.coalesce("_exact_keep", "_near_keep").alias("keep_id"),
        )
        # materialize BEFORE the appends mutate the indexes the probes
        # read — decisions must reflect the pre-ingest corpus
        .localCheckpoint(eager=True)
    )
    if append:
        survivors = fp.join(
            decisions.filter(F.col("disposition") == "new").select(id_col),
            id_col,
            "semi",
        ).localCheckpoint(eager=True)
        if not survivors.isEmpty():
            append_to_digest_dedup_index(
                survivors, digest_root, spark, id_col, bytes_col
            )
            sigs = survivors.filter(F.col(f"{sig_col}_ok"))
            if not sigs.isEmpty():
                append_to_hamming_dedup_index(
                    sigs, hamming_root, spark, id_col, sig_col
                )
    return decisions
