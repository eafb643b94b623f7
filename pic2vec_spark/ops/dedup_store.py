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
    docs: DataFrame, id_col: str, text_col: str, prefix_chars: int
) -> DataFrame:
    """(id, fp_md5, fp_pfx) — one md5 row per document.  The digest is
    over the same normalization as ``ops.dedup.exact_dedup``
    (lower+trim), so index answers equal the one-shot operator's."""
    return docs.select(
        F.col(id_col), F.md5(_norm_text(text_col)).alias("fp_md5")
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
    extra_properties: dict | None = None,
) -> str:
    """Commit one md5 digest row per document, prefix-partitioned with
    per-file fp_pfx min/max stats — the exact-dup complement of
    ``build_lsh_dedup_index``.  Returns the snapshot id."""
    table = SnapshotTable(table_root, spark)
    return table.write(
        _digest_frame(docs, id_col, text_col, prefix_chars),
        partition_by="fp_pfx",
        num_partitions=2 * (16 ** prefix_chars),
        stats_cols=["fp_pfx"],
        properties={
            **(extra_properties or {}),
            "index": "digest_dedup",
            "id_col": id_col,
            "norm": "lower_trim_md5",
            "prefix_chars": int(prefix_chars),
        },
    )


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
    if props.get("norm") not in (None, "lower_trim_md5"):
        raise ValueError(
            f"append: index normalization {props.get('norm')!r} does not "
            "match this build's lower_trim_md5 — digests would be "
            "incomparable; rebuild the index"
        )
    prefix_chars = int(props["prefix_chars"])
    if properties is not None:
        properties = {
            **properties,
            **{k: props[k] for k in (
                "index", "id_col", "norm", "prefix_chars",
            ) if k in props},
        }
    return table.append(
        _digest_frame(new_docs, id_col, text_col, prefix_chars),
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
        new_docs, id_col, text_col, prefix_chars
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
