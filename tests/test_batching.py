"""Aspect-bucket batching + shard manifest (ops/batching.py).

Closed-form assignments, deterministic tie-breaks, pandas reference
for the prefix-sum shard layout, partition invariance, and the plan
guarantees (assignment is a zero-Exchange projection; no Python UDFs
anywhere on these paths).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.ops.batching import (
    DEFAULT_ASPECT_BUCKETS,
    aspect_bucket_assign,
    aspect_bucket_batches,
    shard_manifest,
)


def _images(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "w", "h"]),
        "image_id string, w int, h int",
    )


def test_assign_closed_form(spark):
    df = _images(
        spark,
        [
            ("a", 64, 64),    # exact (64, 64)
            ("b", 128, 32),   # exact (128, 32)
            ("c", 100, 100),  # square -> (64, 64)
            ("d", 24, 96),    # 1:4 -> (32, 128)
            ("e", 227, 24),   # wider than 4:1 -> clamps to (128, 32)
        ],
    )
    got = {
        r["image_id"]: (r["bucket_w"], r["bucket_h"])
        for r in aspect_bucket_assign(df).collect()
    }
    assert got == {
        "a": (64, 64),
        "b": (128, 32),
        "c": (64, 64),
        "d": (32, 128),
        "e": (128, 32),
    }


def test_assign_tie_breaks_to_lower_index(spark):
    # w=8,h=9: dist to (56,72) = |72*8-56*9|/72 = 1.0 exactly, and to
    # (64,64) = |8-9| = 1.0 exactly -> first-lowest-index wins: (56,72).
    df = _images(spark, [("t", 8, 9)])
    row = aspect_bucket_assign(df).collect()[0]
    assert (row["bucket_w"], row["bucket_h"]) == (56, 72)
    assert row["bucket_idx"] == 2


def test_assign_null_and_nonpositive_dims(spark):
    df = _images(spark, [("n1", None, 64), ("n2", 0, 64), ("n3", 64, -1)])
    for r in aspect_bucket_assign(df).collect():
        assert r["bucket_idx"] is None
        assert r["bucket_w"] is None and r["bucket_h"] is None


def test_assign_is_zero_exchange_projection(spark):
    df = _images(spark, [("a", 64, 64)])
    plan = aspect_bucket_assign(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def _ref_batches(rows, bs):
    """Pandas reference: argmin assignment + per-bucket id-order batching."""
    out = {}
    per_bucket: dict[int, list[str]] = {}
    for iid, w, h in rows:
        if w is None or h is None or w <= 0 or h <= 0:
            continue
        dists = [
            abs(w * bh - bw * h) / bh for bw, bh in DEFAULT_ASPECT_BUCKETS
        ]
        b = dists.index(min(dists))
        per_bucket.setdefault(b, []).append(iid)
    for b, ids in per_bucket.items():
        ids.sort()
        nfull = len(ids) // bs
        for rn, iid in enumerate(ids):
            out[iid] = (b, rn // bs, (rn // bs) < nfull)
    return out


def test_batches_match_reference_and_are_partition_invariant(spark):
    rows = [
        (f"img_{i:04d}", (i * 13) % 200 + 5, (i * 7) % 180 + 5)
        for i in range(97)
    ] + [("img_null", None, 50)]
    expect = _ref_batches(rows, bs=8)
    for nparts in (1, 7):
        df = _images(spark, rows).repartition(nparts)
        got = {
            r["image_id"]: (r["bucket_idx"], r["batch_idx"], r["batch_full"])
            for r in aspect_bucket_batches(df, batch_size=8).collect()
        }
        assert got == expect


def test_sharded_batches_stay_single_bucket_and_bounded(spark):
    rows = [
        (f"img_{i:04d}", (i * 13) % 200 + 5, (i * 7) % 180 + 5)
        for i in range(200)
    ]
    df = _images(spark, rows)
    out = aspect_bucket_batches(df, batch_size=8, n_shards=4).toPandas()
    # every id appears exactly once
    assert sorted(out["image_id"]) == sorted(r[0] for r in rows)
    g = out.groupby(["bucket_idx", "batch_idx"])
    sizes = g.size()
    assert (sizes <= 8).all()
    # a batch_idx never spans buckets and full-ness is exact
    for (_, _), grp in g:
        assert grp["bucket_idx"].nunique() == 1
        assert set(grp["batch_full"]) == ({True} if len(grp) == 8 else {False})


def test_batch_validation(spark):
    df = _images(spark, [("a", 64, 64)])
    with pytest.raises(ValueError, match="batch_size"):
        aspect_bucket_batches(df, batch_size=0)
    with pytest.raises(ValueError, match="bucket dims"):
        aspect_bucket_assign(df, buckets=[(0, 4)])
    with pytest.raises(ValueError, match="non-empty"):
        aspect_bucket_assign(df, buckets=[])


def _ref_shards(sizes, budget):
    out, start = {}, 0
    for iid, nb in sorted(sizes):
        out[iid] = (nb, start // budget, start % budget)
        start += nb
    return out


def test_shard_manifest_matches_prefix_sum_reference(spark):
    sizes = [(f"d_{i:05d}", (i * 997) % 5000 + 1) for i in range(300)]
    expect = _ref_shards(sizes, budget=40_000)
    pdf = pd.DataFrame(sizes, columns=["doc_id", "nbytes"])
    df = spark.createDataFrame(pdf, "doc_id string, nbytes long").repartition(5)
    # bucket consistent with doc_id order: the embedded index / 64
    bucketed = df.withColumn(
        "bkt", F.floor(F.substring("doc_id", 3, 5).cast("long") / 64)
    )
    for frame, bcol in ((df, None), (bucketed, "bkt")):
        got = {
            r["doc_id"]: (r["nbytes"], r["shard_id"], r["shard_offset"])
            for r in shard_manifest(
                frame, 40_000, id_col="doc_id", bucket_col=bcol
            ).collect()
        }
        assert got == expect


def test_shard_offsets_bounded_and_contiguous(spark):
    sizes = [(f"d_{i:05d}", (i * 31) % 900 + 100) for i in range(128)]
    df = spark.createDataFrame(
        pd.DataFrame(sizes, columns=["doc_id", "nbytes"]),
        "doc_id string, nbytes long",
    )
    out = (
        shard_manifest(df, 10_000, id_col="doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert ((out["shard_offset"] >= 0) & (out["shard_offset"] < 10_000)).all()
    # global starts are the exclusive prefix sum -> contiguous stream
    starts = out["shard_id"] * 10_000 + out["shard_offset"]
    assert (starts == out["nbytes"].cumsum().shift(fill_value=0)).all()


def test_shard_manifest_no_python_udf(spark):
    df = spark.createDataFrame(
        pd.DataFrame([("a", 10)], columns=["doc_id", "nbytes"]),
        "doc_id string, nbytes long",
    )
    plan = (
        shard_manifest(df, 100, id_col="doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
