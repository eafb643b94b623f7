"""Tile pHash + crop-robust repost detection.

Pins (1) the tile kernel = whole-image pHash of the exact integer
slice, (2) the lossless-crop identity the equi-join relies on, (3)
planted-crop RECALL through the full Spark path — the literal oracle
alone can't distinguish "both sides found it" from "both sides missed
it", this test can.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pic2vec_spark.codecs import decode_image, encode_image
from pic2vec_spark.ops.multimodal import (
    compute_tile_phash,
    crop_source_matches,
    phash64,
    tile_phash64s,
)
from pic2vec_spark.synth import synth_image_row


def _img(seed: int, h: int = 64, w: int = 96) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_tile_kernel_equals_manual_slice():
    img = _img(7)
    hs = tile_phash64s(img, grid=2)
    assert len(hs) == 4
    h, w = img.shape[:2]
    manual = [
        phash64(img[0 : h // 2, 0 : w // 2]),
        phash64(img[0 : h // 2, w // 2 : w]),
        phash64(img[h // 2 : h, 0 : w // 2]),
        phash64(img[h // 2 : h, w // 2 : w]),
    ]
    assert hs == manual


def test_grid3_shape():
    assert len(tile_phash64s(_img(3), grid=3)) == 9


def test_lossless_crop_hash_identity():
    # the property the equi-join relies on: a BMP re-encode of the
    # exact tile slice hashes to the identical 64-bit value
    img = _img(11)
    h, w = img.shape[:2]
    tile = img[0 : h // 2, w // 2 : w]
    crop = decode_image(encode_image(tile, "bmp"), "bmp")
    assert phash64(crop) == tile_phash64s(img, grid=2)[1]


def test_compute_tile_phash_undecodable(spark):
    df = spark.createDataFrame(
        [("bad", b"\x00\x01", "png")], "image_id string, bytes binary, fmt string"
    )
    row = compute_tile_phash(df).collect()[0]
    assert row["tile_ok"] is False
    assert list(row["tile_phashes"]) == [0, 0, 0, 0]


def test_planted_crop_recall(spark):
    # plant quadrant crops of real synth images; every planted
    # (crop, source, quadrant) triple MUST surface through the join
    rows = [synth_image_row(i, 64, 42) for i in range(64)]
    corpus = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    planted = []
    crops = []
    for i in (0, 8, 24):
        r = rows[i]
        px = decode_image(r["bytes"], r["fmt"])
        h, w = px.shape[:2]
        q = i % 4
        rr, cc = q // 2, q % 2
        tile = px[rr * h // 2 : (rr + 1) * h // 2, cc * w // 2 : (cc + 1) * w // 2]
        cid = f"c{i}"
        crops.append((cid, encode_image(tile, "bmp"), "bmp"))
        planted.append((cid, r["image_id"], q))
    crops_df = spark.createDataFrame(
        crops, "crop_id string, bytes binary, fmt string"
    )
    got = {
        (r["crop_id"], r["src_image_id"], r["tile_id"])
        for r in crop_source_matches(crops_df, corpus).collect()
    }
    for triple in planted:
        assert triple in got, triple


def test_partition_invariance(spark):
    rows = [synth_image_row(i, 32, 42) for i in range(32)]
    df = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    one = sorted(
        (r["image_id"], tuple(r["tile_phashes"]))
        for r in compute_tile_phash(df.coalesce(1)).collect()
    )
    many = sorted(
        (r["image_id"], tuple(r["tile_phashes"]))
        for r in compute_tile_phash(df.repartition(8)).collect()
    )
    assert one == many


def test_tile_index_probe_recall_lossy(spark, tmp_path):
    # persisted tile index + 6-bit probe must surface a JPEG
    # (lossy) re-encode of a quadrant — the ingest-time crop gate
    from pic2vec_spark.ops.dedup_store import (
        build_hamming_dedup_index,
        probe_hamming_dedup_index,
    )
    from pic2vec_spark.ops.multimodal import compute_phash, compute_tile_phash

    rows = [synth_image_row(i, 64, 42) for i in range(32)]
    corpus = spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["fmt"]) for r in rows],
        "image_id string, bytes binary, fmt string",
    )
    tiles = (
        compute_tile_phash(corpus)
        .filter(F.col("tile_ok"))
        .select(
            "image_id",
            F.posexplode("tile_phashes").alias("tile_id", "tile_phash64"),
        )
        .select(
            F.concat_ws("#", "image_id", "tile_id").alias("tile_key"),
            "tile_phash64",
        )
    )
    root = str(tmp_path / "tileidx")
    build_hamming_dedup_index(
        tiles, root, spark,
        id_col="tile_key", sig_col="tile_phash64", max_distance=6,
    )
    # pick a jpeg-re-encodable source whose lossy crop stays in the ball
    planted = []
    crops = []
    for i in (20, 25):
        r = rows[i]
        px = decode_image(r["bytes"], r["fmt"])
        h, w = px.shape[:2]
        tile = px[0 : h // 2, 0 : w // 2]
        from pic2vec_spark.ops.multimodal import tile_phash64s as tps

        jb = encode_image(tile, "jpeg")
        d = bin(
            tps(px)[0] ^ phash64(decode_image(jb, "jpeg"))
        ).count("1")
        if d <= 6:
            crops.append((f"c{i}", jb, "jpeg"))
            planted.append((f"c{i}", r["image_id"] + "#0"))
    assert planted, "fixture regression: no in-ball lossy crop"
    ph = (
        compute_phash(
            spark.createDataFrame(
                crops, "crop_id string, bytes binary, fmt string"
            )
        )
        .filter(F.col("phash64_ok"))
        .select("crop_id", "phash64")
    )
    pairs = probe_hamming_dedup_index(
        root, spark, ph, id_col="crop_id", sig_col="phash64"
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    got |= {(b, a) for a, b in got}
    for cid, tkey in planted:
        assert (cid, tkey) in got, (cid, tkey)
