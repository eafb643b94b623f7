"""Deterministic synthetic data generators (seed-stable, no external data).

Generates the BASELINE.json ``input_hint`` table
``(image_id, bytes, w, h, fmt, caption, phash)`` and an entity-timeline
table ``(entity_id, ts, image_id, kind)`` at any scale:

- driver-side pandas for tests (hundreds of rows), and
- distributed via ``spark.range → mapInPandas`` for benchmarks — each
  partition generates its own rows from (seed, row id), so generation
  itself scales out (no driver bottleneck, no shuffle).

Skew/duplicates are built in deliberately (FIXTURES.md §1):
~20% of rows fall into a handful of hot ``phash`` duplicate clusters
(identical bytes — exercising dedup-before-featurize, the reference's
memo at /root/reference/pic2vec/feature_preprocessing.py:448-455);
~5% corrupt/empty bytes and a few ``gif`` rows exercise the
missing→zero-vector path (feature_preprocessing.py:318-323).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pic2vec_spark.codecs import encode_image

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

TIMELINE_SCHEMA = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("row_id", T.LongType(), False),
    ]
)

_WORDS = (
    "spark image feature vector point time join window entity snapshot "
    "caption pixel tensor batch arrow shuffle partition lineage resume"
).split()

N_HOT_CLUSTERS = 8
HOT_FRACTION = 0.2
CORRUPT_FRACTION = 0.03
EMPTY_FRACTION = 0.02
GIF_FRACTION = 0.03
_FMTS = ("png", "bmp", "jpg")
_SIZES = (24, 32, 48, 64, 96, 227)


def _gen_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic gradient + blocky noise (compresses OK as PNG,
    smooth enough for JPEG PSNR ≥ 40 dB at high quality)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(w + h - 2, 1)),
        ],
        axis=-1,
    )
    coarse = rng.integers(0, 64, (-(-h // 8), -(-w // 8), 3))
    noise = np.kron(coarse, np.ones((8, 8, 1)))[:h, :w]
    return np.clip(base * 0.75 + noise, 0, 255).astype(np.uint8)


def synth_image_row(i: int, n: int, seed: int = 42) -> dict:
    """Row ``i`` of the n-row images table — pure function of (seed, i, n)."""
    rng = np.random.default_rng([seed, i])
    image_id = f"img_{i:09d}"
    # hot duplicate clusters: first HOT_FRACTION of the id space maps to
    # one of N_HOT_CLUSTERS shared source images
    in_hot = (i % 100) < int(HOT_FRACTION * 100)
    if in_hot:
        cluster = i % N_HOT_CLUSTERS
        content_rng = np.random.default_rng([seed, 10_000_000 + cluster])
        phash = int(0x5EED0000 + cluster)
    else:
        content_rng = rng
        phash = int(np.random.default_rng([seed, 20_000_000 + i]).integers(0, 2**62))

    w = int(content_rng.choice(_SIZES))
    h = int(content_rng.choice(_SIZES))
    fmt_roll = rng.random()
    if fmt_roll < GIF_FRACTION:
        fmt = "gif"
    else:
        fmt = _FMTS[int(content_rng.integers(0, len(_FMTS)))]

    caption_words = " ".join(
        _WORDS[j] for j in content_rng.integers(0, len(_WORDS), 6)
    )
    caption = f"caption for {image_id}: {caption_words}"

    roll = rng.random()
    if fmt == "gif":
        data: bytes | None = b"GIF89a" + bytes(content_rng.integers(0, 256, 32).astype(np.uint8))
    elif roll < EMPTY_FRACTION:
        data = b""
    elif roll < EMPTY_FRACTION + CORRUPT_FRACTION:
        data = bytes(content_rng.integers(0, 256, 64).astype(np.uint8))
    else:
        data = encode_image(_gen_pixels(content_rng, w, h), fmt)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
    }


def synth_images_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    return pd.DataFrame([synth_image_row(i, n, seed) for i in range(n)])


def synth_images_df(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: spark.range drives per-partition synthesis."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [synth_image_row(int(i), n, seed) for i in pdf["id"]]
            )

    return (
        spark.range(0, n, numPartitions=parts)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


def synth_timeline_pdf(
    n_rows: int,
    n_images: int,
    n_entities: int = 50,
    seed: int = 42,
    query_fraction: float = 0.3,
    null_image_fraction: float = 0.15,
) -> pd.DataFrame:
    """Entity timelines: Zipf-skewed entities, per-entity increasing ts
    with irregular gaps, nullable image FK, kind ∈ {feature, query}."""
    rng = np.random.default_rng([seed, 777])
    ranks = np.arange(1, n_entities + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    entities = rng.choice(n_entities, size=n_rows, p=probs)
    # per-entity increasing timestamps with irregular gaps (some > 30 min)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = (rng.exponential(600.0, n_rows) * 1e6).astype(np.int64) + 1
    order = np.argsort(entities, kind="stable")
    ts = np.empty(n_rows, dtype=np.int64)
    cum: dict[int, int] = {}
    for idx in order:
        e = int(entities[idx])
        cum[e] = cum.get(e, 0) + int(gaps[idx])
        ts[idx] = cum[e]
    kinds = np.where(rng.random(n_rows) < query_fraction, "query", "feature")
    img_idx = rng.integers(0, max(n_images, 1), n_rows)
    has_img = (rng.random(n_rows) >= null_image_fraction) & (kinds == "feature")
    return pd.DataFrame(
        {
            "entity_id": entities.astype(np.int64),
            "ts": base + ts,
            "image_id": [
                f"img_{j:09d}" if keep else None
                for j, keep in zip(img_idx, has_img)
            ],
            "kind": kinds,
            "row_id": np.arange(n_rows, dtype=np.int64),
        }
    )


def synth_timeline_df(
    spark: SparkSession, n_rows: int, n_images: int, **kw
) -> DataFrame:
    return spark.createDataFrame(
        synth_timeline_pdf(n_rows, n_images, **kw), schema=TIMELINE_SCHEMA
    )
