"""Multimodal binary-column operators.

Images are fully real (our pure-NumPy codecs); audio/video decode has no
library in this container, so the decode kernels are STUBS — a clearly
marked deterministic fake (or NotImplementedError for strict mode) —
while the Spark-side plumbing (schema, Arrow batching, mapInPandas
signatures, partitioning) is real and tested, per the build brief.

All operators follow the same shape as the featurize pipeline: binary
in, typed columns out, vectorized over Arrow batches, no per-row Python
at the Spark level.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from pic2vec_spark.codecs import decode_image, encode_png
from pic2vec_spark.preprocess import resize_nearest


def image_thumbnail(
    df: DataFrame, size: tuple[int, int] = (32, 32), bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Decode -> nearest resize -> re-encode PNG; failures yield null
    thumb + ok=False (the missing semantics of the featurize path)."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("thumb", T.BinaryType(), True),
            T.StructField("thumb_ok", T.BooleanType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs, oks = [], []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    img = decode_image(data, fmt)
                    thumbs.append(encode_png(resize_nearest(img, size)))
                    oks.append(True)
                except Exception:
                    thumbs.append(None)
                    oks.append(False)
            out = pdf.copy()
            out["thumb"] = thumbs
            out["thumb_ok"] = oks
            yield out

    return df.mapInPandas(run, schema=schema)


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n x n)."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def phash64(img: np.ndarray, hash_size: int = 8, highfreq_factor: int = 4) -> int:
    """Classic DCT perceptual hash of an (H, W, 3) uint8 image:
    grayscale -> resize to (hash_size*factor)^2 -> 2-D DCT -> keep the
    top-left hash_size^2 low-frequency block -> bit i = coef_i > median.
    Returned as a SIGNED 64-bit int (Spark LongType two's complement).
    Deterministic pure NumPy; robust to brightness/noise perturbations,
    so near-duplicate images land within a few Hamming bits."""
    from pic2vec_spark.preprocess import to_grayscale

    n = hash_size * highfreq_factor
    g = to_grayscale(resize_nearest(img, (n, n)))[..., 0].astype(np.float64)
    d = _dct_matrix(n)
    low = (d @ g @ d.T)[:hash_size, :hash_size].ravel()
    med = np.median(low)
    v = 0
    for i, b in enumerate(low > med):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= 1 << 63 else v


def compute_phash(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    hash_size: int = 8,
    highfreq_factor: int = 4,
    out_col: str = "phash64",
) -> DataFrame:
    """Attach a computed DCT perceptual hash (``{out_col}: long``,
    ``{out_col}_ok: boolean``) to every row — the content-derived
    counterpart of the input table's ``phash`` column.  Narrow map, no
    shuffle; near-dup image pairs come from
    ``ops.dedup.hamming_neardup_pairs(..., sig_col=out_col, bits=64)``."""
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.LongType(), False),
            T.StructField(f"{out_col}_ok", T.BooleanType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, oks = [], []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                try:
                    img = decode_image(data, fmt)
                    hashes.append(phash64(img, hash_size, highfreq_factor))
                    oks.append(True)
                except Exception:
                    hashes.append(0)
                    oks.append(False)
            out = pdf.copy()
            out[out_col] = pd.array(hashes, dtype="int64")
            out[f"{out_col}_ok"] = oks
            yield out

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------- stubs

STUB_NOTE = (
    "audio/video decode STUB: no codec library in this container; "
    "deterministic fake derived from the byte content so the Spark "
    "plumbing (schema/batching/partitioning) is real and testable"
)


def _fake_signal(data: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decode: seeded by the byte content."""
    seed = np.frombuffer(
        (data or b"\x00")[:8].ljust(8, b"\x00"), dtype=np.uint64
    )[0]
    rng = np.random.default_rng(int(seed))
    return rng.normal(size=n).astype(np.float32)


def video_frame_sample(
    df: DataFrame,
    every_n: int = 10,
    n_frames: int = 4,
    frame_size: tuple[int, int] = (16, 16),
    bytes_col: str = "bytes",
    strict: bool = False,
) -> DataFrame:
    """Sample every_n-th frame as a small tensor per row.

    Real pipeline shape (binary -> array<array<float>> frame features);
    the frame decode itself is a STUB (see STUB_NOTE). ``strict=True``
    raises NotImplementedError instead of faking."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("frames", T.ArrayType(T.ArrayType(T.FloatType())), True)]
    )
    h, w = frame_size

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(STUB_NOTE)
        for pdf in batches:
            frames = []
            for data in pdf[bytes_col]:
                sig = _fake_signal(data, n_frames * h * w)
                frames.append(
                    [f.tolist() for f in sig.reshape(n_frames, h * w)]
                )
            out = pdf.copy()
            out["frames"] = frames
            yield out

    return df.mapInPandas(run, schema=schema)


def audio_features(
    df: DataFrame,
    n_mel: int = 16,
    bytes_col: str = "bytes",
    strict: bool = False,
) -> DataFrame:
    """Per-row audio feature vector (mel-energy shaped). Decode is a
    STUB (see STUB_NOTE); the windowed-energy math runs on the fake
    signal so the UDF batch shape is the real one."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("mel", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(STUB_NOTE)
        for pdf in batches:
            mels = []
            for data in pdf[bytes_col]:
                sig = _fake_signal(data, 1024)
                bands = sig.reshape(n_mel, -1)
                mels.append(np.log1p((bands**2).mean(axis=1)).astype(np.float32).tolist())
            out = pdf.copy()
            out["mel"] = mels
            yield out

    return df.mapInPandas(run, schema=schema)
