"""Pure-NumPy CNN kernels (conv2d / relu / maxpool / global-avg-pool).

These run *inside* Arrow-batched pandas UDF workers — the cluster never
sees a pixel tensor; Spark ships (image_id, bytes) in and gets
(image_id, feature array) out.  All kernels are vectorized over the
batch axis (im2col + GEMM for convolutions → BLAS), replacing the
reference's TensorFlow kernels invoked at
/root/reference/pic2vec/data_featurizing.py:51.

Layout: NHWC activations (float32), HWIO weights — the same layout the
reference's tf_dim_ordering weights use.
"""

from __future__ import annotations

import numpy as np

# Per-worker buffer pool for conv2d's im2col scratch.  Without it every
# conv call mmaps + zero-fills a fresh multi-MB buffer (large numpy
# allocations bypass the small-object allocator), and under 32
# concurrent workers the kernel page-fault path becomes a shared
# bottleneck.  Only the col scratch is pooled — it is dead after the
# GEMM, so reuse is race-free within a worker.
_COL_POOL: dict[tuple, np.ndarray] = {}


def _col_buffer(shape: tuple[int, ...]) -> np.ndarray:
    buf = _COL_POOL.get(shape)
    if buf is None:
        buf = np.empty(shape, dtype=np.float32)
        _COL_POOL[shape] = buf
    return buf


def conv2d(
    x: np.ndarray,
    w: np.ndarray,
    b: np.ndarray | None = None,
    stride: int = 1,
    padding: str = "valid",
) -> np.ndarray:
    """2-D convolution, NHWC x HWIO -> NHWC, via im2col + GEMM."""
    kh, kw, cin, cout = w.shape
    assert x.shape[-1] == cin, (x.shape, w.shape)
    if padding == "same":
        oh = -(-x.shape[1] // stride)
        ow = -(-x.shape[2] // stride)
        ph = max((oh - 1) * stride + kh - x.shape[1], 0)
        pw = max((ow - 1) * stride + kw - x.shape[2], 0)
        x = np.pad(
            x,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
        )
    elif padding != "valid":
        raise ValueError(padding)

    if kh == kw == 1 and stride == 1:
        out = x @ w.reshape(cin, cout)
    else:
        # im2col via kh*kw big slice-copies (each a fast contiguous-inner
        # copy), then one GEMM — ~10x faster than gathering a 6-D
        # sliding_window_view.
        n, hh, ww = x.shape[:3]
        oh = (hh - kh) // stride + 1
        ow = (ww - kw) // stride + 1
        x = np.ascontiguousarray(x, dtype=np.float32)
        col = _col_buffer((n, oh, ow, kh, kw * cin))
        item = x.itemsize
        for i in range(kh):
            # kernel row i: every output window's (kw, cin) patch is a
            # CONTIGUOUS kw*cin-float run in the source row — one strided
            # view + one copy per kernel row (inner runs of kw*cin, not
            # cin), for any stride.
            yi = x[:, i : i + (oh - 1) * stride + 1 : stride, :, :]
            sw = np.lib.stride_tricks.as_strided(
                yi,
                shape=(n, oh, ow, kw * cin),
                strides=(
                    yi.strides[0],
                    yi.strides[1],
                    stride * cin * item,
                    item,
                ),
            )
            col[:, :, :, i, :] = sw
        out = (
            col.reshape(n * oh * ow, kh * kw * cin) @ w.reshape(kh * kw * cin, cout)
        ).reshape(n, oh, ow, cout)
    if b is not None:
        out = np.add(out, b, out=out)  # in-place: no extra alloc/copy
    return out.astype(np.float32, copy=False)


def depthwise_conv2d(
    x: np.ndarray, w: np.ndarray, stride: int = 1, padding: str = "same"
) -> np.ndarray:
    """Depthwise conv (depth multiplier 1), NHWC x (kh, kw, C, 1) ->
    NHWC: kh*kw shifted multiply-accumulates, each a vectorized
    broadcast over the channel axis (no im2col needed — the per-channel
    kernel is a scalar per tap)."""
    kh, kw, cin, _ = w.shape
    assert x.shape[-1] == cin
    if padding == "same":
        oh = -(-x.shape[1] // stride)
        ow = -(-x.shape[2] // stride)
        ph = max((oh - 1) * stride + kh - x.shape[1], 0)
        pw = max((ow - 1) * stride + kw - x.shape[2], 0)
        x = np.pad(
            x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        )
    elif padding != "valid":
        raise ValueError(padding)
    n, hh, ww = x.shape[:3]
    oh = (hh - kh) // stride + 1
    ow = (ww - kw) // stride + 1
    out = np.zeros((n, oh, ow, cin), dtype=np.float32)
    for i in range(kh):
        for j in range(kw):
            view = x[:, i : i + oh * stride : stride, j : j + ow * stride : stride, :]
            out += view * w[i, j, :, 0]
    return out


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0, out=x)


def maxpool2d(
    x: np.ndarray, pool: int = 3, stride: int = 2, padding: str = "valid"
) -> np.ndarray:
    """Max pooling (matches Keras MaxPooling2D(pool, stride, padding))
    via pool*pool shifted np.maximum accumulations (no windowed gather).
    'same' pads with -inf so padding never wins a max."""
    if padding == "same":
        oh = -(-x.shape[1] // stride)
        ow = -(-x.shape[2] // stride)
        ph = max((oh - 1) * stride + pool - x.shape[1], 0)
        pw = max((ow - 1) * stride + pool - x.shape[2], 0)
        x = np.pad(
            x,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            constant_values=-np.inf,
        )
    elif padding != "valid":
        raise ValueError(padding)
    n, hh, ww, c = x.shape
    oh = (hh - pool) // stride + 1
    ow = (ww - pool) // stride + 1
    out = None
    for i in range(pool):
        for j in range(pool):
            view = x[:, i : i + oh * stride : stride, j : j + ow * stride : stride, :]
            if out is None:
                out = view.copy()
            else:
                np.maximum(out, view, out=out)
    return out


def avgpool2d_same(x: np.ndarray, pool: int = 3) -> np.ndarray:
    """Stride-1 'same' average pooling that EXCLUDES padding from the
    divisor (TF/Keras AveragePooling2D semantics: edge windows average
    over their valid cells only)."""
    n, hh, ww, c = x.shape
    p = pool // 2
    xp = np.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    ones = np.pad(np.ones((1, hh, ww, 1), np.float32), ((0, 0), (p, p), (p, p), (0, 0)))
    s = np.zeros((n, hh, ww, c), dtype=np.float32)
    cnt = np.zeros((1, hh, ww, 1), dtype=np.float32)
    for i in range(pool):
        for j in range(pool):
            s += xp[:, i : i + hh, j : j + ww, :]
            cnt += ones[:, i : i + hh, j : j + ww, :]
    return s / cnt


def global_avg_pool(x: np.ndarray) -> np.ndarray:
    """(N, H, W, C) -> (N, C) spatial mean (reference appends
    GlobalAvgPool2D when the decapitated output is 4-D,
    build_featurizer.py:351-352)."""
    return x.mean(axis=(1, 2), dtype=np.float32)
