"""SqueezeNet forward pass in NumPy with deterministic seeded weights.

Graph matched to the reference (/root/reference/pic2vec/squeezenet.py:
65-145): conv1 3x3/s2 valid → relu → maxpool 3x3/s2 → fire2,3 →
maxpool → fire4,5 → maxpool → fire6..9 (→ dropout/conv10/GAP/softmax,
never executed here).  Fire module (squeezenet.py:41-60): squeeze 1x1
conv+relu, then channel-concat(expand 1x1 conv+relu, expand 3x3
same-pad conv+relu).

Decapitation (build_featurizer.py:117-151 with the depth map
build_featurizer.py:35 {1:5, 2:12, 3:19, 4:26} layers popped) lands on
the fire-module concat outputs: depth 1 → fire9 (512 ch), 2 → fire8
(512), 3 → fire7 (384), 4 → fire6 (384); the 4-D output then gets
GlobalAvgPool (build_featurizer.py:351-352).  In NumPy, decapitation is
simply truncated execution — the forward pass stops at the mapped fire
module.

Weights: the reference's ImageNet h5 blob is stripped from the checkout
(.MISSING_LARGE_BLOBS) and unfetchable (no network), so weights are
generated deterministically (He-normal, per-layer seeded RNG) — the
single-machine NumPy oracle and the Spark pipeline share exactly these
weights, which is what correctness is anchored to (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np

from pic2vec_spark.nn import conv2d, global_avg_pool, maxpool2d, relu

# (name, kh, kw, cin, cout) in forward order
_FIRE_SPECS = [
    # fire_id, cin, squeeze, expand
    (2, 64, 16, 64),
    (3, 128, 16, 64),
    (4, 128, 32, 128),
    (5, 256, 32, 128),
    (6, 256, 48, 192),
    (7, 384, 48, 192),
    (8, 384, 64, 256),
    (9, 512, 64, 256),
]

# depth -> last fire module executed (see module docstring)
DEPTH_TO_LAST_FIRE = {1: 9, 2: 8, 3: 7, 4: 6}


def _layer_specs() -> list[tuple[str, int, int, int, int]]:
    specs = [("conv1", 3, 3, 3, 64)]
    for fid, cin, sq, ex in _FIRE_SPECS:
        specs.append((f"fire{fid}/squeeze1x1", 1, 1, cin, sq))
        specs.append((f"fire{fid}/expand1x1", 1, 1, sq, ex))
        specs.append((f"fire{fid}/expand3x3", 3, 3, sq, ex))
    return specs


def squeezenet_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """Deterministic He-normal weights, float32, zero biases.

    Per-layer independent RNG streams (seeded by (seed, layer index))
    make the dict reproducible regardless of generation order.
    """
    weights: dict[str, np.ndarray] = {}
    for i, (name, kh, kw, cin, cout) in enumerate(_layer_specs()):
        rng = np.random.default_rng([seed, i])
        std = np.sqrt(2.0 / (kh * kw * cin))
        weights[f"{name}/kernel"] = rng.normal(0.0, std, (kh, kw, cin, cout)).astype(
            np.float32
        )
        weights[f"{name}/bias"] = np.zeros(cout, dtype=np.float32)
    return weights


def _fire(x: np.ndarray, fid: int, w: dict[str, np.ndarray]) -> np.ndarray:
    sq = relu(
        conv2d(x, w[f"fire{fid}/squeeze1x1/kernel"], w[f"fire{fid}/squeeze1x1/bias"])
    )
    left = relu(
        conv2d(sq, w[f"fire{fid}/expand1x1/kernel"], w[f"fire{fid}/expand1x1/bias"])
    )
    right = relu(
        conv2d(
            sq,
            w[f"fire{fid}/expand3x3/kernel"],
            w[f"fire{fid}/expand3x3/bias"],
            padding="same",
        )
    )
    return np.concatenate([left, right], axis=-1)


def squeezenet_features(
    x: np.ndarray, weights: dict[str, np.ndarray], depth: int = 1
) -> np.ndarray:
    """Decapitated forward pass: (N, 227, 227, 3) preprocessed float32
    -> (N, width) post-GAP features (width per DEPTH_TO_LAST_FIRE)."""
    if depth not in DEPTH_TO_LAST_FIRE:
        raise ValueError("depth must be in 1..4")
    last_fire = DEPTH_TO_LAST_FIRE[depth]

    x = x.astype(np.float32, copy=False)
    x = relu(conv2d(x, weights["conv1/kernel"], weights["conv1/bias"], stride=2))
    x = maxpool2d(x)  # pool1
    x = _fire(x, 2, weights)
    x = _fire(x, 3, weights)
    x = maxpool2d(x)  # pool3
    x = _fire(x, 4, weights)
    x = _fire(x, 5, weights)
    x = maxpool2d(x)  # pool5
    for fid in (6, 7, 8, 9):
        x = _fire(x, fid, weights)
        if fid == last_fire:
            break
    return global_avg_pool(x)
