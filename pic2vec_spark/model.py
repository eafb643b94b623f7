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


# ------------------------------------------------------------ vgg16/19
# Graphs per the reference's keras.applications VGG16/VGG19 (M10 in
# SURVEY §2.3): 5 conv blocks (3x3 same + relu, 2x2/s2 maxpool) ->
# flatten -> fc1 -> fc2 -> predictions.  Depth maps
# (build_featurizer.py:46-53): vgg16 {1:1, 2:2, 3:4, 4:8}, vgg19
# {1:1, 2:2, 3:4, 4:9} layers popped; decapitation keeps
# layers[-(n+1)].output (build_featurizer.py:147), which for BOTH nets
# lands on: d1 -> fc2 (4096), d2 -> fc1 (4096), d3 -> block5_pool
# (GAP 512), d4 -> block4_pool (GAP 512) — matching the reference's
# output-size matrix.  (vgg19's extra conv per block in blocks 3-5 is
# why its d4 pops 9: block5 holds 4 convs instead of 3.)

def _vgg_convs(n_layers: int) -> list[tuple[str, int, int, bool]]:
    per_block = {16: (2, 2, 3, 3, 3), 19: (2, 2, 4, 4, 4)}[n_layers]
    widths = (64, 128, 256, 512, 512)
    convs = []
    cin = 3
    for b, (n, cout) in enumerate(zip(per_block, widths), start=1):
        for c in range(1, n + 1):
            convs.append((f"block{b}_conv{c}", cin, cout, c == n))
            cin = cout
    return convs


def _vgg_n_convs(n_layers: int, depth: int) -> int:
    convs = _vgg_convs(n_layers)
    if depth <= 3:
        return len(convs)
    # depth 4 output = block4_pool: run everything through block 4
    return sum(1 for name, *_ in convs if not name.startswith("block5"))


def _vgg_weights(n_layers: int, seed: int, depth: int, base: int) -> dict[str, np.ndarray]:
    """Deterministic He-normal weights; only the layers the given depth
    executes are generated (the fc blocks alone are ~520 MB — skipping
    them for depth 3/4 matters per worker).  ``base`` separates the
    vgg16 and vgg19 RNG streams."""
    weights: dict[str, np.ndarray] = {}
    convs = _vgg_convs(n_layers)
    for i, (name, cin, cout, _) in enumerate(convs[: _vgg_n_convs(n_layers, depth)]):
        rng = np.random.default_rng([seed, base + i])
        std = np.sqrt(2.0 / (9 * cin))
        weights[f"{name}/kernel"] = rng.normal(0.0, std, (3, 3, cin, cout)).astype(
            np.float32
        )
        weights[f"{name}/bias"] = np.zeros(cout, dtype=np.float32)
    if depth <= 2:
        rng = np.random.default_rng([seed, base + 100])
        weights["fc1/kernel"] = rng.normal(
            0.0, np.sqrt(2.0 / 25088), (25088, 4096)
        ).astype(np.float32)
        weights["fc1/bias"] = np.zeros(4096, dtype=np.float32)
    if depth <= 1:
        rng = np.random.default_rng([seed, base + 101])
        weights["fc2/kernel"] = rng.normal(
            0.0, np.sqrt(2.0 / 4096), (4096, 4096)
        ).astype(np.float32)
        weights["fc2/bias"] = np.zeros(4096, dtype=np.float32)
    return weights


def _vgg_features(
    n_layers: int, x: np.ndarray, weights: dict[str, np.ndarray], depth: int
) -> np.ndarray:
    """Decapitated VGG forward: (N, 224, 224, 3) preprocessed float32
    -> (N, width) per the depth map in the section comment.  Every
    executed conv block keeps its trailing maxpool (both depth-3 and
    depth-4 outputs are pool layers in the reference)."""
    if depth not in (1, 2, 3, 4):
        raise ValueError("depth must be in 1..4")
    x = x.astype(np.float32, copy=False)
    convs = _vgg_convs(n_layers)
    for name, _, _, pool_after in convs[: _vgg_n_convs(n_layers, depth)]:
        x = relu(
            conv2d(x, weights[f"{name}/kernel"], weights[f"{name}/bias"], padding="same")
        )
        if pool_after:
            x = maxpool2d(x, pool=2, stride=2)
    if depth >= 3:
        return global_avg_pool(x)
    flat = x.reshape(x.shape[0], -1)  # (N, 7*7*512) channels-last order
    flat = relu(flat @ weights["fc1/kernel"] + weights["fc1/bias"])
    if depth == 2:
        return flat.astype(np.float32)
    flat = relu(flat @ weights["fc2/kernel"] + weights["fc2/bias"])
    return flat.astype(np.float32)


def vgg16_weights(seed: int = 0, depth: int = 1) -> dict[str, np.ndarray]:
    return _vgg_weights(16, seed, depth, base=100)


def vgg16_features(
    x: np.ndarray, weights: dict[str, np.ndarray], depth: int = 1
) -> np.ndarray:
    return _vgg_features(16, x, weights, depth)


def vgg19_weights(seed: int = 0, depth: int = 1) -> dict[str, np.ndarray]:
    return _vgg_weights(19, seed, depth, base=300)


def vgg19_features(
    x: np.ndarray, weights: dict[str, np.ndarray], depth: int = 1
) -> np.ndarray:
    return _vgg_features(19, x, weights, depth)


# ------------------------------------------------------------ dispatch

def model_weights(model: str, seed: int = 0, depth: int = 1) -> dict[str, np.ndarray]:
    if model == "squeezenet":
        return squeezenet_weights(seed)
    if model == "vgg16":
        return vgg16_weights(seed, depth)
    if model == "vgg19":
        return vgg19_weights(seed, depth)
    raise NotImplementedError(
        f"{model!r} has no from-scratch NumPy forward pass (the reference "
        "imports it from keras.applications, unavailable here); plan "
        "metadata still validates it"
    )


def model_forward(
    model: str, x: np.ndarray, weights: dict[str, np.ndarray], depth: int = 1
) -> np.ndarray:
    if model == "squeezenet":
        return squeezenet_features(x, weights, depth)
    if model == "vgg16":
        return vgg16_features(x, weights, depth)
    if model == "vgg19":
        return vgg19_features(x, weights, depth)
    raise NotImplementedError(model)


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
