"""FeaturizerPlan — the logical plan of a featurization run.

The reference builds a Keras Model object as its "plan"
(/root/reference/pic2vec/build_featurizer.py:302-379: initialize →
decapitate → GlobalAvgPool → downsample).  Here the plan is pure
metadata resolved on the driver; executors receive it inside the UDF
closure together with broadcast weights and run a NumPy forward pass.

Semantics matched to the reference:

- depth maps (layers popped per model & depth):
  /root/reference/pic2vec/build_featurizer.py:29-66
- pooling-constant validation (integer divisor rule):
  build_featurizer.py:154-195
- autosample rules (size 0 → halve even layer, else error; explicit
  size flips downsample on): build_featurizer.py:261-299
- splice-average downsample (features[:, i::n] slices averaged →
  consecutive blocks of n averaged): build_featurizer.py:198-258,
  hand fixture tests/test_build_featurizer.py:128-149
- output widths per (model, depth):
  tests/test_build_featurizer.py:268-315
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# model -> {"size": input (H, W), "mode": preprocess mode,
#           "widths": decapitated feature width per depth 1..4}
# widths are the post-GlobalAvgPool channel counts of the layer the
# reference's depth map decapitates to (verified against the exhaustive
# output-size matrix in tests/test_build_featurizer.py:268-315).
SUPPORTED_MODELS: dict[str, dict] = {
    "squeezenet": {
        "size": (227, 227),
        "mode": "caffe",
        "widths": {1: 512, 2: 512, 3: 384, 4: 384},
    },
    "vgg16": {
        "size": (224, 224),
        "mode": "caffe",
        "widths": {1: 4096, 2: 4096, 3: 512, 4: 512},
    },
    "vgg19": {
        "size": (224, 224),
        "mode": "caffe",
        "widths": {1: 4096, 2: 4096, 3: 512, 4: 512},
    },
    "resnet50": {
        "size": (224, 224),
        "mode": "caffe",
        "widths": {1: 2048, 2: 2048, 3: 2048, 4: 2048},
    },
    "inceptionv3": {
        "size": (299, 299),
        "mode": "tf",
        "widths": {1: 2048, 2: 2048, 3: 2048, 4: 1280},
    },
    "xception": {
        "size": (299, 299),
        "mode": "tf",
        "widths": {1: 2048, 2: 1024, 3: 728, 4: 728},
    },
}

# ALL SIX reference models have full from-scratch NumPy forward passes
# (pic2vec_spark.model; the reference imports five of them from
# keras.applications, unavailable here, so weights are deterministic
# seeded stand-ins for the stripped ImageNet blobs).
EXECUTABLE_MODELS = (
    "squeezenet", "vgg16", "vgg19", "resnet50", "xception", "inceptionv3"
)

VALID_FORMATS = ("jpg", "jpeg", "png", "bmp")  # mirrors ['JPEG','BMP','PNG']
# at /root/reference/pic2vec/feature_preprocessing.py:118 (gif excluded)


def find_pooling_constant(num_features: int, num_pooled_features: int) -> int:
    """Integer divisor rule (build_featurizer.py:154-195)."""
    if num_pooled_features == 0:
        raise ValueError("Can't downsample to zero features.")
    pooling_constant = num_features / float(num_pooled_features)
    if pooling_constant < 1:
        raise ValueError(
            f"Can't upsample features: tried to downsample from {num_features} "
            f"to {num_pooled_features}."
        )
    if pooling_constant != int(pooling_constant):
        recommended = num_features // int(pooling_constant) if int(pooling_constant) else num_features
        raise ValueError(
            f"Trying to downsample features from {num_features} to "
            f"{num_pooled_features}: not an integer divisor "
            f"(did you mean {recommended}?)."
        )
    return int(pooling_constant)


def check_downsampling_mismatch(
    downsample: bool, num_pooled_features: int, output_layer_size: int
) -> tuple[bool, int]:
    """Autosample rules (build_featurizer.py:261-299)."""
    if num_pooled_features == 0 and downsample:
        if output_layer_size % 2 == 0:
            num_pooled_features = output_layer_size // 2
        else:
            raise ValueError("No automatic downsampling available for this model.")
    elif num_pooled_features != 0 and not downsample:
        downsample = True
    return downsample, num_pooled_features


def splice_average_downsample(x: np.ndarray, num_pooled_features: int) -> np.ndarray:
    """Strided splice + average (build_featurizer.py:198-258).

    The reference splits ``x[:, i::n]`` for i in range(n) (n = pooling
    constant) and averages the slices; element j of slice i is
    ``x[:, i + j*n]``, so the average over slices is the mean of each
    consecutive block of n features — a block-reshape mean.  Verified
    against the hand fixture [1..10] → [1.5, 3.5, 5.5, 7.5, 9.5]
    (tests/test_build_featurizer.py:128-149).
    """
    n = find_pooling_constant(x.shape[-1], num_pooled_features)
    b = x.shape[0]
    return x.reshape(b, num_pooled_features, n).mean(axis=2)


@dataclass(frozen=True)
class FeaturizerPlan:
    """Resolved featurization plan (model, depth, downsample, widths)."""

    model: str = "squeezenet"
    depth: int = 1
    autosample: bool = False
    downsample_size: int = 0
    weight_seed: int = 0
    # resolved fields
    num_pooled_features: int = field(default=0)
    downsample: bool = field(default=False)

    @staticmethod
    def build(
        model: str = "squeezenet",
        depth: int = 1,
        autosample: bool = False,
        downsample_size: int = 0,
        weight_seed: int = 0,
    ) -> "FeaturizerPlan":
        if model not in SUPPORTED_MODELS:
            raise ValueError(
                f"Unsupported model {model!r}; choose from {sorted(SUPPORTED_MODELS)}"
            )
        if depth not in (1, 2, 3, 4):
            raise ValueError("depth must be in 1..4")
        width = SUPPORTED_MODELS[model]["widths"][depth]
        downsample, pooled = check_downsampling_mismatch(
            autosample, downsample_size, width
        )
        if downsample:
            find_pooling_constant(width, pooled)  # validate divisor
        return FeaturizerPlan(
            model=model,
            depth=depth,
            autosample=autosample,
            downsample_size=downsample_size,
            weight_seed=weight_seed,
            num_pooled_features=pooled if downsample else 0,
            downsample=downsample,
        )

    @property
    def raw_width(self) -> int:
        return SUPPORTED_MODELS[self.model]["widths"][self.depth]

    @property
    def num_features(self) -> int:
        return self.num_pooled_features if self.downsample else self.raw_width

    @property
    def target_size(self) -> tuple[int, int]:
        return SUPPORTED_MODELS[self.model]["size"]

    @property
    def preprocess_mode(self) -> str:
        return SUPPORTED_MODELS[self.model]["mode"]

    def finalize(self, features: np.ndarray) -> np.ndarray:
        """Apply the downsample head to raw decapitated+GAP features."""
        if self.downsample:
            return splice_average_downsample(features, self.num_pooled_features)
        return features

    def fingerprint(self) -> str:
        """Identity of the feature SPACE this plan produces.  Persisted
        feature snapshots record it (manifest properties) so incremental
        appends refuse to mix incompatible spaces.  FEATURE_SEMVER bumps
        whenever forward-pass semantics change for the same parameters
        (e.g. the vgg16 depth-4 decapitation fix)."""
        return (
            f"{self.model}/d{self.depth}/seed{self.weight_seed}"
            f"/n{self.num_features}/v{FEATURE_SEMVER}"
        )


# bump when a model's forward math changes for identical plan params —
# makes old persisted feature snapshots visibly incompatible instead of
# silently mixing feature spaces across an engine upgrade
FEATURE_SEMVER = 2
