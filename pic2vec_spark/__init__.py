"""pic2vec_spark — a from-scratch PySpark-native point-in-time image
feature-engineering engine with the capabilities of datarobot/pic2vec.

Not a port: the reference (/root/reference, pic2vec v0.101.1) is a
single-machine pandas+Keras pipeline; this engine re-expresses the same
semantics (decapitated-CNN featurization, missing-image zero vectors,
splice-average downsampling, CSV-compatible widening) as Spark DataFrame
plans plus vectorized Arrow/pandas UDFs, and adds the point-in-time layer
the reference lacks (as-of join, lag/lead, forward-fill backfill,
gap sessionize, snapshot/lineage/resume).
"""

from pic2vec_spark.plan import FeaturizerPlan, SUPPORTED_MODELS
from pic2vec_spark.facade import ImageFeaturizer
from pic2vec_spark.featurize import (
    decode_images,
    featurize_images,
    featurize_preloaded,
    widen_features,
)

__all__ = [
    "FeaturizerPlan",
    "ImageFeaturizer",
    "SUPPORTED_MODELS",
    "decode_images",
    "featurize_images",
    "featurize_preloaded",
    "widen_features",
]

__version__ = "0.1.0"
