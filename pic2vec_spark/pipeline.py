"""The flagship end-to-end pipeline: point-in-time image features.

For every query row (entity_id, query_ts) of a timeline, attach the
feature vector / caption / missing flag of the *latest* image observed
on that entity's timeline at or before query_ts — the distributed,
keyed, zero-leakage replacement for the reference's positional
``featurize → pd.concat(axis=1)`` flow
(/root/reference/pic2vec/image_featurizer.py:362-482).

Plan shape (and why it scales):

    images ──▶ featurize_images (digest-dedup → CNN UDF → join back)
    timeline(feature rows) ⟕ features     [equi-join on image_id;
                                           AQE broadcasts the feature
                                           side when small]
    asof_join(timeline(query rows), ·)    [one entity-hash shuffle]

The CNN touches each distinct image content exactly once; the as-of
join shuffles only (entity, ts, features) rows — never image bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pic2vec_spark.featurize import featurize_images
from pic2vec_spark.ops.asof import asof_join
from pic2vec_spark.plan import FeaturizerPlan


def point_in_time_features(
    images: DataFrame,
    timeline: DataFrame,
    plan: FeaturizerPlan | None = None,
    tolerance_s: float | None = None,
    metrics=None,
) -> DataFrame:
    """images: (image_id, bytes, fmt, caption, ...);
    timeline: (entity_id, ts, image_id nullable, kind ∈ feature|query,
    row_id tiebreak).  Returns one row per query-kind timeline row with
    ``image_id_asof / caption_asof / missing_asof / features_asof``.
    """
    plan = plan or FeaturizerPlan.build()
    feats = featurize_images(images, plan, metrics=metrics).select(
        "image_id", "caption", "missing", "features"
    )
    # LEFT join: a timeline observation referencing an image_id absent
    # from the images table is still an observation — it gets the
    # engine's unmatched-ref semantics (missing=True + the f(0) zero
    # vector, same as featurize_multi_column), instead of being dropped
    # (which would silently substitute an older image at as-of time).
    from pic2vec_spark.featurize import _zero_features
    from pic2vec_spark.model import model_weights

    zero_vec = _zero_features(
        plan, model_weights(plan.model, plan.weight_seed, plan.depth)
    )
    zero_lit = F.array(*[F.lit(float(v)) for v in zero_vec]).cast("array<float>")
    observations = (
        timeline.filter((F.col("kind") == "feature") & F.col("image_id").isNotNull())
        .select("entity_id", "ts", "row_id", "image_id")
        .join(feats, "image_id", "left")
        .withColumn("missing", F.coalesce(F.col("missing"), F.lit(True)))
        .withColumn("features", F.coalesce(F.col("features"), zero_lit))
    )
    queries = timeline.filter(F.col("kind") == "query").select(
        "entity_id", "ts", "row_id"
    )
    return asof_join(
        queries,
        observations,
        on="entity_id",
        ts="ts",
        value_cols=["image_id", "caption", "missing", "features"],
        tiebreak="row_id",
        tolerance_s=tolerance_s,
    )
