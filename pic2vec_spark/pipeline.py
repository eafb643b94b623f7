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
from pic2vec_spark.ops.asof import asof_join, asof_join_broadcast
from pic2vec_spark.plan import FeaturizerPlan

# auto-switch bound for the broadcast as-of path: rows x (feature vector
# ~1 KB + per-entity numpy overhead) must fit comfortably in the driver
# and every executor — 50k rows ~ 50-100 MB, the same judgement call as
# spark.sql.autoBroadcastJoinThreshold scaled for wide feature payloads
BROADCAST_ASOF_MAX_ROWS = 50_000


def point_in_time_features(
    images: DataFrame,
    timeline: DataFrame,
    plan: FeaturizerPlan | None = None,
    tolerance_s: float | None = None,
    metrics=None,
    asof_strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_ASOF_MAX_ROWS,
) -> DataFrame:
    """images: (image_id, bytes, fmt, caption, ...);
    timeline: (entity_id, ts, image_id nullable, kind ∈ feature|query,
    row_id tiebreak).  Returns one row per query-kind timeline row with
    ``image_id_asof / caption_asof / missing_asof / features_asof``.

    ``asof_strategy``: ``"shuffle"`` = windowed ``asof_join`` (one
    entity exchange of BOTH sides); ``"broadcast"`` = collect+broadcast
    the feature side, zero shuffle of the query side (the scale path
    when features are dimension-sized and queries are the fact side);
    ``"auto"`` counts the timeline's feature rows (a cheap scan — no CNN
    runs) and broadcasts when they fit ``broadcast_max_rows``.
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
    if asof_strategy not in ("auto", "shuffle", "broadcast"):
        raise ValueError(
            f"asof_strategy must be auto|shuffle|broadcast, got {asof_strategy!r}"
        )
    strategy = asof_strategy
    if strategy == "auto":
        # count the timeline's feature rows, NOT `observations`: the
        # former is a cheap parquet scan, the latter would run the CNN
        n_obs = timeline.filter(
            (F.col("kind") == "feature") & F.col("image_id").isNotNull()
        ).count()
        strategy = "broadcast" if n_obs <= broadcast_max_rows else "shuffle"
    join_fn = asof_join_broadcast if strategy == "broadcast" else asof_join
    return join_fn(
        queries,
        observations,
        on="entity_id",
        ts="ts",
        value_cols=["image_id", "caption", "missing", "features"],
        tiebreak="row_id",
        tolerance_s=tolerance_s,
    )
