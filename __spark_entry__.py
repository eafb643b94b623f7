"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship point-in-time image-featurization
query at sf0.001; ``queries()``/``oracle_sql()`` expose each implemented
operator (SURVEY.md §2 + north-rule point-in-time layer) for the DuckDB
correctness gate at sf0.01.

Determinism notes shared by Spark and the DuckDB oracle:
- every window orders by (ts, event_id) — event_id is the tiebreak, so
  results are order-insensitive deterministic;
- timestamps are exported as epoch microseconds (``unix_micros`` /
  ``epoch_us``) to avoid timezone-rendering hash mismatches;
- aggregated doubles are rounded to 4 decimals on both sides (double
  summation order differs between engines).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

def _us(col: str):
    """Epoch µs (casts TIMESTAMP_NTZ; session TZ pinned UTC)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


SESSION_GAP_S = 1800
TUMBLE_S = 3600
TOP_K = 3


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --------------------------------------------------------------------------
# point-in-time / windowed layer over events (user_id ≙ entity, value ≙ feature)
# --------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each 'purchase' event sees the latest prior (ts, then
    feature-first, then event_id tiebreak) non-purchase event's value."""
    from pic2vec_spark.ops.asof import asof_join

    ev = _events(spark, sf_dir)
    features = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("entity_id"), "ts", "event_id", "value"
    )
    queries = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), "ts", "event_id"
    )
    joined = asof_join(
        queries,
        features,
        on="entity_id",
        ts="ts",
        value_cols=["value"],
        tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id"),
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        F.col("value_asof"),
        _us("ts_asof").alias("feature_ts_us"),
    )


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 1-hour tolerance: matches older than 3600s are nulled."""
    from pic2vec_spark.ops.asof import asof_join

    ev = _events(spark, sf_dir)
    features = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("entity_id"), "ts", "event_id", "value"
    )
    queries = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("entity_id"), "ts", "event_id"
    )
    joined = asof_join(
        queries, features, on="entity_id", ts="ts",
        value_cols=["value"], tiebreak="event_id", tolerance_s=3600,
    )
    return joined.select(
        F.col("event_id"),
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        F.col("value_asof"),
        _us("ts_asof").alias("feature_ts_us"),
    )


def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pic2vec_spark.ops.windows import lag_lead

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("user_id").alias("entity_id"), "ts", "value"
    )
    out = lag_lead(ev, "value", k=1, tiebreak="event_id")
    return out.select(
        "event_id",
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        "value",
        F.col("value_lag_1").alias("value_lag"),
        F.col("value_lead_1").alias("value_lead"),
    )


def q_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null out value except on purchases, forward-fill per user."""
    from pic2vec_spark.ops.windows import forward_fill

    ev = _events(spark, sf_dir).select(
        "event_id",
        F.col("user_id").alias("entity_id"),
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    out = forward_fill(ev, ["pval"], tiebreak="event_id")
    return out.select(
        "event_id",
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        F.col("pval_ffill").alias("value_ffill"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pic2vec_spark.ops.windows import sessionize

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("user_id").alias("entity_id"), "ts"
    )
    out = sessionize(ev, gap_s=SESSION_GAP_S, tiebreak="event_id")
    return out.select(
        "event_id",
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        "session_id",
    )


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session aggregates on top of sessionize (count, span, avg value)."""
    from pic2vec_spark.ops.windows import sessionize

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("user_id").alias("entity_id"), "ts", "value"
    )
    out = sessionize(ev, gap_s=SESSION_GAP_S, tiebreak="event_id")
    return (
        out.groupBy("entity_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_micros(F.min("ts").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.max("ts").cast("timestamp")).alias("end_us"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.col("entity_id").alias("user_id"),
            "session_id",
            "n_events",
            "start_us",
            "end_us",
            "avg_value",
        )
    )


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pic2vec_spark.ops.windows import tumbling_agg

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("entity_id"), "ts", "value"
    )
    out = tumbling_agg(
        ev,
        window_s=TUMBLE_S,
        aggs={"n_events": ("count", "*"), "sum_value": ("sum", "value")},
    )
    return out.select(
        F.col("entity_id").alias("user_id"),
        "window_start_us",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


def q_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pic2vec_spark.ops.windows import topk_per_entity

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("user_id").alias("entity_id"), "value"
    )
    out = topk_per_entity(ev, "value", TOP_K, tiebreak="event_id")
    return out.select(
        "event_id", F.col("entity_id").alias("user_id"), "value", "rk"
    )


# --------------------------------------------------------------------------
# flagship: CNN featurize + point-in-time as-of join
# --------------------------------------------------------------------------

N_FLAGSHIP_IMAGES = 256


def _timeline_from_events(spark: SparkSession, sf_dir: str, n_images: int) -> DataFrame:
    """events → entity timeline: non-purchase events observe an image
    (deterministic FK event_id % n_images); purchases are as-of queries."""
    ev = _events(spark, sf_dir)
    img_id = F.concat(
        F.lit("img_"),
        F.lpad((F.col("event_id") % n_images).cast("string"), 9, "0"),
    )
    return ev.select(
        F.col("user_id").alias("entity_id"),
        "ts",
        F.when(F.col("event_type") != "purchase", img_id).alias("image_id"),
        F.when(F.col("event_type") == "purchase", F.lit("query"))
        .otherwise(F.lit("feature"))
        .alias("kind"),
        F.col("event_id").alias("row_id"),
    )


def q_pit_featurize_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: synth images → dedup → NumPy-SqueezeNet featurize →
    join to event timeline → as-of join (zero temporal leakage).
    Not SQL-expressible (CNN) → driver records a rows-only check;
    numeric correctness is pinned by tests/test_featurize.py +
    tests/test_pipeline.py against the single-machine NumPy oracle."""
    from pic2vec_spark.pipeline import point_in_time_features
    from pic2vec_spark.plan import FeaturizerPlan
    from pic2vec_spark.synth import synth_images_df

    images = synth_images_df(spark, N_FLAGSHIP_IMAGES, seed=42)
    timeline = _timeline_from_events(spark, sf_dir, N_FLAGSHIP_IMAGES)
    plan = FeaturizerPlan.build("squeezenet", depth=1, autosample=True)
    out = point_in_time_features(images, timeline, plan)
    return out.select(
        F.col("row_id").alias("event_id"),
        F.col("entity_id").alias("user_id"),
        _us("ts").alias("ts_us"),
        F.col("image_id_asof"),
        F.col("missing_asof"),
        F.col("features_asof"),
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pit_featurize_asof(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "asof_join": q_asof_join,
        "asof_tolerance": q_asof_tolerance,
        "lag_lead": q_lag_lead,
        "forward_fill": q_forward_fill,
        "sessionize": q_sessionize,
        "session_stats": q_session_stats,
        "tumbling_hourly": q_tumbling_hourly,
        "topk_per_user": q_topk_per_user,
        "pit_featurize_asof": q_pit_featurize_asof,
    }


_ASOF_ORACLE = """
WITH f AS (
  SELECT user_id, ts, event_id, value, 0 AS side
  FROM events WHERE event_type <> 'purchase'
), q AS (
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS value, 1 AS side
  FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT * FROM f UNION ALL SELECT * FROM q
), m AS (
  SELECT u.*,
    last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER w AS value_asof,
    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER w AS fts
  FROM u
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, side, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, {val} AS value_asof,
       {fts} AS feature_ts_us
FROM m WHERE side = 1
"""


def oracle_sql() -> dict[str, str]:
    return {
        "asof_join": _ASOF_ORACLE.format(val="value_asof", fts="epoch_us(fts)"),
        "asof_tolerance": _ASOF_ORACLE.format(
            val="CASE WHEN fts IS NOT NULL AND epoch_us(ts) - epoch_us(fts) <= 3600000000 THEN value_asof END",
            fts="CASE WHEN fts IS NOT NULL AND epoch_us(ts) - epoch_us(fts) <= 3600000000 THEN epoch_us(fts) END",
        ),
        "lag_lead": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
                   lag(value)  OVER w AS value_lag,
                   lead(value) OVER w AS value_lead
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "forward_fill": """
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
            FROM events
        """,
        "sessionize": f"""
            WITH x AS (
              SELECT event_id, user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_S * 1_000_000}
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                   CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
            FROM x
        """,
        "session_stats": f"""
            WITH x AS (
              SELECT event_id, user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {SESSION_GAP_S * 1_000_000}
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_id
              FROM x
            )
            SELECT user_id, session_id,
                   COUNT(*) AS n_events,
                   epoch_us(MIN(ts)) AS start_us,
                   epoch_us(MAX(ts)) AS end_us,
                   ROUND(AVG(value), 4) AS avg_value
            FROM s GROUP BY user_id, session_id
        """,
        "tumbling_hourly": """
            SELECT user_id,
                   epoch_us(date_trunc('hour', ts)) AS window_start_us,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "topk_per_user": f"""
            WITH r AS (
              SELECT event_id, user_id, value,
                     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rk
              FROM events
            )
            SELECT event_id, user_id, value, rk FROM r WHERE rk <= {TOP_K}
        """,
    }
