"""Event-stream analytics: time bucketing, sessionization, JSON extraction.

Batch expressions of the streaming surface (streaming/ runs the same logic
with readStream + watermarks). All bucketing aligns to epoch so Spark's
``window()`` and DuckDB's ``time_bucket`` agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from carrot_transform_spark.queries import davg, davg_sql, dsum, dsum_sql, load, register


@register(
    "ev_hourly_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY bucket_start, event_type
    ORDER BY bucket_start, event_type
    """,
    tags=("events", "agg", "bench"),
    prepared=True,
)
def ev_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bucket_start", "event_type")
    )


@register(
    "ev_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           event_type
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) > 50
    """,
    tags=("events", "json"),
)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction stays JVM-side
    (get_json_object), no Python UDF."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", k.alias("k_val"), "event_type").filter(F.col("k_val") > 50)


@register(
    "ev_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), s AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
    tags=("events", "window", "session"),
    prepared=True,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min timeout): lag + running sum of
    session-boundary flags. Single shuffle on user_id; both window functions
    share the same partitioning so Spark plans one exchange."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
    ).when(F.lag("ts").over(w).isNull(), 1).otherwise(0)
    sess = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "ev_tumbling_15min",
    oracle=f"""
    SELECT time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00') AS win_start,
           COUNT(*) AS n_events,
           {davg_sql('value')} AS avg_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY win_start
    ORDER BY win_start
    """,
    tags=("events", "window", "streaming-parity"),
)
def ev_tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window — identical semantics to the streaming path
    (streaming/events.py) which adds a watermark; epoch-aligned buckets."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), davg(F.col("value")).alias("avg_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "avg_value")
        .orderBy("win_start")
    )


@register(
    "ev_user_stats",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 2) AS DOUBLE) AS total_value,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           MIN(ts) AS first_seen,
           MAX(ts) AS last_seen
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    tags=("events", "agg"),
)
def ev_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )
