"""Structured Streaming surface over the same event analytics.

The reference is "streaming" only in the bounded-iterator sense (SURVEY
§2.9); this module is the genuine unbounded path: the same logical queries
as queries/events.py expressed over ``readStream`` with event-time
watermarks, so batch and stream results agree on closed windows.

Patterns covered:
- tumbling-window aggregation + watermark (late data dropped after 1h)
- sliding windows
- streaming dedup (dropDuplicates on id within the watermark)
- file-source ingestion with trigger=availableNow for deterministic tests
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.functions.rounding import fround
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-based event stream (each new file = a micro-batch). In production
    the same pipeline reads Kafka; only this reader changes."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )


def tumbling_counts(stream: DataFrame, window: str = "15 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of queries/events.ev_tumbling_15min."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # the davg pattern (decimal sum -> double -> fround): native
            # ROUND on a double avg is the one remaining engine- and
            # order-sensitive op class; keep the streaming leg on the same
            # IEEE-only rule as its batch twin (queries/events.py davg)
            fround(
                F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "avg_value")
    )


def sliding_user_activity(stream: DataFrame) -> DataFrame:
    """30-min windows sliding every 10 min, per user."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "user_id", "n_events")
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event ids within the watermark horizon — the streaming
    form of exact dedup (state pruned by event time)."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def run_to_memory_sink(df: DataFrame, name: str) -> None:
    """Drain all available input into an in-memory table (deterministic for
    tests: trigger=availableNow processes everything then stops)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming and _has_agg(df) else "append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow terminates when all input is drained; generous timeout so
    # CPU contention can't surface partial results to callers
    q.awaitTermination(300)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"streaming query {name} did not drain in time")


def _has_agg(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return "Aggregate" in plan
