"""SparkSession factory tuned for this engine.

Local test profile runs on ``local[N]``; the same configs are what we'd set
cluster-side at 100 TB: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), broadcast threshold generous because all dictionary
tables (mapping rules, person map at reasonable cardinality) are tiny
relative to fact tables, and Arrow enabled for the pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "carrot-transform-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # per-DataFrame-API-call stack inspection + a JVM round trip, only
        # used to enrich error messages with user call sites; measured ~45%
        # of driver-side plan-construction time on expression-heavy plans
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # engine-wide temporal contract: parquet timestamp[us] without UTC
        # adjustment reads as session-tz TIMESTAMP (not TIMESTAMP_NTZ), so
        # loaders need no cast projection over the scan
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
