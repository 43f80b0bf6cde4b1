"""Time-band (range) join query: per-event 30-day order lookback.

Exercises operators/rangejoin.time_band_join — the interval-join operator
the reference lacks (its only joins are person/term lookups,
carrottransform/tools/run.py:275-299). Feature-lookback shape: for every
event, how many orders did that user place in the preceding 30 days?
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import load, register

_DAYS_30 = 30 * 24 * 3600


@register(
    "ev_range_join",
    oracle=f"""
    SELECT e.event_id, e.user_id,
           COUNT(o.o_orderkey) AS n_orders_30d,
           MAX(o.o_orderdate) AS last_order_date
    FROM events e
    LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate >= e.ts - INTERVAL {_DAYS_30} SECONDS
     AND o.o_orderdate <= e.ts
    GROUP BY e.event_id, e.user_id
    ORDER BY e.event_id
    """,
    tags=("events", "range-join", "operator"),
)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day lookback band join (equi-key path: user). At scale both sides
    shuffle once on the user key; the band predicate filters post-join. The
    keyless bucketized path of the same operator is covered in
    tests/test_operator_library.py."""
    from carrot_transform_spark.operators.rangejoin import time_band_join

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    joined = time_band_join(
        e, o, left_ts="ts", right_ts="o_orderdate",
        lower_s=-_DAYS_30, upper_s=0,
        keys=[("user_id", "o_custkey")], how="left",
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(
            F.count("o_orderkey").alias("n_orders_30d"),
            F.max("o_orderdate").alias("last_order_date"),
        )
        .orderBy("event_id")
    )
