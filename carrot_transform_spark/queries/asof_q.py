"""As-of join query: each event matched to the customer's most recent order
at or before the event time. Oracle: DuckDB's native ASOF JOIN — our
union-merge implementation (operators/asof.py) must agree exactly.

Event times are mapped into the order-date era (deterministically from
event_id) so events genuinely interleave with orders; orders are pre-deduped
per (customer, date) with max(orderkey) so ties are deterministic in both
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import load, register


@register(
    "ev_asof_last_order",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    ),
    e AS (
        SELECT event_id, user_id,
               TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (event_id % 2400) DAY AS ets
        FROM events
    )
    SELECT e.event_id, e.user_id, e.ets,
           o.o_orderkey AS asof_o_orderkey,
           o.o_orderdate AS asof_o_orderdate
    FROM e ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ets >= o.o_orderdate
    ORDER BY e.event_id
    """,
    tags=("asof", "join", "events"),
)
def ev_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from carrot_transform_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("TIMESTAMP '1995-01-01 00:00:00' + make_interval(0,0,0, CAST(event_id % 2400 AS INT))").alias(
            "ets"
        ),
    )
    orders = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ets",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id", "user_id", "ets", "asof_o_orderkey", "asof_o_orderdate"
    ).orderBy("event_id")
