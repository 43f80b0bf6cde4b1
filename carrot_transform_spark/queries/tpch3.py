"""Third TPC-H batch — q11 / q20 / q21 shapes, completing the 22-query set.

The synthetic schema has no partsupp table, so (like q2 in tpch2.py) these
keep the QUERY SHAPE — scalar-subquery threshold (q11), nested semi-join
with aggregate HAVING (q20), correlated EXISTS / NOT EXISTS (q21) — with
supplier-part facts derived from lineitem.

All threshold comparisons are exact DECIMAL arithmetic (scaled multiply,
never divide), so the filter cannot flip between engines at a float
boundary; only the final displayed values are rounded doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import load, maybe_broadcast, register

_DEC = "decimal(27,6)"


@register(
    "q11_important_stock",
    oracle="""
    WITH pv AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6))) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_5'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(value, 2) AS DOUBLE) AS stock_value
    FROM pv
    WHERE value * (SELECT CAST(COUNT(*) AS DECIMAL(10,0)) FROM pv)
          > 3 * (SELECT SUM(value) FROM pv)
    ORDER BY stock_value DESC, p_partkey
    """,
    tags=("tpch", "subquery-threshold"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape: per-part value with a scalar-subquery threshold. TPC-H's
    own FRACTION/SF constant can't be both selective and non-empty across
    scale factors on this synthetic data, so the threshold is scale-free:
    parts worth more than 3x the average part value (value*count > 3*total,
    exact decimal — DECIMAL(27,6)*DECIMAL(10,0) stays inside DECIMAL(38,6)
    in both engines, so the compare can't flip at a float boundary). The
    scalar aggregates are a 1-row broadcast cross join."""
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    pv = (
        l.join(maybe_broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias("value")
        )
    )
    total = pv.agg(
        F.sum("value").alias("total"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n_parts"),
    )
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") * F.col("n_parts") > F.col("total") * 3)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value", 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), F.asc("p_partkey"))
    )


@register(
    "q20_excess_shippers",
    oracle="""
    WITH sq AS (
        SELECT l.l_suppkey, l.l_partkey,
               SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                        THEN CAST(l.l_quantity AS DECIMAL(27,6))
                        ELSE CAST(0 AS DECIMAL(27,6)) END) AS qty97,
               SUM(CAST(l.l_quantity AS DECIMAL(27,6))) AS qty_all
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE 'red%'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM sq
                          WHERE qty97 * 3 > qty_all AND qty_all >= 100)
    ORDER BY s.s_suppkey
    """,
    tags=("tpch", "nested-semi-join"),
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape: suppliers with a meaningful-volume tracked part (qty>=100
    all-time) shipping over a third of that volume in 1997 alone — aggregate
    subquery feeding a semi-join. Exact decimal compares. The name pattern
    matches this dataset's real part names ('red widget', ...); thresholds
    chosen so the predicate is selective but non-empty at sf0.01 AND sf0.1
    (5 and 2 suppliers), so the parity hash actually exercises the shape."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    in97 = (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    sq = (
        l.join(maybe_broadcast(p), p.p_partkey == l.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in97, F.col("l_quantity").cast(_DEC)).otherwise(F.lit(0).cast(_DEC))).alias("qty97"),
            F.sum(F.col("l_quantity").cast(_DEC)).alias("qty_all"),
        )
    )
    qualifying = sq.filter(
        (F.col("qty97") * 3 > F.col("qty_all")) & (F.col("qty_all") >= 100)
    ).select("l_suppkey")
    return (
        s.join(maybe_broadcast(qualifying), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey AND n.n_name = 'NATION_3'
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("tpch", "exists", "anti-join"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape: the supplier uniquely last to ship in a multi-supplier
    finished order (EXISTS another supplier's line; NOT EXISTS a later line
    from another supplier). shipdate stands in for the reference's
    commit/receipt pair absent from this schema. Semi + anti join on the
    order key; supplier and nation dims broadcast."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    l1 = l.select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_suppkey").alias("sk1"),
        F.col("l_shipdate").alias("sd1"),
    )
    l2 = l.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2"))
    l3 = l.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    base = (
        l1.join(o, o.o_orderkey == F.col("k1"))
        .join(maybe_broadcast(s), s.s_suppkey == F.col("sk1"))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .select("k1", "sk1", "sd1", "s_name")
    )
    waiting = (
        base.join(l2, (F.col("k2") == F.col("k1")) & (F.col("sk2") != F.col("sk1")), "left_semi")
        .join(
            l3,
            (F.col("k3") == F.col("k1"))
            & (F.col("sk3") != F.col("sk1"))
            & (F.col("sd3") > F.col("sd1")),
            "left_anti",
        )
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )
