"""Second TPC-H batch: q2-style min-per-group, q7/q8 nation volume shapes,
q10 top returned-revenue customers, q15 top supplier via subquery-max, and
exact percentile statistics."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from carrot_transform_spark.queries import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    fround,
    fround_sql,
    load,
    maybe_broadcast,
    register,
)


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH costs AS (
        SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
        FROM lineitem l WHERE l.l_quantity > 0
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    best AS (
        SELECT l_partkey, l_suppkey, unit_cost,
               ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey) AS rn
        FROM costs
    )
    SELECT p.p_partkey, p.p_name, s.s_name,
           {fround_sql("b.unit_cost")} AS unit_cost
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size >= 40
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.rn = 1
    ORDER BY p_partkey
    """,
    tags=("tpch", "min-per-group"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    s = load(spark, sf_dir, "supplier")
    costs = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = costs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(maybe_broadcast(p), p.p_partkey == best.l_partkey)
        .join(maybe_broadcast(s), s.s_suppkey == best.l_suppkey)
        .select("p_partkey", "p_name", "s_name", fround("unit_cost", 4).alias("unit_cost"))
        .orderBy("p_partkey")
    )


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           YEAR(l.l_shipdate) AS l_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE n1.n_name IN ('NATION_9', 'NATION_10') AND n2.n_name IN ('NATION_9', 'NATION_10')
      AND n1.n_name <> n2.n_name
    GROUP BY cust_nation, supp_nation, l_year
    ORDER BY cust_nation, supp_nation, l_year
    """,
    tags=("tpch", "join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_9", "NATION_10"))
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(maybe_broadcast(c), c.c_custkey == o.o_custkey)
        .join(maybe_broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n1), F.col("nk1") == c.c_nationkey)
        .join(F.broadcast(n2), F.col("nk2") == s.s_nationkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH volumes AS (
        SELECT YEAR(o.o_orderdate) AS o_year,
               CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(27,6)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'EUROPE'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           {fround_sql("CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END) AS DOUBLE) / CAST(SUM(volume) AS DOUBLE)", 4)} AS mkt_share
    FROM volumes GROUP BY o_year ORDER BY o_year
    """,
    tags=("tpch", "join", "share"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    nn = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nn.select(F.col("n_nationkey").alias("nk1"), F.col("n_regionkey").alias("rk1"))
    n2 = nn.select(F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    volumes = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(maybe_broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("nk1") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("rk1"))
        .join(maybe_broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n2), F.col("nk2") == s.s_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast("decimal(27,6)").alias("volume"),
            "supp_nation",
        )
    )
    return (
        volumes.groupBy("o_year")
        .agg(
            fround(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(F.lit(0)))
                .cast("double")
                / F.sum("volume").cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "topk"),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(maybe_broadcast(c), c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "subquery-max"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(maybe_broadcast(s), s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "stat_percentiles",
    oracle=f"""
    SELECT c_mktsegment,
           ROUND(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
           ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
           {davg_sql('c_acctbal')} AS mean_bal
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("stats", "percentile"),
)
def stat_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (interpolated) percentiles — Spark's percentile == DuckDB's
    quantile_cont. Approximate sketches (approx_percentile / HLL) exist as
    the scale path but can't hash-match an oracle, so the gate pins the
    exact forms."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.9)"), 4).alias("p90_bal"),
            davg(F.col("c_acctbal")).alias("mean_bal"),
        )
        .orderBy("c_mktsegment")
    )
