"""TPC-H-style analytics over the synthetic star schema.

These are the headline bench queries: scan-heavy aggregation (q1, q6),
shuffle joins with broadcast dimensions (q3, q5, q9-ish), and a correlated
top-k (q3).

All double-typed sums go through dsum/dsum_sql (per-row cast to exact
DECIMAL, decimal sum, decimal round, cast back to double) so results are
independent of parallel summation order and bit-identical to the DuckDB
oracle.

Scale notes (100 TB posture): lineitem/orders are the fact tables — joins
against customer/supplier/nation/region broadcast (dims are tiny); the
lineitem<->orders join shuffles on orderkey, which AQE re-plans at runtime;
aggregations are partial (map-side combine) before the exchange.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    load,
    maybe_broadcast,
    register,
)


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg", "bench"),
    prepared=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk", "bench"),
    prepared=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(maybe_broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("tpch", "join", "bench"),
    prepared=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale-shaped plan: restrict customer AND supplier to the region's ~5
    # nations FIRST (broadcast of the 5-row nation⋈region frame), so the
    # region selectivity lands before any big join. lineitem then shuffles
    # exactly ONCE (against orders⋈customer, both already date/region
    # reduced) and the region-filtered supplier — 1/5 of the table — rides
    # a size-checked broadcast. The old form joined the full 15M-row
    # customer into the l⋈o stream (a forced broadcast that went
    # superlinear at sf100, or a second full shuffle of the 180M-row
    # intermediate without it).
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    c2 = c.select("c_custkey", "c_nationkey").join(
        F.broadcast(asia), c.c_nationkey == asia.n_nationkey
    )
    s2 = s.select("s_suppkey", "s_nationkey").join(
        F.broadcast(asia.select("n_nationkey")),
        s.s_nationkey == F.col("n_nationkey"),
    ).drop("n_nationkey")
    oc = o.select("o_orderkey", "o_custkey").join(
        maybe_broadcast(c2, size_like=c), o.o_custkey == c2.c_custkey
    )
    return (
        l.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        # size bounded by the orders SCAN: oc is a join output whose
        # stats are meaningless without CBO — left to the planner, it
        # picked LINEITEM as the broadcast build side at sf<=1 (the fact
        # table collected to the driver and hashed; plan audit r15).
        # Hinting the date+region-reduced side keeps the fact table
        # streaming at every scale; above the threshold the hint lapses
        # and the join degrades to the correct big x big shuffle.
        .join(maybe_broadcast(oc, size_like=o), l.l_orderkey == oc.o_orderkey)
        .join(
            # size bounded by the supplier SCAN (the asia join only shrinks
            # it); without the bound the join-output stats block the hint
            # and the 600M-row stream would shuffle a second time
            maybe_broadcast(s2, size_like=s),
            (l.l_suppkey == s2.s_suppkey) & (F.col("c_nationkey") == s2.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
    tags=("tpch", "scan", "bench"),
    prepared=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.09))
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           YEAR(o.o_orderdate) AS o_year,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * 0.5')} AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type = 'PROMO'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "bench"),
    prepared=True,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.5
    )
    return (
        l.join(maybe_broadcast(p), p.p_partkey == l.l_partkey)
        .join(maybe_broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer-join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS o_totalprice,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    """,
    tags=("tpch", "semi-join", "agg"),
    prepared=True,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    # One lineitem aggregation serves BOTH the HAVING filter and the final
    # per-order sum_qty: o_orderkey is unique in orders, so the outer
    # GROUP BY (c_name, ..., o_orderkey, ...) groups are exactly the
    # per-orderkey groups and SUM(l_quantity) per group is the same exact
    # decimal sum the subquery computed.  The naive two-pass form (semi-join
    # then re-join lineitem and re-aggregate) shuffles the 4-per-order fact
    # twice; this shuffles it once and joins only the filtered ~order-count
    # rows — the difference grows linearly with the fact table at 100 TB.
    per_order = l.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("__qty_dec")
    ).filter(F.col("__qty_dec").cast("double") > 150)
    return (
        per_order.join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(maybe_broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round(F.col("__qty_dec"), 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
    )
