"""Analytics breadth: window functions, set operations, richer TPC-H shapes.

The reference engine has no user-facing windows/sorts/set-ops (SURVEY §2.6,
§2.9) — Spark supplies them natively; these queries pin down their semantics
against the DuckDB oracle so the engine's full analytic surface is gated,
not just the ETL algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from carrot_transform_spark.queries import (
    dsum,
    dsum_sql,
    fround,
    fround_sql,
    load,
    maybe_broadcast,
    register,
    register_suite,
)

# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------


@register(
    "win_running_order_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING), 2) AS DOUBLE) AS running_total,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    """,
    tags=("window", "running"),
    prepared=True,
)
def win_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(run), 2)
        .cast("double")
        .alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


_GAPS_SQL = """
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
           CAST(DATEDIFF('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS days_since_prev,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank
    FROM orders
    """


def win_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wp = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("bigint")
        .alias("days_since_prev"),
        F.rank().over(wp).alias("price_rank"),
    )


_TOPN_SQL = """
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rnk FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer
    ) WHERE rnk <= 3
    ORDER BY c_mktsegment, rnk
    """


def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rnk")
        .orderBy("c_mktsegment", "rnk")
    )


_NTILE_SQL = """
    SELECT q AS quartile, COUNT(*) AS n,
           ROUND(MIN(c_acctbal), 2) AS min_bal, ROUND(MAX(c_acctbal), 2) AS max_bal
    FROM (SELECT c_acctbal, NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS q FROM customer) t
    GROUP BY quartile ORDER BY quartile
    """


def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("quartile")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


_SETOP_SQL = """
    SELECT 'building_no_urgent' AS bucket, COUNT(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ) t1
    UNION ALL
    SELECT 'machinery_with_error_events', COUNT(*) FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    ) t2
    ORDER BY bucket
    """


def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("k"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("k"))
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select(F.col("c_custkey").alias("k"))
    err_users = e.filter(F.col("event_type") == "error").select(F.col("user_id").alias("k"))
    a = building.exceptAll(urgent).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("building_no_urgent").alias("bucket"), "n"
    )
    b = machinery.intersect(err_users).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("machinery_with_error_events").alias("bucket"), "n"
    )
    return a.unionByName(b).orderBy("bucket")


# ---------------------------------------------------------------------------
# CDC merge, pivot, rollup grouping
# ---------------------------------------------------------------------------


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the events feed as a CDC stream keyed by user: latest change
    wins (ts, then event_id for deterministic replay); a user whose winning
    change is an 'error' event is treated as tombstoned and dropped
    (operators/cdc.latest_snapshot)."""
    from carrot_transform_spark.operators.cdc import latest_snapshot

    e = load(spark, sf_dir, "events")
    snap = latest_snapshot(
        e,
        key_cols=["user_id"],
        ts_col="ts",
        tiebreak_col="event_id",
        tombstone=F.col("event_type") == "error",
    )
    return snap.select(
        "user_id", "event_id", "ts", "event_type", fround("value", 4).alias("value")
    ).orderBy("user_id")


_CDC_SQL = f"""
    SELECT user_id, event_id, ts, event_type, {fround_sql('value', 4)} AS value FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn FROM events
    ) latest WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id
    """


def ev_pivot_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type pivot (explicit value list, so the output schema
    is static — the form that scales: Spark's inferred pivot needs an extra
    distinct pass and breaks schema stability)."""
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    return out.select("user_id", *cols).orderBy("user_id")


_PIVOT_SQL = f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id ORDER BY user_id
    """


def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority): subtotal rows per status and a grand
    total, disambiguated by a composed grouping id — Spark's native
    multi-level aggregate (one shuffle; partial aggregation applies to
    every grouping set)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "sum_price", "gid")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_ROLLUP_SQL = f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {dsum_sql("o_totalprice")} AS sum_price,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one pass —
    same composed grouping-id disambiguation as the rollup twin."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
        )
        .select("o_orderstatus", "o_orderpriority", "n_orders", "sum_price", "gid")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_CUBE_SQL = f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           {dsum_sql("o_totalprice")} AS sum_price,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus, o_orderpriority
    """


def ev_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (30 min length, 10 min hop) — each event
    lands in 3 windows; batch twin of streaming/events.sliding_user_activity.
    Spark's window() generates the copies natively; the DuckDB twin derives
    the same 3 hops by integer epoch math."""
    e = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        e.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
        .orderBy("win_start")
    )


_SLIDING_SQL = """
    WITH ev AS (
        SELECT CAST(FLOOR(epoch(ts) / 600) AS BIGINT) AS hop
        FROM events WHERE event_type = 'purchase'
    ),
    hops AS (SELECT hop - g.i AS win_hop FROM ev, UNNEST(generate_series(0, 2)) AS g(i))
    SELECT make_timestamp(win_hop * 600 * 1000000) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM hops GROUP BY win_hop ORDER BY win_start
    """


def ev_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel over the event stream: users whose first view,
    first click, first purchase happen in that order (operators/funnel.py —
    one conditional aggregation, no windows)."""
    from carrot_transform_spark.operators.funnel import funnel_steps

    e = load(spark, sf_dir, "events")
    return funnel_steps(e, "user_id", "event_type", "ts", _FUNNEL_STEPS).orderBy("step_idx")


_FUNNEL_STEPS = ["view", "click", "purchase"]


def _funnel_sql() -> str:
    from carrot_transform_spark.operators.funnel import funnel_steps_sql

    return funnel_steps_sql("events", "user_id", "event_type", "ts", _FUNNEL_STEPS) + " ORDER BY step_idx"


def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort by first-activity week, distinct
    active users per (cohort, week offset) (operators/retention.py)."""
    from carrot_transform_spark.operators.retention import retention_cohorts

    e = load(spark, sf_dir, "events")
    return retention_cohorts(e, "user_id", "ts", period_days=7).orderBy(
        "cohort_start", "period_offset"
    )


def _retention_sql() -> str:
    from carrot_transform_spark.operators.retention import retention_cohorts_sql

    return (
        retention_cohorts_sql("events", "user_id", "ts", period_days=7)
        + " ORDER BY cohort_start, period_offset"
    )


def join_salted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/skewjoin.py): orders x customer on
    the customer key, big side salted 8 ways, small side replicated — the
    oracle is the PLAIN join, pinning exact result equivalence."""
    from carrot_transform_spark.operators.skewjoin import salted_join

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    return salted_join(o, c, on="o_custkey", salt_key="o_orderkey", n_salts=8).select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


_SALTED_SQL = """
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """


# One registry entry for the remaining window/set-op checks (the benched
# running-total window stays standalone above).
register_suite(
    "sql_ops_suite",
    [
        (
            "win_order_gaps",
            win_order_gaps,
            _GAPS_SQL,
            [
                ("o_custkey", "i"),
                ("o_orderkey", "i"),
                ("prev_orderkey", "i"),
                ("days_since_prev", "i"),
                ("price_rank", "i"),
            ],
        ),
        (
            "win_topn_per_group",
            win_topn_per_group,
            _TOPN_SQL,
            [("c_mktsegment", "s"), ("c_custkey", "i"), ("acctbal", "f"), ("rnk", "i")],
        ),
        (
            "win_ntile_quartiles",
            win_ntile_quartiles,
            _NTILE_SQL,
            [("quartile", "i"), ("n", "i"), ("min_bal", "f"), ("max_bal", "f")],
        ),
        (
            "set_except_intersect",
            set_except_intersect,
            _SETOP_SQL,
            [("bucket", "s"), ("n", "i")],
        ),
        (
            "cdc_latest_snapshot",
            cdc_latest_snapshot,
            _CDC_SQL,
            [
                ("user_id", "i"),
                ("event_id", "i"),
                ("ts", "ts"),
                ("event_type", "s"),
                ("value", "f"),
            ],
        ),
        (
            "ev_pivot_types",
            ev_pivot_types,
            _PIVOT_SQL,
            [("user_id", "i")] + [(f"n_{t}", "i") for t in _EVENT_TYPES],
        ),
        (
            "agg_rollup_orders",
            agg_rollup_orders,
            _ROLLUP_SQL,
            [
                ("o_orderstatus", "s"),
                ("o_orderpriority", "s"),
                ("n_orders", "i"),
                ("sum_price", "f"),
                ("gid", "i"),
            ],
        ),
        (
            "ev_funnel_steps",
            ev_funnel_steps,
            _funnel_sql(),
            [("step_idx", "i"), ("step_name", "s"), ("n_users", "i")],
        ),
        (
            "ev_retention_cohorts",
            ev_retention_cohorts,
            _retention_sql(),
            [("cohort_start", "date"), ("period_offset", "i"), ("n_users", "i")],
        ),
        (
            "join_salted_orders",
            join_salted_orders,
            _SALTED_SQL,
            [("o_orderkey", "i"), ("o_custkey", "i"), ("c_name", "s"), ("c_mktsegment", "s")],
        ),
        (
            "agg_cube_orders",
            agg_cube_orders,
            _CUBE_SQL,
            [
                ("o_orderstatus", "s"),
                ("o_orderpriority", "s"),
                ("n_orders", "i"),
                ("sum_price", "f"),
                ("gid", "i"),
            ],
        ),
        (
            "ev_sliding_30m",
            ev_sliding_30m,
            _SLIDING_SQL,
            [("win_start", "ts"), ("n_events", "i")],
        ),
    ],
    tags=("window", "setop", "cdc", "funnel", "retention", "suite"),
)


# ---------------------------------------------------------------------------
# more TPC-H shapes
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("tpch", "semi-join"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    matched = o.join(
        l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return (
        matched.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q12_shipmode_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=("tpch", "case-agg"),
)
def q12_shipmode_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT ROUND(
        CAST(SUM(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END AS DECIMAL(27,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
        * 100, 4) AS promo_share_pct,
        {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
    """,
    tags=("tpch", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        l.join(maybe_broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(promo.cast("decimal(27,6)")).cast("double")
                / F.sum(rev.cast("decimal(27,6)")).cast("double")
                * 100,
                4,
            ).alias("promo_share_pct"),
            dsum(rev).alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_variety",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("tpch", "distinct-agg"),
    prepared=True,
)
def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25)
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(maybe_broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey, AVG(l_quantity) * 0.5 AS half_avg
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {fround_sql("CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0", 2)} AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#3'
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
    tags=("tpch", "correlated"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        l.join(maybe_broadcast(p), p.p_partkey == l.l_partkey)
        .join(avg_qty, F.col("ak") == l.l_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            fround(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double") / 7.0, 2
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "or-predicates"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(maybe_broadcast(p), p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS v
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS nation, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(27,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    GROUP BY nation ORDER BY nation
    """,
    tags=("tpch", "anti-join"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(27,6)")).cast("double") / F.count(F.lit(1))).alias("v")
        )
    )
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("v")).drop("v")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(27,6)")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )
