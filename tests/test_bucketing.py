"""Bucketed-layout co-located joins: the 100 TB artifact for repeated
fact-fact joins. Writing both sides bucketed by the join key lets Catalyst
plan the join with NO shuffle exchange on either side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdb")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("bucketdb.lineitem_b")
    )
    (
        o.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("bucketdb.orders_b")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS bucketdb.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bucketdb.orders_b")
    spark.sql("DROP DATABASE IF EXISTS bucketdb")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    l = spark.table("bucketdb.lineitem_b")
    o = spark.table("bucketdb.orders_b")
    joined = l.join(o, "l_orderkey").groupBy("o_orderstatus").count()
    # disable broadcast so the join strategy itself is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        joins_section = plan.split("HashAggregate")[-1] if "HashAggregate" in plan else plan
        # no Exchange below the join: bucket layout satisfies the
        # distribution requirement on both sides
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        below_join = plan.split("Join")[-1]
        assert "Exchange hashpartitioning(l_orderkey" not in below_join, plan[:2000]
        n = joined.count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_has_no_shuffle(warehouse):
    spark = warehouse
    l = spark.table("bucketdb.lineitem_b")
    agg = l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan[:1500]
    assert agg.count() > 0
