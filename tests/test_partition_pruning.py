"""Hive-style partitioned layout: partition pruning at the file level.

The other half of the 100 TB layout story (tests/test_bucketing.py covers
co-located joins): a fact table written partitioned by a low-cardinality
column lets a filter on that column skip entire directories — the scan's
PartitionFilters, visible in the plan, never opens the excluded files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.queries import load


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_part")
    e = load(spark, sf_dir, "events")
    e.write.mode("overwrite").partitionBy("event_type").parquet(str(d / "events"))
    return str(d / "events"), e


def test_partition_filter_prunes_files(spark, part_dir):
    path, raw = part_dir
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must sit in PartitionFilters, not DataFilters
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "event_type" in pf.split("PartitionFilters")[1].split("]")[0]
    # and the scan touches only the one partition's files
    files = df.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("event_type=purchase" in r["f"] for r in files)
    # correctness: same rows as filtering the unpartitioned table
    assert df.count() == raw.filter(F.col("event_type") == "purchase").count()


def test_partitioned_roundtrip_preserves_rows(spark, part_dir):
    path, raw = part_dir
    got = spark.read.parquet(path)
    assert got.count() == raw.count()
    # per-partition counts survive the layout change
    a = {r["event_type"]: r["n"] for r in raw.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    b = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert a == b
