"""Count-min-sketch heavy hitters — bounded-memory frequent items.

The frequent-items primitive a training pipeline runs constantly (vocab
induction, frequent n-grams, hot-key detection before salting) at corpus
scales where an exact per-item groupBy is the dominant shuffle. The sketch
is a fixed ``depth x width`` grid of counters, so its size is independent
of corpus size and cardinality: build is ONE groupBy over ``depth`` salted
bucket ids per row (map-side combine collapses each partition to at most
``depth*width`` cells before the exchange), estimates are a broadcast-sized
join against the cell table. Standard CMS guarantee: estimate >= true
count, and overshoots true count by more than ``eps*N`` (eps = e/width)
with probability < (1/2)^depth per item.

Everything is deterministic integer arithmetic over md5-derived hashes
(operators/dedup.h32), so a SQL engine can rebuild the sketch bit-for-bit
— the registered query's DuckDB oracle replays the same cells and min —
and results are partition-layout invariant.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from carrot_transform_spark.operators.dedup import h32

CMS_SALT = "#C"


def _bucket(col: Column, j: int, width: int) -> Column:
    return F.pmod(h32(F.concat(col, F.lit(f"{CMS_SALT}{j}"))), F.lit(width))


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """(j, bucket, cnt): the sketch's non-empty cells. One shuffle of at
    most depth*width rows per upstream partition (map-side combine)."""
    buckets = F.array(*[_bucket(F.col(col), j, width) for j in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, items: DataFrame, col: str, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Point-estimate counts for each distinct value in ``items[col]``:
    min over the item's depth cells. The cell table is at most depth*width
    rows — always the broadcast side."""
    buckets = F.array(*[_bucket(F.col(col), j, width) for j in range(depth)])
    probes = items.select(col).distinct().select(
        col, F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def h32_sql(expr: str) -> str:
    """DuckDB twin of operators/dedup.h32 (md5-prefix 32-bit hash)."""
    return f"CAST(CAST(CONCAT('0x', substring(md5({expr}), 1, 8)) AS UBIGINT) AS BIGINT)"


def cms_cells_sql(values_sql: str, width: int = 2048, depth: int = 4) -> str:
    """DuckDB twin of cms_build over ``values_sql`` (one column ``w``)."""
    parts = []
    for j in range(depth):
        h = h32_sql(f"w || '{CMS_SALT}{j}'")
        parts.append(
            f"SELECT {j} AS j, {h} % {width} AS bucket FROM ({values_sql}) v{j}"
        )
    hashes = " UNION ALL ".join(parts)
    return f"SELECT j, bucket, COUNT(*) AS cnt FROM ({hashes}) h GROUP BY j, bucket"


def cms_probes_sql(items_sql: str, width: int = 2048, depth: int = 4) -> str:
    """DuckDB twin of cms_estimate's probe side: (w, j, bucket) for each
    item in ``items_sql`` (one column ``w``)."""
    parts = []
    for j in range(depth):
        h = h32_sql(f"w || '{CMS_SALT}{j}'")
        parts.append(
            f"SELECT w, {j} AS j, {h} % {width} AS bucket FROM ({items_sql}) p{j}"
        )
    return " UNION ALL ".join(parts)
