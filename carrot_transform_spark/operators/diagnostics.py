"""Key-skew diagnostics: find the heavy keys before they melt a shuffle.

At 100 TB the difference between a 20-minute and a 6-hour job is usually
one hot key in a join/groupBy. ``skew_profile`` is the measurement step:
per-key counts (the operator's single shuffle — |keys| rows, map-side
combined), global totals as a one-row broadcast, and the top-K heavy keys
with their exact parts-per-million share and an integer ``salts_hint`` —
the over-representation factor vs a uniform key, i.e. the number of salt
shards that brings the key down to average load, directly consumable by
operators/skewjoin.salted_join(n_salts=...). The hint is the raw factor;
callers should clamp it to the cluster's useful parallelism (a 20%-hot
key among 1M keys yields a ~200k factor, but n_salts beyond the shuffle
partition count buys nothing).

All derived columns are exact integer arithmetic (ppm = n*1e6 div total),
so the DuckDB oracle reproduces every value; ordering is (count desc, key
asc) — fully deterministic under ties. The top-K sort is sort+limit
(TakeOrdered — per-partition top-K then a K-row merge, never a global
sort); the K-row rank window runs after the limit, so its single-partition
window sees K rows, not |keys|.

Reference parity note: the reference engine has no skew tooling (its
joins are broadcast-sized person/term lookups); this is part of the
beyond-reference scale toolkit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def skew_profile(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Top-``top_k`` heaviest keys of ``df[key_col]`` with exact share and
    salting hint. Columns: key, n_rows, rank, ppm, salts_hint."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__n_keys"),
    )
    top = (
        counts.orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(totals))
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .withColumn("ppm", F.expr("(n_rows * 1000000L) div __total"))
        .withColumn(
            "salts_hint",
            F.expr("(n_rows * __n_keys + __total - 1) div __total"),
        )
        .select("key", "n_rows", "rank", "ppm", "salts_hint")
    )


def skew_profile_sql(inner_sql: str, key_expr: str, top_k: int = 10) -> str:
    """DuckDB twin of skew_profile over ``inner_sql`` rows."""
    return f"""
    WITH src AS ({inner_sql}),
    c AS (SELECT {key_expr} AS key, COUNT(*) AS n_rows FROM src GROUP BY 1),
    t AS (SELECT SUM(n_rows) AS __total, COUNT(*) AS __n_keys FROM c)
    SELECT key, n_rows,
           CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS BIGINT) AS rank,
           (n_rows * 1000000) // __total AS ppm,
           (n_rows * __n_keys + __total - 1) // __total AS salts_hint
    FROM c CROSS JOIN t
    ORDER BY n_rows DESC, key LIMIT {top_k}
    """
