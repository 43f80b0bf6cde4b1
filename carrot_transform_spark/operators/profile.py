"""Table profiling: per-column data-quality statistics in one pass —
the ANALYZE/profiling step a pipeline runs before trusting a new drop.

(column, n_rows, n_nulls, n_distinct, min_s, max_s) per profiled column.
All per-column aggregates ride in ONE wide aggregation (a single job);
min/max are emitted as strings so the schema is column-type-agnostic.

`exact=True` uses COUNT(DISTINCT) — Spark plans the multi-distinct agg
with an Expand (one extra pass over the rows per distinct column), which
is fine at audit scale and lets a SQL oracle match bit-for-bit.
`exact=False` (the 100 TB default) swaps in approx_count_distinct
(HyperLogLog++, single pass, mergeable partials, no Expand).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def table_profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    cols = columns or df.columns
    distinct = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_s"),
                F.col(f"__mx_{c}").alias("max_s"),
            )
            for c in cols
        ]
    )
    return wide.select("n_rows", F.explode(per_col).alias("p")).select(
        F.col("p.col_name").alias("col_name"),
        F.col("n_rows").cast("long").alias("n_rows"),
        "p.n_nulls",
        "p.n_distinct",
        "p.min_s",
        "p.max_s",
    )


def table_profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of table_profile(exact=True)."""
    parts = []
    for c in columns:
        parts.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"CAST(MIN({c}) AS VARCHAR) AS min_s, CAST(MAX({c}) AS VARCHAR) AS max_s "
            f"FROM {table}"
        )
    return " UNION ALL ".join(parts)
