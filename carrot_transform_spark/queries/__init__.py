"""Query registry: every operator/query the engine claims as implemented.

Each entry pairs a Spark DataFrame builder with (where SQL-expressible) an
equivalent ANSI-SQL string for the DuckDB oracle. The driver's correctness
gate runs both at sf=0.01 and hash-compares sorted values, so:

- every computed column is aliased identically on both sides;
- double-typed aggregates are rounded on both sides so parallel-summation
  reordering can't flip the last ulp;
- any top-k has a deterministic total order (tie-break on a key column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL-expressible)
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, spark_fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and truncate to micros — the
        # same truncation DuckDB applies when loading nanos into its
        # micro-precision TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        import pyspark.sql.functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def dsum(expr, scale: int = 2):
    """Order-independent sum of a double expression, rounded to `scale`.

    Per-row cast to DECIMAL(27,6) -> exact decimal sum (no float reorder
    sensitivity) -> exact HALF_UP round -> double. The SQL twin is
    dsum_sql(); both engines produce bit-identical doubles.
    """
    import pyspark.sql.functions as F

    col = expr if not isinstance(expr, str) else F.col(expr)
    return F.round(F.sum(col.cast("decimal(27,6)")), scale).cast("double")


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(27,6))), {scale}) AS DOUBLE)"


def davg(expr, scale: int = 4):
    """Order-independent average: exact decimal sum -> double -> / count."""
    import pyspark.sql.functions as F

    col = expr if not isinstance(expr, str) else F.col(expr)
    return F.round(
        F.sum(col.cast("decimal(27,6)")).cast("double") / F.count(F.lit(1)), scale
    )


def davg_sql(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*), {scale})"


def fround(expr, scale: int = 4):
    """Engine-stable rounding of a DOUBLE: floor(x*10^s + 0.5)/10^s uses only
    IEEE ops, so identical input doubles give identical results everywhere.
    (Native ROUND differs between engines when the double's shortest decimal
    repr terminates in '5' at the rounding digit: Spark rounds the repr
    half-up, DuckDB multiplies first.)"""
    import pyspark.sql.functions as F

    col = expr if not isinstance(expr, str) else F.col(expr)
    m = 10 ** scale
    return (F.floor(col * m + F.lit(0.5)) / m).cast("double")


def fround_sql(expr: str, scale: int = 4) -> str:
    m = 10 ** scale
    return f"CAST(FLOOR(({expr}) * {m} + 0.5) / {m} AS DOUBLE)"


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules that populate the registry.
    from carrot_transform_spark.queries import (  # noqa: F401
        analytics,
        ann_lsh,
        asof_q,
        dedup,
        events,
        multimodal_q,
        omop_pipeline,
        operators_demo,
        similarity,
        text,
        tpch,
        tpch2,
    )

    return REGISTRY
