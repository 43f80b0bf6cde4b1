"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
every implemented operator (SURVEY.md §2 + LLM-pipeline extensions) as
(spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent
SQL for each (omitted only for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from carrot_transform_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = all_queries()["q1_pricing_summary"]
    return q.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark_fn for name, qd in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}
