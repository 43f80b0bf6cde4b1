"""Engine-stable rounding shared by operators and the oracle-twinned queries.

Native ROUND on DOUBLE differs between engines when the double's shortest
decimal repr terminates in '5' at the rounding digit: Spark rounds the repr
half-up, DuckDB multiplies first. floor(x*10^s + 0.5)/10^s uses only IEEE
ops, so identical input doubles give identical results everywhere. Lives in
``functions`` (not ``queries``) so data-plane operators can use it without
importing the query registry.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def fround(expr, scale: int = 4):
    """Engine-stable rounding of a DOUBLE column: floor(x*10^s + 0.5)/10^s."""
    col = expr if not isinstance(expr, str) else F.col(expr)
    m = 10 ** scale
    return (F.floor(col * m + F.lit(0.5)) / m).cast("double")


def fround_sql(expr: str, scale: int = 4) -> str:
    """The SQL twin of :func:`fround` (same IEEE op sequence in DuckDB)."""
    m = 10 ** scale
    return f"CAST(FLOOR(({expr}) * {m} + 0.5) / {m} AS DOUBLE)"
