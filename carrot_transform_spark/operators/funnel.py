"""Funnel analysis: ordered-step conversion over an event stream.

The standard product-analytics question — of the users who did step 1,
how many went on to do step 2, then step 3, in order? Semantics here are
the first-touch funnel: a user converts through step k iff the FIRST
occurrence of each step's event type is strictly later than the first
occurrence of the previous step's. This form is exactly expressible as a
single conditional aggregation — one shuffle on the user key, no window,
no per-user sequence materialization — so it runs identically at 100 TB
(partial aggregation map-side, no skew beyond the user-key distribution,
AQE handles a hot user).

(The stricter "re-entrant" funnel — step k must follow the SPECIFIC step
k-1 occurrence chosen — needs a per-user ordered fold; that variant is the
sessionization path, streaming/sessions.py. The first-touch form is what
the big analytics engines' funnel() functions compute by default.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from carrot_transform_spark.functions import sql_str


def funnel_steps(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Per-step conversion counts: (step_idx, step_name, n_users) where
    n_users = users whose first-touch times satisfy t_1 < t_2 < ... < t_k.
    """
    firsts = df.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"__t{i}")
            for i, s in enumerate(steps)
        ]
    )
    # reached(k) = all first-touch times present and strictly increasing
    reached = []
    cond = None
    for i in range(len(steps)):
        c = F.col(f"__t{i}").isNotNull()
        if i > 0:
            c = c & (F.col(f"__t{i}") > F.col(f"__t{i - 1}"))
        cond = c if cond is None else (cond & c)
        reached.append(F.sum(cond.cast("long")).alias(f"__n{i}"))
    counts = firsts.agg(*reached)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step_idx"),
                F.lit(s).alias("step_name"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.step_idx", "r.step_name", "r.n_users")
    )


def funnel_steps_sql(
    table: str, user_expr: str, type_expr: str, ts_expr: str, steps: list[str]
) -> str:
    """DuckDB twin of funnel_steps."""
    mins = ", ".join(
        f"MIN(CASE WHEN {type_expr} = {sql_str(s)} THEN {ts_expr} END) AS t{i}"
        for i, s in enumerate(steps)
    )
    selects = []
    for i, s in enumerate(steps):
        conds = ["t0 IS NOT NULL"]
        for j in range(1, i + 1):
            conds.append(f"t{j} IS NOT NULL AND t{j} > t{j - 1}")
        cond = " AND ".join(conds)
        selects.append(
            f"SELECT {i + 1} AS step_idx, {sql_str(s)} AS step_name, "
            f"CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS n_users "
            f"FROM firsts"
        )
    union = " UNION ALL ".join(selects)
    return (
        f"WITH firsts AS (SELECT {user_expr} AS u, {mins} FROM {table} GROUP BY {user_expr}) "
        f"{union}"
    )
