"""Cohort retention: users grouped by first-activity period, tracked over
subsequent periods.

The classic retention triangle: cohort = the period (e.g. 7-day bucket) of
a user's first event; for each (cohort, period-offset) count the distinct
users from that cohort active in that period. Two shuffles total at any
scale: one groupBy(user) for first-touch, one groupBy(cohort, offset)
count — the first-touch side joins back on the user key, which co-locates
with the event stream's natural partitioning. No windows, no per-user
state.

Cross-engine note: every fractional step goes through an explicit FLOOR
before integer casting — DuckDB's CAST(double AS BIGINT) rounds half-away
while Spark's cast truncates, so a bare cast would put boundary rows in
different buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """(cohort_start, period_offset, n_users): distinct cohort users active
    period_offset periods after their cohort period. Periods are fixed
    period_days-day buckets anchored at the unix epoch — pure integer
    math, engine- and timezone-independent."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400)
    period = F.floor(day / period_days).cast("long")
    ev = df.select(F.col(user_col).alias("u"), period.alias("p"))
    firsts = ev.groupBy("u").agg(F.min("p").alias("p0"))
    return (
        ev.join(firsts, "u")
        .select("u", "p0", (F.col("p") - F.col("p0")).alias("off"))
        .distinct()
        .groupBy("p0", "off")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.date_add(
                F.to_date(F.lit("1970-01-01")), (F.col("p0") * period_days).cast("int")
            ).alias("cohort_start"),
            F.col("off").cast("long").alias("period_offset"),
            "n_users",
        )
    )


def retention_cohorts_sql(table: str, user_expr: str, ts_expr: str, period_days: int = 7) -> str:
    """DuckDB twin of retention_cohorts."""
    return f"""
    WITH ev AS (
        SELECT {user_expr} AS u,
               CAST(FLOOR(FLOOR(epoch({ts_expr}) / 86400) / {period_days}) AS BIGINT) AS p
        FROM {table}
    ),
    firsts AS (SELECT u, MIN(p) AS p0 FROM ev GROUP BY u),
    active AS (
        SELECT DISTINCT ev.u, firsts.p0, ev.p - firsts.p0 AS off
        FROM ev JOIN firsts ON ev.u = firsts.u
    )
    SELECT DATE '1970-01-01' + CAST(p0 * {period_days} AS INTEGER) AS cohort_start,
           CAST(off AS BIGINT) AS period_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active GROUP BY p0, off
    """
