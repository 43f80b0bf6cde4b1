"""Change-data-capture merge: collapse a change stream to its latest
snapshot (upsert + tombstone semantics).

The staple "apply the CDC feed to the table" operation: latest change per
key wins (ordered by event time with a unique tiebreaker so replays are
deterministic), and a key whose WINNING change is a delete marker drops
out of the snapshot entirely.

One shuffle on the key, then a partition-local window — the same shape at
any scale, and AQE's skew-join handling applies if one key dominates the
feed. No driver-side state; this is the batch form (the streaming twin is
dedup-by-key with `applyInPandasWithState`, streaming/events.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def latest_snapshot(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    tombstone: Column | None = None,
) -> DataFrame:
    """One row per live key: the latest change by (ts, tiebreak), with keys
    whose winning change matches `tombstone` removed."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if tombstone is not None:
        latest = latest.filter(~tombstone)
    return latest


def latest_snapshot_sql(
    inner_sql: str,
    key_expr: str,
    ts_expr: str,
    tiebreak_expr: str,
    tombstone_pred: str | None = None,
) -> str:
    """DuckDB twin of latest_snapshot."""
    return f"""
    SELECT * EXCLUDE (__rn) FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {key_expr} ORDER BY {ts_expr} DESC, {tiebreak_expr} DESC
        ) AS __rn
        FROM ({inner_sql}) chg
    ) latest WHERE __rn = 1 {"AND NOT (" + tombstone_pred + ")" if tombstone_pred else ""}
    """
