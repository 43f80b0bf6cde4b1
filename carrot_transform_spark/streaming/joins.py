"""Stream-stream joins: the watermark-bounded interval join.

Joining two unbounded streams needs both sides buffered in state; the
watermark + time-range condition is what lets Spark prune that state (a
click older than the watermark horizon can never match a future purchase,
so its state is dropped). This is the streaming twin of the batch
time-band join (operators/rangejoin.py) — same semantics on closed
windows, which the batch-equivalence test pins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    left_watermark: str = "1 hour",
    right_watermark: str = "2 hours",
) -> DataFrame:
    """left row matched to every right row with the same key whose timestamp
    lands in [left.ts, left.ts + horizon]. The right watermark must cover
    left_watermark + horizon or matches near the horizon edge get their
    state dropped early; callers that tune one must tune both."""
    l = left.withWatermark(ts_col, left_watermark).alias("l")
    r = right.withWatermark(ts_col, right_watermark).alias("r")
    lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {horizon}"))
    )
    return l.join(r, cond, "inner")


def click_to_purchase(
    clicks: DataFrame, purchases: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Attribution: each click joined to the same user's purchases within
    the horizon. Works identically on static DataFrames (the
    batch-equivalence oracle) and streams."""
    out = interval_join(clicks, purchases, key="user_id", horizon=horizon)
    return out.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("purchase_ts"),
    )
