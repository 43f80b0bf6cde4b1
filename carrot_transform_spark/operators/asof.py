"""As-of join: for each left row, the most recent right row at or before its
timestamp, per key.

Spark has no native as-of join; the naive range join (t_right <= t_left)
explodes into O(n*m) per key. The scalable idiom is the union-merge:

1. union both sides tagged (right rows carry payload, left rows carry null),
2. one window per key ordered by (time, side) — right rows sort before
   left rows at equal timestamps so '<=' semantics hold,
3. last(payload, ignorenulls=True) over rows-unbounded-preceding propagates
   the latest right payload to each left row,
4. filter back to left rows.

One shuffle on the key, linear in |left| + |right| — the same merge pattern
a native as-of implementation would run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join; payload columns from the matched right row arrive as
    ``{prefix}{col}`` (NULL when no right row precedes the left row)."""
    lcols = left.columns
    l_tag = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{prefix}{c}") for c in payload_cols],
    )
    r_tag = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    merged = l_tag.unionByName(r_tag)
    # right rows first at equal timestamps => 'at or before' semantics
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in payload_cols
        ],
    )
    return (
        filled.filter(F.col("__is_right") == 0)
        .select(
            *[F.col(c) for c in lcols],
            *[F.col(f"__f_{c}").alias(f"{prefix}{c}") for c in payload_cols],
        )
    )
