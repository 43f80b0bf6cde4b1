"""Time-band (range) join: pair left rows with right rows whose timestamp
falls in a window relative to the left timestamp.

The reference engine has no interval-join operator (its joins are the
person/term lookups in carrottransform/tools/run.py); this is one of the
scale-path additions a training-data/event pipeline needs (sessions around
an anchor event, label windows, feature lookback).

Two physical strategies, chosen by whether an equi-key exists:

- with equi keys: a plain equi-join with the band predicate attached —
  Catalyst plans the shuffle on the keys and evaluates the band as a
  post-join filter; at 100 TB both sides co-partition on the key, so no
  row-explosion beyond the key's own fan-out.
- without keys: bucketize time into windows of width == band width. Each
  LEFT row can only match RIGHT rows in its own or the adjacent bucket, so
  the left side explodes to exactly 2 bucket keys and the join becomes an
  equi-join on the bucket — O(|L| * 2) join input instead of |L| x |R|,
  then the exact band predicate filters the candidates. This is the
  standard MapReduce band-join; AQE handles residual bucket skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def time_band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    keys: list[tuple[str, str]] | None = None,
    how: str = "left",
) -> DataFrame:
    """Join rows where right_ts BETWEEN left_ts + lower_s AND left_ts + upper_s
    (bounds in seconds; comparisons exact at native timestamp precision).

    keys: optional [(left_col, right_col), ...] equi-conditions.
    """
    band = (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_s} SECONDS")) & (
        F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_s} SECONDS")
    )
    if keys:
        cond = band
        for lk, rk in keys:
            cond = (F.col(lk) == F.col(rk)) & cond
        return left.join(right, cond, how)

    # keyless band join: bucket by the band width so each left row touches
    # exactly two buckets. The bucket join itself must run as INNER even for
    # how='left': a left row exploded into two bucket copies would otherwise
    # emit a spurious null-extended row from whichever copy found no match
    # (and an unmatched row would emit two null rows). Outer semantics are
    # restored afterwards by re-attaching unmatched left rows via left_anti.
    if how not in ("inner", "left"):
        raise ValueError(
            f"keyless time_band_join supports how='inner'|'left', got {how!r}"
        )
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"keyless time_band_join requires disjoint column names; shared: {sorted(overlap)}"
        )
    width = max(upper_s - lower_s, 1)
    lsec = F.col(left_ts).cast("long")
    rsec = F.col(right_ts).cast("long")
    # array_distinct BEFORE the explode: when the band lands inside one
    # bucket both endpoints coincide — dedup narrowly, no shuffle
    l_b = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(F.floor((lsec + lower_s) / width), F.floor((lsec + upper_s) / width))
            )
        ),
    )
    r_b = right.withColumn("__bucket", F.floor(rsec / width))
    joined = l_b.join(r_b, (l_b["__bucket"] == r_b["__bucket"]) & band, "inner").drop("__bucket")
    if how == "inner":
        return joined
    # left outer: null-extend the left rows that matched in no bucket.
    # left_anti keeps left multiplicity and needs no unique row id; identical
    # left rows have identical match sets, so matched-ness is row-value
    # determined. Null-safe equality so rows containing nulls compare equal
    # to themselves.
    matched_left = joined.select(*left.columns)
    anti_cond = None
    for c in left.columns:
        eq = left[c].eqNullSafe(matched_left[c])
        anti_cond = eq if anti_cond is None else anti_cond & eq
    unmatched = left.join(matched_left, anti_cond, "left_anti")
    null_right = [F.lit(None).cast(f.dataType).alias(f.name) for f in right.schema.fields]
    return joined.unionByName(unmatched.select("*", *null_right))
