"""Salted join: break hot keys across partitions for skewed shuffles.

When one join key carries a disproportionate share of rows (the null-ish
user, the default category), a plain shuffle join lands the whole hot key
on one task. Salting splits it: the skewed (big) side gets a random-ish
salt in [0, S), the other side is replicated S times, and the join runs on
(key, salt) — the hot key now spreads over S tasks. Result is EXACTLY the
plain join's (each big-side row joins once per matching small-side row).

The salt is derived from a hash of the whole row's stable id rather than
rand() so retries and both engines reproduce identical results. AQE's
skew-join handling does this adaptively for sort-merge joins; the explicit
operator covers the cases AQE can't see (aggregations-before-join, or a
deliberately pre-partitioned layout).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join big⋈small on `on`, salting the big side by hash(salt_key) %
    n_salts and exploding the small side n_salts ways. Supports inner and
    left joins (the salted copies are disjoint, so no dedup is needed)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.col(salt_key).cast("string")), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
