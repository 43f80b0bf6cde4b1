"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark).

`approx_count_distinct` (HyperLogLog++) answers a one-shot query but its
sketch is not exposed, so it cannot be persisted, merged across days, or
maintained by a stream. Spark 4 ships the Apache DataSketches HLL family as
SQL functions — `hll_sketch_agg` (build a binary sketch), `hll_union_agg` /
`hll_union` (register-wise max merge), `hll_sketch_estimate` — which makes
distinct-counting a first-class incremental operator: per-key sketches are
a few KB each regardless of corpus size, and the union of partial sketches
over any partitioning of the data has the SAME registers as a single-pass
build (register = max over observed hashes, and max is associative,
commutative, and idempotent).

That is the 100 TB shape: sketch each shard/day/batch independently
(map-side, one shuffle of |keys| sketch rows), store the per-key sketches,
and answer "distinct users per key so far" by a constant-time estimate —
never re-scanning history. The streaming twin lives in streaming/hll.py.

No reference counterpart (the reference has no sketching); this extends the
training-data-pipeline family like operators/freqitems.py (CMS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

DEFAULT_LG_K = 12  # 2^12 registers -> rsd ~1.6%, ~2.5 KB per sketch


def hll_build(
    df: DataFrame,
    val_col: str,
    key_col: str | None = None,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-key binary HLL sketches of `val_col`: (key, sketch).

    One aggregation with map-side partial sketching — the shuffle carries at
    most |keys| sketch rows per partition, never the values. With
    key_col=None a single global sketch is built under key '_all'.
    """
    key = F.col(key_col) if key_col else F.lit("_all")
    return (
        df.select(key.cast("string").alias("key"), F.col(val_col).alias("v"))
        .groupBy("key")
        .agg(F.expr(f"hll_sketch_agg(v, {int(lg_k)})").alias("sketch"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two (key, sketch) frames per key (register-wise max).

    Idempotent (merging a sketch with itself changes nothing) and
    associative — any merge tree over any partitioning yields the same
    estimates as a one-shot build, which the tests pin exactly.
    """
    return (
        a.unionByName(b)
        .groupBy("key")
        .agg(F.expr("hll_union_agg(sketch, false)").alias("sketch"))
    )


def hll_estimates(sketches: DataFrame) -> DataFrame:
    """(key, n_distinct) estimates from a (key, sketch) frame."""
    return sketches.select(
        "key", F.expr("hll_sketch_estimate(sketch)").cast("bigint").alias("n_distinct")
    )
