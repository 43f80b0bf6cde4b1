"""Streaming per-key quantile maintenance (mergeable KLL sketches).

The streaming twin of operators/kll.py, completing the maintained-sketch
trio next to streaming/hll.py ("how many distinct") and
streaming/sketches.py ("how often"): each micro-batch is sketched with the
same batch operator and level-wise merged into the stored per-key rows, so
after draining a feed the stored estimates carry the same rank-error bound
as a one-shot build over the whole corpus (KLL compaction error is
additive over merges exactly as over inserts — pinned by test).

State is |keys| x O(k log(n/k)) doubles, forever, whatever the feed
volume. Unlike HLL registers the KLL merge is NOT idempotent (re-merging
the same batch double-counts its weight), so the batch-id watermark is
load-bearing here exactly as for CMS: the pointer file records the last
applied batch id and recovery re-deliveries are skipped. Versioned
directories + an atomic pointer swap keep concurrent readers on a
consistent snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.operators.kll import (
    DEFAULT_K,
    kll_build,
    kll_merge_partials,
)
from carrot_transform_spark.streaming.sketches import _PTR, _read_ptr


def read_kll(spark: SparkSession, base_dir: str) -> DataFrame | None:
    """The current (key, level, items, n) frame, or None before any batch."""
    p, _ = _read_ptr(base_dir)
    return spark.read.parquet(p) if p else None


def apply_kll_stream(
    values: DataFrame,
    val_col: str,
    base_dir: str,
    checkpoint_dir: str,
    key_col: str | None = None,
    k: int = DEFAULT_K,
):
    """Start (and return) the streaming query maintaining per-key sketches.

    ``values`` is a streaming DataFrame; each micro-batch is sketched
    (map-side partials, one |keys|-sketch-row shuffle) and merged into the
    store via the same level-wise concat + recompaction as the batch path.
    """
    spark = values.sparkSession
    os.makedirs(base_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        prev_path, last_bid = _read_ptr(base_dir)
        if batch_id <= last_bid:
            return  # replayed batch: merging again would double-count
        sk = kll_build(batch_df, val_col, key_col=key_col, k=k)
        if prev_path is not None:
            sk = sk.unionByName(spark.read.parquet(prev_path))
        merged = kll_merge_partials(sk, k=k)
        vdir, attempt = f"v{batch_id}", 0
        while os.path.exists(os.path.join(base_dir, vdir)):
            attempt += 1
            vdir = f"v{batch_id}.{attempt}"
        merged.write.parquet(os.path.join(base_dir, vdir))
        tmp = os.path.join(base_dir, f"._LATEST.{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(f"{vdir}:{batch_id}")
        os.replace(tmp, os.path.join(base_dir, _PTR))

    return (
        values.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
