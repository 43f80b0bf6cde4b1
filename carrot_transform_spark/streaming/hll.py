"""Streaming per-key distinct-count maintenance (mergeable HLL sketches).

The streaming twin of operators/cardinality.py: each micro-batch is
sketched with the same batch operator and register-wise-max-merged into the
stored per-key sketches, so after draining a feed the stored estimates
equal a one-shot build over the whole corpus (pinned by test — HLL
registers are maxima, and max is associative/commutative/idempotent, so
the merge ORDER and batch BOUNDARIES cannot change the result).

State is |keys| sketch rows of a few KB each, forever, whatever the feed
volume — with CMS (streaming/sketches.py) this covers the two sketch
shapes a 100 TB/day pipeline actually maintains: "how often" (CMS) and
"how many distinct" (HLL).

Unlike the CMS cell-sum, the HLL union IS value-idempotent, so a replayed
micro-batch cannot corrupt the estimates — but the stored binary could
still differ after an unnecessary re-merge, so the same batch-id watermark
recipe as sketches.py keeps replay a byte-level no-op too (the pointer
file records the last applied batch id; recovery re-deliveries are
skipped). Versioned directories + an atomic pointer swap keep concurrent
readers on a consistent snapshot.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.operators.cardinality import (
    DEFAULT_LG_K,
    hll_build,
    hll_merge,
)
from carrot_transform_spark.streaming.sketches import _read_ptr, _PTR


def read_hll(spark: SparkSession, base_dir: str) -> DataFrame | None:
    """The current (key, sketch) frame, or None before any batch."""
    p, _ = _read_ptr(base_dir)
    return spark.read.parquet(p) if p else None


def apply_hll_stream(
    values: DataFrame,
    val_col: str,
    base_dir: str,
    checkpoint_dir: str,
    key_col: str | None = None,
    lg_k: int = DEFAULT_LG_K,
):
    """Start (and return) the streaming query maintaining per-key sketches.

    ``values`` is a streaming DataFrame; each micro-batch is sketched
    (map-side partials, one |keys|-row shuffle) and merged into the store.
    """
    spark = values.sparkSession
    os.makedirs(base_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        prev_path, last_bid = _read_ptr(base_dir)
        if batch_id <= last_bid:
            return  # replayed batch: estimates would be unchanged anyway
        sk = hll_build(batch_df, val_col, key_col=key_col, lg_k=lg_k)
        if prev_path is not None:
            sk = hll_merge(spark.read.parquet(prev_path), sk)
        vdir, attempt = f"v{batch_id}", 0
        while os.path.exists(os.path.join(base_dir, vdir)):
            attempt += 1
            vdir = f"v{batch_id}.{attempt}"
        sk.write.parquet(os.path.join(base_dir, vdir))
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
