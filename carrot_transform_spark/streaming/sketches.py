"""Streaming count-min-sketch maintenance (incremental frequent items).

CMS is a LINEAR sketch: the sketch of a union of streams is the cell-wise
SUM of their sketches. That makes the streaming form exact — each
micro-batch is sketched with the same batch operator
(operators/freqitems.cms_build) and merged into the stored grid by one
(j, bucket) keyed sum, so after draining a feed the stored sketch is
bit-identical to a batch build over the whole corpus (the test pins this).

Unlike the latest-wins CDC merge (streaming/cdc_apply.py), a cell-sum is
NOT naturally idempotent — replaying a micro-batch after checkpoint
recovery would double-count it. The pointer file therefore records the
last APPLIED batch id next to the version directory, and the merge skips
any batch id <= it: the standard transactional-foreachBatch recipe for
non-idempotent sinks (track batchId durably and atomically with the data).

State is bounded by depth*width cells whatever the corpus size — this is
the sketch whose streaming form you actually want at 100 TB/day, because
the stored state never grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from carrot_transform_spark.operators.freqitems import cms_build

_PTR = "_LATEST"


def _read_ptr(base_dir: str) -> tuple[str | None, int]:
    """(version_dir, last_applied_batch_id); (None, -1) before first batch."""
    ptr = os.path.join(base_dir, _PTR)
    if not os.path.exists(ptr):
        return None, -1
    with open(ptr) as fh:
        body = fh.read().strip()
    if not body:
        return None, -1
    vdir, _, bid = body.partition(":")
    return os.path.join(base_dir, vdir), int(bid or "-1")


def read_cms(spark: SparkSession, base_dir: str) -> DataFrame | None:
    """The current (j, bucket, cnt) cell grid, or None before any batch."""
    p, _ = _read_ptr(base_dir)
    return spark.read.parquet(p) if p else None


def merge_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches (the CMS linearity law)."""
    return (
        a.unionByName(b)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def apply_cms_stream(
    values: DataFrame,
    col: str,
    base_dir: str,
    checkpoint_dir: str,
    width: int = 2048,
    depth: int = 4,
):
    """Start (and return) the streaming query maintaining the sketch.

    ``values`` is a streaming DataFrame; each micro-batch is sketched and
    cell-summed into the stored grid. Versioned directories + an atomic
    pointer swap keep readers consistent; the pointer's batch-id watermark
    makes checkpoint replay a no-op instead of a double count.
    """
    spark = values.sparkSession
    os.makedirs(base_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        prev_path, last_bid = _read_ptr(base_dir)
        if batch_id <= last_bid:
            return  # replayed batch: already folded into the stored sketch
        batch_cells = cms_build(batch_df, col, width=width, depth=depth)
        if prev_path is not None:
            batch_cells = merge_cells(spark.read.parquet(prev_path), batch_cells)
        vdir, attempt = f"v{batch_id}", 0
        while os.path.exists(os.path.join(base_dir, vdir)):
            attempt += 1
            vdir = f"v{batch_id}.{attempt}"
        batch_cells.write.parquet(os.path.join(base_dir, vdir))
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
