"""Streaming CDC apply: maintain a latest-wins snapshot from a change feed.

The foreachBatch upsert pattern: each micro-batch of changes is merged
with the current snapshot via the SAME batch operator
(operators/cdc.latest_snapshot), and the result replaces the snapshot
atomically — new version directory + pointer file, so readers never see a
half-written table and a failed batch leaves the previous version intact.
Micro-batch replay (checkpoint recovery) is idempotent because
latest_snapshot's (ts, tiebreak) ordering is deterministic: re-applying a
batch produces the identical snapshot.

At scale the merge is one key shuffle over snapshot+delta — the same shape
Delta/Hudi MERGE INTO executes; here it's plain parquet + a version
pointer so the pattern stays dependency-free.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession

from carrot_transform_spark.operators.cdc import latest_snapshot

_PTR = "_LATEST"


def snapshot_path(base_dir: str) -> str | None:
    """Current snapshot version directory, or None before the first batch."""
    ptr = os.path.join(base_dir, _PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        v = fh.read().strip()
    return os.path.join(base_dir, v) if v else None


def read_snapshot(spark: SparkSession, base_dir: str) -> DataFrame | None:
    p = snapshot_path(base_dir)
    return spark.read.parquet(p) if p else None


def apply_cdc_stream(
    changes: DataFrame,
    base_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    tombstone: Column | None = None,
):
    """Start (and return) the streaming query maintaining the snapshot.

    tombstone rows must survive INTO the snapshot (filtered only on read):
    a delete arriving in batch 3 must still beat an upsert replayed from
    batch 1, so the merge keeps the winning change row per key whatever its
    kind, and `read_snapshot` callers drop tombstoned keys.
    """
    spark = changes.sparkSession

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        prev = read_snapshot(spark, base_dir)
        allc = batch_df.unionByName(prev) if prev is not None else batch_df
        # keep tombstone winners in the stored snapshot (see docstring)
        snap = latest_snapshot(allc, key_cols, ts_col, tiebreak_col, tombstone=None)
        # never reuse an existing version dir: a checkpoint replay of batch N
        # whose pointer already advanced to vN would otherwise OVERWRITE the
        # very directory `prev` is lazily reading (Spark refuses, and a crash
        # mid-write could destroy the live snapshot). A fresh suffixed dir
        # keeps every attempt isolated; the pointer swap stays atomic.
        vdir, attempt = f"v{batch_id}", 0
        while os.path.exists(os.path.join(base_dir, vdir)):
            attempt += 1
            vdir = f"v{batch_id}.{attempt}"
        snap.write.parquet(os.path.join(base_dir, vdir))
        tmp = os.path.join(base_dir, f"._LATEST.{batch_id}")
        with open(tmp, "w") as fh:
            fh.write(vdir)
        os.replace(tmp, os.path.join(base_dir, _PTR))

    return (
        changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
