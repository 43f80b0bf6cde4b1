"""Stream-stream interval join and foreachBatch CDC apply vs their batch twins.

Both streaming operators are checked for batch equivalence: the interval
join must produce exactly the static join's matches (inner join of closed
windows is watermark-safe when every event fits the horizon), and the CDC
snapshot after draining the change feed must equal operators/cdc.
latest_snapshot over all changes at once.
"""

from __future__ import annotations

import os
import shutil
import time

import pyspark.sql.functions as F

from carrot_transform_spark.queries import load
from carrot_transform_spark.streaming import events as sev
from carrot_transform_spark.streaming.cdc_apply import apply_cdc_stream, read_snapshot
from carrot_transform_spark.streaming.joins import click_to_purchase


def _chrono_files(spark, sf_dir, out_dir):
    """Events split into two chronological micro-batch files with distinct,
    increasing mtimes (file-source pickup order follows mtime)."""
    batch = load(spark, sf_dir, "events")
    mid = batch.selectExpr("percentile(cast(ts as long), 0.5) p").collect()[0]["p"]
    d = out_dir / "halves"
    batch.filter(F.col("ts").cast("long") <= mid).coalesce(1).write.parquet(str(d / "b0"))
    batch.filter(F.col("ts").cast("long") > mid).coalesce(1).write.parquet(str(d / "b1"))
    flat = out_dir / "flat"
    flat.mkdir()
    base = time.time() - 1000
    i = 0
    for sub in ["b0", "b1"]:
        for f in sorted((d / sub).glob("*.parquet")):
            dest = flat / f"{i:02d}_{f.name}"
            shutil.copy(f, dest)
            os.utime(dest, (base + i * 10, base + i * 10))
            i += 1
    return str(flat), batch


def test_interval_join_matches_batch(spark, sf_dir, tmp_path):
    path, batch = _chrono_files(spark, sf_dir, tmp_path)
    stream = sev.read_event_stream(spark, path)
    out = click_to_purchase(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        horizon="30 minutes",
    )
    sev.run_to_memory_sink(out, "t_attrib")
    got = sorted(
        (r["click_id"], r["purchase_id"]) for r in spark.table("t_attrib").collect()
    )

    expect = sorted(
        (r["click_id"], r["purchase_id"])
        for r in click_to_purchase(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
            horizon="30 minutes",
        ).collect()
    )
    assert got == expect and len(got) > 0


def test_cdc_apply_matches_batch(spark, sf_dir, tmp_path):
    from carrot_transform_spark.operators.cdc import latest_snapshot

    path, batch = _chrono_files(spark, sf_dir, tmp_path)
    stream = sev.read_event_stream(spark, path)
    base_dir, ckpt = str(tmp_path / "snap"), str(tmp_path / "ckpt")
    os.makedirs(base_dir)
    q = apply_cdc_stream(
        stream,
        base_dir,
        ckpt,
        key_cols=["user_id"],
        ts_col="ts",
        tiebreak_col="event_id",
        tombstone=F.col("event_type") == "error",
    )
    q.awaitTermination(300)
    assert not q.isActive

    snap = read_snapshot(spark, base_dir).filter(F.col("event_type") != "error")
    got = {r["user_id"]: (r["event_id"], r["ts"]) for r in snap.collect()}
    expect = {
        r["user_id"]: (r["event_id"], r["ts"])
        for r in latest_snapshot(
            batch, ["user_id"], "ts", "event_id", tombstone=F.col("event_type") == "error"
        ).collect()
    }
    assert got == expect and len(got) > 0
