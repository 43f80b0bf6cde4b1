"""Tests for multimodal column plumbing and the Structured Streaming surface."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators import multimodal as mm
from carrot_transform_spark.queries import load
from carrot_transform_spark.streaming import events as sev


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes([i % 251]) * (100 + i * 13)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, raw binary")
    return mm.attach_payload_meta(df, "raw", modality="image", fmt="jpeg")


def test_attach_payload_meta(media_df):
    r = media_df.filter(F.col("id") == 3).select("meta.*", "payload").collect()[0]
    assert r["modality"] == "image" and r["format"] == "jpeg"
    assert r["n_bytes"] == len(r["payload"]) == 100 + 3 * 13
    assert len(r["checksum"]) == 32


def test_decode_stats_batchwise(media_df):
    out = mm.decode_stats(media_df).orderBy("id").collect()
    assert len(out) == 20
    assert all(64 <= r["width"] < 128 and 64 <= r["height"] < 128 for r in out)
    # deterministic: same payload -> same fake dimensions
    again = mm.decode_stats(media_df).orderBy("id").collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_resize_images_shape(media_df):
    out = mm.resize_images(media_df, target=224).collect()
    assert len(out) == 20
    assert all(r["width"] == r["height"] == 224 for r in out)
    assert all(len(r["payload"]) == 32 for r in out)  # fake codec emits sha256


def test_sample_frames_fanout(media_df):
    out = mm.sample_frames(media_df, every_n=2)
    per_id = out.groupBy("id").count().collect()
    assert len(per_id) == 20
    assert all(1 <= r["count"] <= 4 for r in per_id)  # n_frames in 1..8, step 2


def test_real_decode_unknown_magic_raises():
    # formats with no dependency-free decoder still raise cleanly; note
    # baseline JPEG is REAL now (operators/jpeg.py) — b"xx" has no JPEG
    # magic, so it's the unknown-format path, not the JPEG path
    with pytest.raises(NotImplementedError):
        mm.real_decode(b"xx", "jpeg")


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def event_files(spark, sf_dir, tmp_path_factory):
    """Write the events table as several parquet files (micro-batches)."""
    d = tmp_path_factory.mktemp("evstream")
    batch = load(spark, sf_dir, "events")  # handles nanos->micros
    batch.repartition(3).write.mode("overwrite").parquet(str(d))
    return str(d), batch


def test_stream_tumbling_matches_batch(spark, event_files):
    path, batch = event_files
    stream = sev.read_event_stream(spark, path)
    assert stream.isStreaming
    agg = sev.tumbling_counts(stream)
    sev.run_to_memory_sink(agg, "t_tumbling")
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in spark.table("t_tumbling").collect()
    }
    expect = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in (
            batch.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.avg("value"), 4).alias("avg_value"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "avg_value")
            .collect()
        )
    }
    assert got == expect


def test_stream_dedup(spark, event_files):
    path, batch = event_files
    stream = sev.read_event_stream(spark, path)
    # micro-batch files arrive in arbitrary event-time order, so use a
    # watermark wider than the dataset's time span — with a narrow watermark
    # genuinely-late events are (correctly) dropped
    sev.run_to_memory_sink(sev.dedup_stream(stream, watermark="365 days"), "t_dedup")
    assert spark.table("t_dedup").count() == batch.count()
