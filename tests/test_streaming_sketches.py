"""Streaming CMS maintenance vs the batch sketch (linearity + exactly-once).

The stored grid after draining a multi-file feed must equal cms_build over
the whole corpus cell-for-cell (CMS linearity makes the streaming form
exact, not approximate-on-top-of-approximate), and a replayed batch id
must be skipped, not double-counted.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from carrot_transform_spark.operators.freqitems import cms_build
from carrot_transform_spark.queries import load
from carrot_transform_spark.streaming import sketches as sk

_W, _D = 256, 3


def _word_files(spark, sf_dir, out_dir):
    """The corpus' words written as three files with increasing mtimes so the
    file source picks them up as separate micro-batches."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .withColumn("part", F.pmod(F.xxhash64("w"), F.lit(3)))
    )
    base = time.time() - 1000
    flat = out_dir / "words"
    flat.mkdir()
    for i in range(3):
        sub = out_dir / f"p{i}"
        words.filter(F.col("part") == i).select("w").coalesce(1).write.parquet(str(sub))
        for f in sorted(sub.glob("*.parquet")):
            dest = flat / f"{i:02d}_{f.name}"
            f.rename(dest)
            os.utime(dest, (base + i * 10, base + i * 10))
    return str(flat), words.select("w")


def _cells(df):
    return {(r["j"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_streaming_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    path, all_words = _word_files(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.format("parquet")
        .schema("w string")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    base_dir = str(tmp_path / "cms")
    q = sk.apply_cms_stream(
        stream, "w", base_dir, str(tmp_path / "ckpt"), width=_W, depth=_D
    )
    q.awaitTermination(300)

    got = sk.read_cms(spark, base_dir)
    assert got is not None
    expect = cms_build(all_words, "w", width=_W, depth=_D)
    assert _cells(got) == _cells(expect)


def test_streaming_cms_replay_is_noop(spark, tmp_path):
    base_dir = str(tmp_path / "cms2")
    words = spark.createDataFrame([("a",), ("b",), ("a",)], "w string")
    feed_dir = tmp_path / "feed"
    words.coalesce(1).write.parquet(str(feed_dir))
    stream = (
        spark.readStream.format("parquet").schema("w string").load(str(feed_dir))
    )
    q = sk.apply_cms_stream(stream, "w", base_dir, str(tmp_path / "ck2"), width=_W, depth=_D)
    q.awaitTermination(300)
    first = _cells(sk.read_cms(spark, base_dir))
    assert sum(first.values()) == 3 * _D  # 3 words x depth cells

    # simulate checkpoint replay: a FRESH checkpoint re-delivers the same file
    # as batch 0 against the same stored sketch — the pointer's batch-id
    # watermark must skip it (no double count)
    from carrot_transform_spark.streaming.sketches import _read_ptr

    _, last_bid = _read_ptr(base_dir)
    assert last_bid >= 0
    q2 = sk.apply_cms_stream(stream, "w", base_dir, str(tmp_path / "ck3"), width=_W, depth=_D)
    q2.awaitTermination(300)
    assert _cells(sk.read_cms(spark, base_dir)) == first
