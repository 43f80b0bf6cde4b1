"""Streaming HLL distinct-count maintenance vs the one-shot batch sketch.

The mergeability law under test: HLL registers are maxima over hashed
inputs, so union over ANY batch boundaries must estimate-equal a single
build over the whole corpus — exactly, not approximately (the sketch is
deterministic; only its estimate vs the TRUE cardinality is approximate).
Plus the store contracts shared with the CMS maintainer: replay is a
no-op, state is |keys| rows whatever the feed size.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from carrot_transform_spark.operators.cardinality import (
    hll_build,
    hll_estimates,
    hll_merge,
)
from carrot_transform_spark.queries import load
from carrot_transform_spark.streaming import hll as shll


def _est(df):
    return {r["key"]: r["n_distinct"] for r in hll_estimates(df).collect()}


def _event_files(spark, sf_dir, out_dir):
    """events (user_id, event_type) as three files with increasing mtimes so
    the file source delivers three micro-batches."""
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), F.col("user_id").cast("long").alias("u")
    )
    base = time.time() - 1000
    flat = out_dir / "events"
    flat.mkdir()
    for i in range(3):
        sub = out_dir / f"p{i}"
        e.filter(F.pmod(F.xxhash64("u"), F.lit(3)) == i).coalesce(1).write.parquet(
            str(sub)
        )
        for f in sorted(sub.glob("*.parquet")):
            dest = flat / f"{i:02d}_{f.name}"
            f.rename(dest)
            os.utime(dest, (base + i * 10, base + i * 10))
    return str(flat), e


def test_streaming_hll_equals_batch_sketch(spark, sf_dir, tmp_path):
    path, all_events = _event_files(spark, sf_dir, tmp_path)
    stream = (
        spark.readStream.format("parquet")
        .schema("k string, u long")
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    base_dir = str(tmp_path / "hll")
    q = shll.apply_hll_stream(
        stream, "u", base_dir, str(tmp_path / "ckpt"), key_col="k"
    )
    q.awaitTermination(300)

    got = shll.read_hll(spark, base_dir)
    assert got is not None
    want = _est(hll_build(all_events, "u", key_col="k"))
    assert _est(got) == want

    # state boundedness: one sketch row per key, not per value
    n_keys = all_events.select("k").distinct().count()
    assert got.count() == n_keys

    # and the estimates track the exact cardinalities within 3x the
    # configured rsd (lg_k=12 -> rsd ~1.6%)
    exact = {
        r["k"]: r["n"]
        for r in all_events.groupBy("k")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    }
    for k, est in _est(got).items():
        assert abs(est - exact[k]) <= max(3 * 0.016 * exact[k], 1.0), (k, est, exact[k])


def test_hll_merge_idempotent_and_partition_invariant(spark, sf_dir):
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("k"), F.col("user_id").cast("long").alias("u")
    )
    one_shot = hll_build(e, "u", key_col="k")
    # self-merge changes no estimate (register-wise max is idempotent)
    assert _est(hll_merge(one_shot, one_shot)) == _est(one_shot)
    # any split merges back to the one-shot estimates
    a = hll_build(e.filter(F.pmod(F.xxhash64("u"), F.lit(2)) == 0), "u", key_col="k")
    b = hll_build(e.filter(F.pmod(F.xxhash64("u"), F.lit(2)) == 1), "u", key_col="k")
    assert _est(hll_merge(a, b)) == _est(one_shot)
    # and a different physical partitioning of the same rows sketches equal
    assert _est(hll_build(e.repartition(7), "u", key_col="k")) == _est(one_shot)


def test_streaming_hll_replay_is_noop(spark, tmp_path):
    base_dir = str(tmp_path / "hll2")
    rows = spark.createDataFrame([("a", 1), ("a", 2), ("b", 1)], "k string, u long")
    feed = tmp_path / "feed"
    rows.coalesce(1).write.parquet(str(feed))
    stream = spark.readStream.format("parquet").schema("k string, u long").load(str(feed))
    q = shll.apply_hll_stream(stream, "u", base_dir, str(tmp_path / "ck1"), key_col="k")
    q.awaitTermination(300)
    first = _est(shll.read_hll(spark, base_dir))
    assert first == {"a": 2, "b": 1}
    ptr = open(os.path.join(base_dir, "_LATEST")).read()

    # a fresh checkpoint re-delivers the same file as batch 0; the watermark
    # must skip it — pointer bytes unchanged, not merely value-unchanged
    q2 = shll.apply_hll_stream(stream, "u", base_dir, str(tmp_path / "ck2"), key_col="k")
    q2.awaitTermination(300)
    assert open(os.path.join(base_dir, "_LATEST")).read() == ptr
    assert _est(shll.read_hll(spark, base_dir)) == first


def test_global_sketch_without_key(spark):
    rows = spark.createDataFrame([(i % 50,) for i in range(500)], "u long")
    est = _est(hll_build(rows, "u"))
    assert est == {"_all": 50}
