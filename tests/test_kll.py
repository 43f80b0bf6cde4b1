"""Mergeable KLL quantile sketches (operators/kll.py, streaming/quantiles.py).

What's pinned: rank-error accuracy vs exact numpy quantiles (the sketch's
reason to exist), exact n accounting, bit-determinism under a fixed
partitioning, the mergeability law (partials over ANY split merge into a
sketch with the one-shot bound), state boundedness (O(k log n) doubles,
not O(n)), and the streaming maintainer's contracts (drained feed == batch
bound, replay is a byte-level no-op — the KLL merge is NOT idempotent, so
the batch-id watermark is load-bearing here)."""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.kll import (
    KLL,
    kll_build,
    kll_merge_partials,
    kll_quantiles,
    kll_rank_check,
    kll_sketch,
)

_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(data: np.ndarray, sk: KLL, qs=_QS) -> float:
    s = np.sort(data)
    return max(
        abs(np.searchsorted(s, sk.quantile(q), side="right") / len(s) - q)
        for q in qs
    )


def test_core_accuracy_and_size():
    rng = np.random.default_rng(11)
    data = rng.lognormal(3, 2, 150_000)  # heavy-tailed on purpose
    sk = KLL(200)
    for i in range(0, len(data), 7_000):
        sk.update(data[i : i + 7_000])
    assert sk.n == len(data)
    assert _rank_err(data, sk) <= 0.02
    stored = sum(len(l) for l in sk.levels)
    assert stored <= 600  # O(k log(n/k)), nowhere near n


def test_core_merge_bound_and_n():
    rng = np.random.default_rng(5)
    data = rng.normal(0, 1, 120_000)
    parts = np.array_split(data, 7)
    sks = [KLL(200) for _ in parts]
    for sk, p in zip(sks, parts):
        sk.update(p)
    acc = sks[0]
    for sk in sks[1:]:
        acc.merge(sk)
    assert acc.n == len(data)
    assert _rank_err(data, acc) <= 0.02


def test_core_nan_and_empty():
    sk = KLL(50)
    sk.update(np.array([np.nan, np.nan]))
    assert sk.n == 0
    assert np.isnan(sk.quantile(0.5))
    sk.update(np.array([1.0, np.nan, 3.0]))
    assert sk.n == 2
    assert sk.quantile(0.5) in (1.0, 3.0)


def test_core_exact_below_capacity():
    """Until the first compaction the sketch IS the data: exact answers."""
    vals = np.arange(100, dtype=float)
    sk = KLL(200)
    sk.update(vals)
    assert sk.quantile(0.5) == 49.0 or sk.quantile(0.5) == 50.0
    assert _rank_err(vals, sk) <= 1 / 100


def test_spark_pipeline_flags_and_determinism(spark):
    rows = [(f"k{i % 3}", float((i * 37) % 10_000)) for i in range(30_000)]
    df = spark.createDataFrame(rows, "key string, v double").repartition(8, "key")
    sk = kll_sketch(df, "v", key_col="key")
    est = kll_quantiles(sk, _QS)
    # exact n per key survives build + merge
    ns = {r["key"]: r["n"] for r in est.select("key", "n").distinct().collect()}
    assert ns == {"k0": 10_000, "k1": 10_000, "k2": 10_000}
    # every estimate's exact rank is within the generous oracle eps AND a
    # tight empirical one
    chk = kll_rank_check(df, "v", est, eps=0.02, key_col="key").collect()
    assert len(chk) == 3 * len(_QS)
    assert all(r["in_bound"] for r in chk)
    # same input, same partitioning -> byte-identical sketch rows
    sk2 = kll_sketch(df, "v", key_col="key")
    a = sorted(map(tuple, sk.collect()))
    b = sorted(map(tuple, sk2.collect()))
    assert a == b


def test_spark_merge_equals_any_split(spark):
    rows = [(float(i % 7_919),) for i in range(40_000)]
    df = spark.createDataFrame(rows, "v double")
    one = kll_sketch(df, "v")
    halves = kll_merge_partials(
        kll_build(df.filter(F.col("v") < 4_000), "v").unionByName(
            kll_build(df.filter(F.col("v") >= 4_000), "v")
        )
    )
    n_one = one.agg(F.sum("n")).first()[0]
    n_two = halves.agg(F.sum("n")).first()[0]
    assert n_one == n_two == 40_000
    e1 = {r["q"]: r["est"] for r in kll_quantiles(one, _QS).collect()}
    e2 = {r["q"]: r["est"] for r in kll_quantiles(halves, _QS).collect()}
    data = np.array([r[0] for r in rows])
    s = np.sort(data)
    for q in _QS:
        for est in (e1[q], e2[q]):
            rank = np.searchsorted(s, est, side="right") / len(s)
            assert abs(rank - q) <= 0.02


def test_spark_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "key string, v double"
    )
    sk = kll_sketch(df, "v", key_col="key")
    (row,) = kll_quantiles(sk, [0.5]).collect()
    assert row["n"] == 2


def test_streaming_kll_matches_batch_bound(spark, tmp_path):
    from carrot_transform_spark.streaming import quantiles as sq

    rng = np.random.default_rng(2)
    data = rng.uniform(0, 1_000, 30_000)
    import time

    base = time.time() - 1000
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, chunk in enumerate(np.array_split(data, 3)):
        df = spark.createDataFrame([(float(x),) for x in chunk], "v double")
        sub = tmp_path / f"p{i}"
        df.coalesce(1).write.parquet(str(sub))
        for f in sorted(sub.glob("*.parquet")):
            dest = feed / f"{i:02d}_{f.name}"
            f.rename(dest)
            os.utime(dest, (base + i * 10, base + i * 10))

    stream = (
        spark.readStream.format("parquet")
        .schema("v double")
        .option("maxFilesPerTrigger", 1)
        .load(str(feed))
    )
    base_dir = str(tmp_path / "kll")
    q = sq.apply_kll_stream(stream, "v", base_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = sq.read_kll(spark, base_dir)
    assert got is not None
    # state bounded: sketch rows, not data rows
    assert got.count() <= 25
    assert got.agg(F.sum("n")).first()[0] == len(data)
    est = {r["q"]: r["est"] for r in kll_quantiles(got, _QS).collect()}
    s = np.sort(data)
    for q_, e in est.items():
        rank = np.searchsorted(s, e, side="right") / len(s)
        assert abs(rank - q_) <= 0.02

    # replay with a fresh checkpoint: watermark must skip (merge is NOT
    # idempotent — a re-merge would double-count weight)
    ptr = open(os.path.join(base_dir, "_LATEST")).read()
    q2 = sq.apply_kll_stream(stream, "v", base_dir, str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    assert open(os.path.join(base_dir, "_LATEST")).read() == ptr
    got2 = sq.read_kll(spark, base_dir)
    assert got2.agg(F.sum("n")).first()[0] == len(data)
