"""Streaming edit-join index maintenance (streaming/editjoin_index.py).

Invariants under test:
1. Union of per-micro-batch pair outputs == from-scratch full-corpus
   edit_join (each pair discovered exactly once, when its later member
   arrives) — with and without in-flight compaction.
2. The maintained store equals a one-shot frozen-rank index over the full
   corpus (ranks frozen by the bootstrap batch).
3. Replaying an already-committed batch is a full no-op (exactly-once).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.editjoin import (
    edit_join,
    edit_prefix_index,
)
from carrot_transform_spark.streaming.editjoin_index import (
    edit_index_store,
    edit_index_units,
    editjoin_step,
    load_edit_index,
    maintain_edit_index,
)
from carrot_transform_spark.streaming.maintenance import make_step

_K = 1


@pytest.fixture(scope="module")
def names(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("key"), F.col("c_name").alias("s"))
        .persist()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("compact_every", [None, 2])
def test_stream_equals_batch(names, tmp_path, compact_every):
    spark = names.sparkSession
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil

    for i in range(3):
        part = tmp_path / f"part{i}"
        names.filter(F.col("key") % 3 == i).select("s").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        src = next(part.glob("part-*.parquet"))
        shutil.copy(src, flat / f"{i:02d}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema("s string")
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    q = maintain_edit_index(
        stream,
        store_dir=str(tmp_path / "store"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=_K,
        compact_every=compact_every,
    )
    q.awaitTermination(300)

    got_pairs = spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
        "a", "b", "dist"
    )
    expected = edit_join(names.select("s"), k=_K)
    assert _rows(got_pairs) == _rows(expected)
    assert len(_rows(got_pairs)) > 0, "corpus has close names; empty is vacuous"

    # store == one-shot frozen-rank index over the full corpus: ranks were
    # frozen by whichever batch ran first (batch 0 here)
    got_str, got_idx, got_ranks = load_edit_index(spark, str(tmp_path / "store"))
    assert _rows(got_str.select("s")) == _rows(names.select("s").distinct())
    full_idx = edit_prefix_index(names.select("s").distinct(), got_ranks, k=_K)
    assert _rows(got_idx) == _rows(full_idx)
    n_units = len(edit_index_units(spark, str(tmp_path / "store")))
    assert n_units == (1 if compact_every else 3)


def test_replay_is_noop(names, tmp_path):
    """Drive make_step directly (the tested replay surface): re-running a
    committed batch id must change neither the store nor the pairs."""
    spark = names.sparkSession
    pairs_dir = str(tmp_path / "pairs")
    store_dir = str(tmp_path / "store")
    step = make_step(
        lambda: edit_index_store(spark, store_dir),
        editjoin_step(spark, pairs_dir, k=_K),
    )
    b0 = names.filter(F.col("key") % 2 == 0).select("s")
    b1 = names.filter(F.col("key") % 2 == 1).select("s")
    step(b0, 0)
    step(b1, 1)
    before_pairs = _rows(spark.read.parquet(f"{pairs_dir}/s*"))
    before_idx = _rows(load_edit_index(spark, store_dir)[1])
    step(b1, 1)  # replay
    assert _rows(spark.read.parquet(f"{pairs_dir}/s*")) == before_pairs
    assert _rows(load_edit_index(spark, store_dir)[1]) == before_idx
    assert edit_index_units(spark, store_dir) == ["s0", "s1"]
