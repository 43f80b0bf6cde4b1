"""Streaming near-dup index maintenance (streaming/dedup_index.py).

Invariants under test:
1. Union of per-micro-batch pair outputs == from-scratch full-corpus pairs
   (each pair discovered exactly once, when its later member arrives).
2. The maintained store equals a one-shot index over the full corpus.
3. Replaying an already-committed batch is a full no-op (exactly-once).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.dedup import (
    load_minhash_index,
    minhash_index_frames,
    minhash_index_units,
    minhash_lsh_dedup,
)
from carrot_transform_spark.streaming.dedup_index import maintain_neardup_index


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("compact_every", [None, 2])
def test_stream_equals_batch(docs, tmp_path, compact_every):
    """Feed the corpus as 3 micro-batches; pairs union and final store must
    match the one-shot batch run — with and without in-flight auto
    compaction (compact_every=2 folds mid-stream, so batch 3 runs against
    a compacted base)."""
    spark = docs.sparkSession
    feed = tmp_path / "feed"
    for i in range(3):  # one file per micro-batch (maxFilesPerTrigger=1)
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(feed / f"part{i}"))
    # the file source needs a flat dir of files
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil

    for i in range(3):
        src = next((feed / f"part{i}").glob("part-*.parquet"))
        shutil.copy(src, flat / f"{i:02d}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    q = maintain_neardup_index(
        stream,
        store_dir=str(tmp_path / "store"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        compact_every=compact_every,
    )
    q.awaitTermination(300)

    got_pairs = (
        spark.read.parquet(str(tmp_path / "pairs" / "s*"))
        .select("id_a", "id_b", "jaccard")
    )
    expected = minhash_lsh_dedup(docs, "doc_id", "text")
    assert _rows(got_pairs) == _rows(expected)
    assert len(_rows(got_pairs)) > 0, "corpus has near-dups; empty result is vacuous"

    got_bands, got_index = load_minhash_index(spark, str(tmp_path / "store"))
    full_bands, full_index = minhash_index_frames(docs, "doc_id", "text")
    assert _rows(got_bands) == _rows(full_bands)
    assert _rows(got_index) == _rows(full_index)
    n_units = len(minhash_index_units(spark, str(tmp_path / "store")))
    # compaction folds units but never changes contents (asserted above):
    # with compact_every=2 each batch that brings the store to 2 live units
    # immediately folds them, so the stream ends at 1
    assert n_units == (1 if compact_every else 3)


def test_replay_after_compaction_is_noop(docs, tmp_path):
    """Crash-replay a batch whose store unit an in-flight compaction has
    already retired. Driven through the protocol's step function directly
    (make_step) — Spark's checkpoint manager flags out-of-band commit-log
    edits as concurrent access, so the crash can't be simulated through
    the engine. The applied() guard must detect the retired unit and
    no-op; the regression was a replay computing corrupted pairs against
    a store containing its own data, then dying on the retired-name
    re-commit."""
    from carrot_transform_spark.operators.dedup import minhash_index_store
    from carrot_transform_spark.streaming.dedup_index import neardup_step
    from carrot_transform_spark.streaming.maintenance import make_step

    spark = docs.sparkSession
    store_dir = str(tmp_path / "store")
    step = make_step(
        lambda: minhash_index_store(spark, store_dir),
        neardup_step(spark, str(tmp_path / "pairs")),
        compact_every=1,  # every batch's unit is retired immediately
    )
    halves = [docs.filter(F.col("doc_id") % 2 == i) for i in range(2)]
    step(halves[0], 0)
    step(halves[1], 1)
    assert minhash_index_units(spark, store_dir) == ["c1"]  # s0, s1 retired

    units1 = minhash_index_units(spark, store_dir)
    pairs_df = spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
        "id_a", "id_b", "jaccard"
    )
    pairs1 = _rows(pairs_df)

    step(halves[1], 1)  # crash-replay of the retired batch -> full no-op
    assert minhash_index_units(spark, store_dir) == units1
    assert _rows(
        spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
            "id_a", "id_b", "jaccard"
        )
    ) == pairs1
    # and the streamed results still match the one-shot batch run
    expected = minhash_lsh_dedup(docs, "doc_id", "text").select(
        "id_a", "id_b", "jaccard"
    )
    assert pairs1 == _rows(expected)


def test_restart_is_noop(docs, tmp_path):
    """Restarting the stream over the same checkpoint adds no units and
    leaves the pairs dirs unchanged."""
    spark = docs.sparkSession
    flat = tmp_path / "flat"
    flat.mkdir()
    docs.limit(50).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    import shutil

    shutil.copy(
        next((tmp_path / "one").glob("part-*.parquet")), flat / "00.parquet"
    )

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id bigint, text string")
            .load(str(flat))
        )
        q = maintain_neardup_index(
            stream,
            store_dir=str(tmp_path / "store"),
            pairs_dir=str(tmp_path / "pairs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(300)

    run()
    units1 = minhash_index_units(spark, str(tmp_path / "store"))
    pairs1 = _rows(spark.read.parquet(str(tmp_path / "pairs" / "s*")))
    run()  # availableNow restart: no new data, and replay would be a no-op
    assert minhash_index_units(spark, str(tmp_path / "store")) == units1
    assert _rows(spark.read.parquet(str(tmp_path / "pairs" / "s*"))) == pairs1
