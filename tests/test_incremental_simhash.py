"""Incremental SimHash index (operators/dedup.py simhash incremental_*).

Same contract as the MinHash twin: a batch against the persisted
signature store yields exactly the from-scratch full-corpus Hamming pairs
restricted to batch-touching pairs; the store accumulates to the one-shot
signature set; replay under the same unit name is idempotent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.dedup import (
    hamming_pairs,
    simhash_index_store,
    simhash_signatures,
    update_simhash_index,
)

_MOD = 5
_DIST, _PREFIX = 16, 16  # generous distance so sf0.001 yields pairs


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _full_restricted(docs):
    sig = simhash_signatures(docs, "doc_id", "text")
    full = hamming_pairs(sig, max_distance=_DIST, prefix_bits=_PREFIX)
    return full.filter((F.col("id_a") % _MOD == 0) | (F.col("id_b") % _MOD == 0))


def test_incremental_equals_full_restricted(docs, tmp_path):
    path = str(tmp_path / "sh")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    update_simhash_index(path, base, "doc_id", "text", max_distance=_DIST,
                         prefix_bits=_PREFIX, unit="base")
    pairs = update_simhash_index(path, batch, "doc_id", "text",
                                 max_distance=_DIST, prefix_bits=_PREFIX)
    # the base step also emits base-internal pairs; only the batch step is
    # under test here
    expected = _full_restricted(docs)
    assert _rows(pairs) == _rows(expected)
    assert len(_rows(pairs)) > 0, "no pairs at this distance; test is vacuous"

    # store == one-shot signatures over the full corpus
    stored = simhash_index_store(docs.sparkSession, path).load("sigs")
    one_shot = simhash_signatures(docs, "doc_id", "text")
    assert _rows(stored) == _rows(one_shot)


def test_replay_same_unit_idempotent(docs, tmp_path):
    path = str(tmp_path / "sh")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    update_simhash_index(path, base, "doc_id", "text", unit="base",
                         max_distance=_DIST, prefix_bits=_PREFIX)
    first = _rows(update_simhash_index(path, batch, "doc_id", "text", unit="s1",
                                       max_distance=_DIST, prefix_bits=_PREFIX))
    replay = _rows(update_simhash_index(path, batch, "doc_id", "text", unit="s1",
                                        max_distance=_DIST, prefix_bits=_PREFIX))
    assert replay == first
    stored = simhash_index_store(docs.sparkSession, path).load("sigs")
    assert stored.count() == docs.count()


def test_metadata_survives_store_round_trip(docs, tmp_path):
    """The simhash_bits column metadata must survive parquet + union, or
    hamming blocking would fall back to the loud failure path."""
    path = str(tmp_path / "sh")
    update_simhash_index(path, docs.limit(50), "doc_id", "text", unit="base")
    stored = simhash_index_store(docs.sparkSession, path).load("sigs")
    # no bits= passed: must resolve from metadata without raising
    hamming_pairs(stored, max_distance=4).count()


def test_streaming_maintainer_matches_batch(docs, tmp_path):
    """Union of per-micro-batch pair outputs == full-corpus hamming pairs;
    final store == one-shot signatures."""
    import shutil

    from carrot_transform_spark.streaming.dedup_index import maintain_simhash_index

    spark = docs.sparkSession
    flat = tmp_path / "flat"
    flat.mkdir()
    for i in range(3):
        part = tmp_path / f"p{i}"
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        shutil.copy(next(part.glob("part-*.parquet")), flat / f"{i:02d}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    q = maintain_simhash_index(
        stream,
        store_dir=str(tmp_path / "store"),
        pairs_dir=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_distance=_DIST,
        prefix_bits=_PREFIX,
        compact_every=2,
    )
    q.awaitTermination(300)

    got = spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
        "id_a", "id_b", "hamming"
    )
    sig = simhash_signatures(docs, "doc_id", "text")
    expected = hamming_pairs(sig, max_distance=_DIST, prefix_bits=_PREFIX)
    assert _rows(got) == _rows(expected)
    assert len(_rows(got)) > 0
    stored = simhash_index_store(spark, str(tmp_path / "store")).load("sigs")
    assert _rows(stored) == _rows(sig)
