"""Incremental MinHash index maintenance (operators/dedup.py incremental_*).

Contract under test: running a NEW batch against a persisted LSH index built
from the base corpus yields exactly the from-scratch full-corpus near-dup
pairs restricted to pairs with >= 1 batch member — without re-scanning the
base corpus text — and appending the batch leaves the store equal to an
index built from the full corpus in one shot.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.dedup import (
    incremental_candidate_pairs,
    jaccard_verify,
    load_minhash_index,
    lsh_bands,
    minhash_index_frames,
    minhash_lsh_dedup,
    minhash_signatures,
    save_minhash_index,
    update_minhash_index,
)

_MOD = 5  # doc_id % 5 == 0 -> batch


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def _full_pairs(docs):
    return minhash_lsh_dedup(docs, "doc_id", "text").withColumnsRenamed(
        {"id_a": "doc_a", "id_b": "doc_b"}
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_full_restricted(docs):
    """Frame-level incremental path == full-corpus pairs touching the batch."""
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    base_bands, base_index = minhash_index_frames(base, "doc_id", "text")
    b_bands, b_index = minhash_index_frames(batch, "doc_id", "text")
    cand = incremental_candidate_pairs(b_bands, base_bands)
    inc = jaccard_verify(cand, base_index.unionByName(b_index), threshold=0.7)

    full = _full_pairs(docs)
    expected = full.filter(
        (F.col("doc_a") % _MOD == 0) | (F.col("doc_b") % _MOD == 0)
    ).select("doc_a", "doc_b", "jaccard")
    got = inc.select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "jaccard"
    )
    assert _rows(got) == _rows(expected)
    assert len(_rows(got)) > 0, "split produced no cross-batch near-dups; test is vacuous"


def test_disk_round_trip_and_append(docs, tmp_path):
    """save -> update(batch) returns the same pairs AND the appended store
    equals a from-scratch full-corpus index (same band rows, same shingle
    rows)."""
    spark = docs.sparkSession
    path = str(tmp_path / "mh_index")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)

    base_bands, base_index = minhash_index_frames(base, "doc_id", "text")
    save_minhash_index(base_bands, base_index, path)

    pairs = update_minhash_index(path, batch, "doc_id", "text")
    expected = (
        _full_pairs(docs)
        .filter((F.col("doc_a") % _MOD == 0) | (F.col("doc_b") % _MOD == 0))
        .select("doc_a", "doc_b", "jaccard")
    )
    assert _rows(pairs) == _rows(expected)

    # the appended store must equal the one-shot full-corpus index
    got_bands, got_index = load_minhash_index(spark, path)
    full_bands, full_index = minhash_index_frames(docs, "doc_id", "text")
    assert _rows(got_bands) == _rows(full_bands)
    assert _rows(got_index) == _rows(full_index)


def test_update_is_checkpointed_before_append(docs, tmp_path):
    """The returned pairs frame must be safe to materialize AFTER the append
    (lineage cut): re-counting it post-append gives the same rows, not a
    double-counted re-read of the mutated store."""
    path = str(tmp_path / "mh_index")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    save_minhash_index(*minhash_index_frames(base, "doc_id", "text"), path)
    pairs = update_minhash_index(path, batch, "doc_id", "text")
    first = _rows(pairs)
    assert _rows(pairs) == first


def test_update_replay_same_unit_idempotent(docs, tmp_path):
    """Re-running an update under the same unit name must reproduce the
    SAME pairs and store state — the replay must see the pre-unit store,
    or the batch's own stored shingles double every intersection count."""
    path = str(tmp_path / "mh_index")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    save_minhash_index(*minhash_index_frames(base, "doc_id", "text"), path)
    first = _rows(update_minhash_index(path, batch, "doc_id", "text", unit="s1"))
    replay = _rows(update_minhash_index(path, batch, "doc_id", "text", unit="s1"))
    assert replay == first
    got_bands, _ = load_minhash_index(docs.sparkSession, path)
    full_bands, _ = minhash_index_frames(docs, "doc_id", "text")
    assert _rows(got_bands) == _rows(full_bands)


def test_lookup_is_readonly(docs, tmp_path):
    """lookup_minhash_index returns the same pairs an update would, without
    committing anything to the store."""
    from carrot_transform_spark.operators.dedup import (
        lookup_minhash_index,
        minhash_index_store,
    )

    spark = docs.sparkSession
    path = str(tmp_path / "mh_index")
    base = docs.filter(F.col("doc_id") % _MOD != 0)
    batch = docs.filter(F.col("doc_id") % _MOD == 0)
    save_minhash_index(*minhash_index_frames(base, "doc_id", "text"), path)
    units_before = minhash_index_store(spark, path).units()
    pairs = lookup_minhash_index(path, batch, "doc_id", "text")
    expected = (
        _full_pairs(docs)
        .filter((F.col("doc_a") % _MOD == 0) | (F.col("doc_b") % _MOD == 0))
        .select("doc_a", "doc_b", "jaccard")
    )
    assert _rows(pairs) == _rows(expected)
    assert minhash_index_store(spark, path).units() == units_before


def test_compaction_transparent_to_updates(docs, tmp_path):
    """Compacting the store between updates changes nothing downstream:
    the next batch's pairs and the final index still equal the one-shot."""
    from carrot_transform_spark.operators.dedup import minhash_index_store

    spark = docs.sparkSession
    path = str(tmp_path / "mh_index")
    third = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    save_minhash_index(*minhash_index_frames(third[0], "doc_id", "text"), path)
    update_minhash_index(path, third[1], "doc_id", "text")
    store = minhash_index_store(spark, path)
    replaced = store.compact("c0")
    store.vacuum(replaced)
    pairs = update_minhash_index(path, third[2], "doc_id", "text")
    expected = _full_pairs(docs).filter(
        (F.col("doc_a") % 3 == 2) | (F.col("doc_b") % 3 == 2)
    ).select("doc_a", "doc_b", "jaccard")
    assert _rows(pairs) == _rows(expected)
    got_bands, got_index = load_minhash_index(spark, path)
    full_bands, full_index = minhash_index_frames(docs, "doc_id", "text")
    assert _rows(got_bands) == _rows(full_bands)
    assert _rows(got_index) == _rows(full_index)


def test_disjoint_batch_yields_no_pairs(spark, tmp_path):
    """A batch with no shingles in common with the index and no internal
    dups returns zero pairs and still appends cleanly."""
    path = str(tmp_path / "mh_index")
    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(2, "one two three four five six seven eight")], ["doc_id", "text"]
    )
    save_minhash_index(*minhash_index_frames(base, "doc_id", "text"), path)
    pairs = update_minhash_index(path, batch, "doc_id", "text")
    assert pairs.count() == 0
    got_bands, _ = load_minhash_index(spark, path)
    assert got_bands.select("id").distinct().count() == 2
