"""Incremental exact-dup fingerprint store (operators/fingerprints.py).

Contract: feeding a corpus through any sequence of batches admits exactly
one id per distinct text — the first seen (min id within the first batch
containing it) — and flags every other row with the canonical id it
duplicates. Matches the one-shot exact_dedup_groups canon on the same
rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators.dedup import exact_dedup_groups
from carrot_transform_spark.operators.fingerprints import (
    fingerprint_store,
    update_fingerprint_store,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "lazy dog sleeps"),
        (3, "The Quick  Brown Fox "),  # exact-dup of 1 after canonicalization? (case/trim only)
        (4, "unique text four"),
        (5, "lazy dog sleeps"),
        (6, "the quick brown fox"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_within_and_cross_batch_dedup(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "fp")
    # batch 1: ids 1-3; batch 2: ids 4-6
    r1 = update_fingerprint_store(path, docs.filter("doc_id <= 3"), "doc_id", "text")
    r2 = update_fingerprint_store(path, docs.filter("doc_id > 3"), "doc_id", "text")
    got = {r["id"]: r["dup_of"] for r in r1.unionByName(r2).collect()}
    # note: md5(lower(trim(text))) — doc 3 differs by INNER whitespace, so
    # it is NOT an exact dup of 1 under this rule
    assert got == {1: None, 2: None, 3: None, 4: None, 5: 2, 6: 1}

    stored = fingerprint_store(spark, path).load("fingerprints")
    assert stored.count() == 4  # four distinct admitted texts
    # store canon matches the one-shot batch operator on the full corpus
    one_shot = exact_dedup_groups(docs, "doc_id", "text").select(
        "fingerprint", F.col("canonical_id").cast("long").alias("canonical_id")
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_streaming_maintainer_matches_batch(spark, tmp_path):
    """Stream the corpus in micro-batches: decisions over all steps must
    equal the sequential batch updates, and the final store must hold one
    canon per distinct text."""
    import shutil

    import pyspark.sql.functions as F2

    from carrot_transform_spark.streaming.fingerprint_index import (
        maintain_fingerprint_store,
    )

    docs = _docs(spark)
    flat = tmp_path / "flat"
    flat.mkdir()
    for i, cond in enumerate(["doc_id <= 3", "doc_id > 3"]):
        part = tmp_path / f"p{i}"
        docs.filter(cond).coalesce(1).write.mode("overwrite").parquet(str(part))
        shutil.copy(next(part.glob("part-*.parquet")), flat / f"{i:02d}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    q = maintain_fingerprint_store(
        stream,
        store_dir=str(tmp_path / "store"),
        decisions_dir=str(tmp_path / "dec"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    dec = spark.read.parquet(str(tmp_path / "dec" / "s*"))
    got = {r["id"]: r["dup_of"] for r in dec.collect()}
    assert got == {1: None, 2: None, 3: None, 4: None, 5: 2, 6: 1}
    stored = fingerprint_store(spark, str(tmp_path / "store")).load("fingerprints")
    one_shot = exact_dedup_groups(docs, "doc_id", "text").select(
        "fingerprint", F2.col("canonical_id").cast("long").alias("canonical_id")
    )
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_replay_unit_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "fp")
    update_fingerprint_store(path, docs.filter("doc_id <= 3"), "doc_id", "text", unit="s0")
    n1 = fingerprint_store(spark, path).load("fingerprints").count()
    # replay the same batch under the same unit name: same store state
    update_fingerprint_store(path, docs.filter("doc_id <= 3"), "doc_id", "text", unit="s0")
    assert fingerprint_store(spark, path).load("fingerprints").count() == n1
