"""End-to-end training-data pipeline over the documents table: the stages
compose as a user would chain them, with conservation laws asserted at
every hand-off.

    jsonl source -> quality filter -> exact-dup fingerprint store
        -> incremental near-dup lookup -> chunk -> pack -> vocab encode
        -> jsonl sink

Each stage is already oracle- or unit-verified in isolation; this test
pins the CONTRACTS BETWEEN them (id sets, row conservation, filter
monotonicity) so a signature/semantic drift in any stage breaks loudly
here rather than in a downstream notebook.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.chunking import chunk_token_windows, pack_chunks
from carrot_transform_spark.operators.dedup import (
    minhash_index_frames,
    minhash_lsh_dedup,
    save_minhash_index,
)
from carrot_transform_spark.operators.fingerprints import update_fingerprint_store
from carrot_transform_spark.operators.quality import quality_filter_chain
from carrot_transform_spark.operators.vocab import build_vocab, encode_docs
from carrot_transform_spark.sinks.tsv import make_sink
from carrot_transform_spark.sources.registry import make_source


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )


def test_full_pipeline(spark, corpus, tmp_path):
    n_in = corpus.count()

    # 0. land the corpus as JSONL and re-enter through the jsonl source
    #    (the interchange step real pipelines start from)
    jdir = tmp_path / "in"
    make_sink(spark, f"jsonl:{jdir}").write("docs", corpus, ["doc_id", "text"])
    docs = (
        make_source(spark, f"jsonl:{jdir}")
        .read("docs.jsonl")
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )
    assert docs.count() == n_in

    # 1. quality filter: every doc gets a verdict; keep the passers
    q = quality_filter_chain(docs, min_tokens=5, max_tokens=10_000)
    assert q.count() == n_in
    kept = docs.join(
        q.filter(F.col("keep") == 1).select(F.col("doc").alias("doc_id")), "doc_id"
    )
    n_kept = kept.count()
    assert 0 < n_kept <= n_in

    # 2. exact dedup through the fingerprint store
    decisions = update_fingerprint_store(
        str(tmp_path / "fp"), kept, "doc_id", "text"
    )
    assert decisions.count() == n_kept
    exact_unique = kept.join(
        decisions.filter(F.col("dup_of").isNull()).select(F.col("id").alias("doc_id")),
        "doc_id",
    )
    n_unique = exact_unique.count()
    assert 0 < n_unique <= n_kept

    # 3. near-dup pass: drop the GREATER id of each verified pair
    pairs = minhash_lsh_dedup(exact_unique, "doc_id", "text")
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    clean = exact_unique.join(drop, "doc_id", "anti")
    n_clean = clean.count()
    assert n_clean == n_unique - drop.count()
    # seed the incremental index for the NEXT batch (contract smoke)
    save_minhash_index(*minhash_index_frames(clean, "doc_id", "text"), str(tmp_path / "mh"))

    # 4. chunk + pack: token conservation per doc
    chunks = chunk_token_windows(clean, "doc_id", "text", size=32, overlap=8)
    assert chunks.select("id").distinct().count() == n_clean
    packed = pack_chunks(chunks, id_col="id", budget=64)
    assert packed.count() == chunks.count()  # packing reassigns, never drops

    # 5. vocab + encode: one row per clean doc, token counts match the
    #    whitespace tokenization the chunker used
    vocab = build_vocab(clean, "text", min_freq=2)
    enc = encode_docs(clean, vocab, "doc_id", "text")
    assert enc.count() == n_clean
    tok_direct = clean.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
    )
    mismatch = (
        enc.join(tok_direct, "id")
        .filter(F.col("n_tokens") != F.col("n"))
        .count()
    )
    assert mismatch == 0

    # 6. ship: encoded rows out as JSONL, readable round-trip
    out = enc.select("id", "n_tokens", "n_unk", F.to_json("token_ids").alias("ids"))
    make_sink(spark, f"jsonl:{tmp_path / 'out'}").write("encoded", out, list(out.columns))
    back = spark.read.json(str(tmp_path / "out" / "encoded.jsonl"))
    assert back.count() == n_clean
    row = back.filter(F.col("n_tokens") > 0).first()
    assert len(json.loads(row["ids"])) == row["n_tokens"]
