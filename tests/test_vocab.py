"""Vocab induction + token-id encoding (operators/vocab.py)."""

from __future__ import annotations

from carrot_transform_spark.operators.vocab import build_vocab, encode_docs


def test_every_doc_emits_a_row_including_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "   "), (4, "b c")], ["doc_id", "text"]
    )
    vocab = build_vocab(docs, "text", min_freq=2)  # a(2), b(2); c is OOV
    vrows = {r["word"]: r["word_id"] for r in vocab.collect()}
    assert set(vrows) == {"a", "b"}
    out = {r["id"]: r for r in encode_docs(docs, vocab, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4}, "empty docs must not vanish"
    assert out[2]["n_tokens"] == 0 and out[2]["token_ids"] == []
    assert out[3]["n_tokens"] == 0 and out[3]["token_ids"] == []
    assert out[1]["n_tokens"] == 3 and out[1]["n_unk"] == 0
    assert out[4]["n_unk"] == 1  # c -> -1
    assert out[4]["token_ids"][1] == -1


def test_vocab_rank_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "x y y z z")], ["doc_id", "text"]
    )
    vocab = {r["word"]: r["word_id"] for r in build_vocab(docs, "text").collect()}
    # freq desc, then word asc: y(2)=1, z(2)=2, x(1)=3
    assert vocab == {"y": 1, "z": 2, "x": 3}
