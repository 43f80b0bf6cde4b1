"""Bigram-LM perplexity scoring (operators/ngram_lm.py).

Verified three independent ways: a pure-Python reference model on a
hand-sized corpus (exact counts, exact smoothed probabilities), the
DuckDB twin row-for-row on real test data, and structural properties
(repetitive text scores lower NLL than shuffled gibberish of the same
vocabulary — the property the filter exists to exploit)."""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest

from carrot_transform_spark.operators.ngram_lm import (
    DEFAULT_ALPHA,
    bigram_counts,
    bigram_nll_docs,
    bigram_nll_sql,
    score_bigram_nll,
    vocab_size,
)


def py_bigram_nll(docs: dict[int, str], alpha: float = DEFAULT_ALPHA):
    toks = {i: [w for w in t.split() if w] for i, t in docs.items()}
    bi: Counter = Counter()
    vocab = set()
    for ws in toks.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    ctx: Counter = Counter()
    for (a, _), n in bi.items():
        ctx[a] += n
    v = len(vocab)
    out = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        nll = [
            -math.log((bi[(a, b)] + alpha) / (ctx[a] + alpha * v))
            for a, b in pairs
        ]
        out[i] = (len(pairs), sum(nll) / len(pairs))
    return out


def test_matches_python_reference(spark):
    rng = random.Random(11)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    docs = {
        i: " ".join(rng.choice(words) for _ in range(rng.randint(0, 14)))
        for i in range(25)
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_nll_docs(df).collect()
    }
    want = py_bigram_nll(docs)
    assert set(got) == set(want)  # <2-token docs emit nothing in both
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-9)


def test_counts_and_vocab(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "b c")], "doc_id long, text string"
    )
    bi = {(r["w1"], r["w2"]): r["n"] for r in bigram_counts(df).collect()}
    assert bi == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 2}
    assert vocab_size(df) == 3


def test_fluent_beats_gibberish(spark):
    """The filter's raison d'etre: text with repeated collocations scores
    lower average NLL than a shuffle of the same tokens."""
    rng = random.Random(5)
    fluent = " ".join(["the cat sat on the mat"] * 20)
    toks = fluent.split()
    rng.shuffle(toks)
    df = spark.createDataFrame(
        [(0, fluent), (1, " ".join(toks))], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["avg_nll"] for r in bigram_nll_docs(df).collect()}
    assert got[0] < got[1]


def test_score_new_docs_against_trained_lm(spark):
    """Novel contexts/bigrams degrade to the smoothed floor, never error."""
    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    bi = bigram_counts(train)
    v = vocab_size(train)
    new = spark.createDataFrame([(9, "z z a b")], "doc_id long, text string")
    (row,) = score_bigram_nll(new, bi, v).collect()
    assert row["n_bigrams"] == 3
    # (z,z): c=0, ctx=0 -> -ln(a/(a*v)) = ln(v); (a,b): c=2, ctx=2
    a = DEFAULT_ALPHA
    want = (
        2 * -math.log(a / (a * v)) + -math.log((2 + a) / (2 + a * v))
    ) / 3
    assert row["avg_nll"] == pytest.approx(want, abs=1e-9)


def test_sql_twin_matches_spark(spark):
    sf_dir = "/root/testdata/sf0.001"
    import pyspark.sql.functions as F

    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_nll_docs(d).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = {r[0]: (r[1], r[2]) for r in con.sql(bigram_nll_sql()).fetchall()}
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-12)
