"""Differential fuzz for the round-15 string/LM/eval operators
(operators/wordpiece.py, editjoin.py, ngram_lm.kn_*, hybrid.ndcg_eval /
ann_recall): random corpora and rank lists -> EXACT row equality between
the Spark operators and their DuckDB twins, plus brute-force losslessness
for the edit join.

WordPiece and the edit join are pure integer/string arithmetic, so the
equality needs no tolerance by construction; KN and nDCG use the repo's
quantize-then-decimal-sum fences. Seeds are fixed — failures reproduce."""

from __future__ import annotations

import itertools
import random

import duckdb
import pytest

_WORD_POOL = [
    "the", "cat", "cats", "sat", "mat", "mats", "matting", "dog",
    "undo", "redo", "doing", "a", "ab", "spark", "spork", "scan",
]


def _corpus(rng: random.Random, n_docs: int) -> list[tuple[int, str]]:
    return [
        (
            i,
            " ".join(
                rng.choice(_WORD_POOL) for _ in range(rng.randrange(1, 12))
            ),
        )
        for i in range(n_docs)
    ]


def _duck_docs(con, rows) -> None:
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)


@pytest.mark.parametrize("seed", range(8))
def test_wordpiece_fuzz(spark, seed):
    from carrot_transform_spark.operators.wordpiece import (
        wordpiece_encode_docs,
        wordpiece_sql,
    )

    rng = random.Random(2000 + seed)
    rows = _corpus(rng, rng.randrange(5, 30))
    min_count = rng.choice([2, 3, 5])
    max_piece = rng.choice([3, 4])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    srows = sorted(
        tuple(r)
        for r in wordpiece_encode_docs(
            df, max_piece=max_piece, min_count=min_count
        ).collect()
    )
    con = duckdb.connect()
    _duck_docs(con, rows)
    orows = sorted(
        tuple(r)
        for r in con.execute(
            wordpiece_sql(max_piece=max_piece, min_count=min_count)
        ).fetchall()
    )
    assert srows == orows, f"seed {seed}"


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


@pytest.mark.parametrize("seed", range(8))
def test_editjoin_fuzz(spark, seed):
    """Twin equality AND brute-force losslessness on the same corpus."""
    from carrot_transform_spark.operators.editjoin import (
        edit_join_words,
        edit_join_words_sql,
    )

    rng = random.Random(3000 + seed)
    rows = _corpus(rng, rng.randrange(5, 25))
    k = rng.choice([1, 2])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    srows = sorted(
        (r["a"], r["b"], r["dist"]) for r in edit_join_words(df, k=k).collect()
    )
    con = duckdb.connect()
    _duck_docs(con, rows)
    orows = sorted(
        tuple(r) for r in con.execute(edit_join_words_sql(k=k)).fetchall()
    )
    assert srows == orows, f"seed {seed}: twin mismatch"
    words = sorted(
        {w for _, t in rows for w in t.split() if w and len(w) <= 12}
    )
    brute = sorted(
        (a, b, _lev(a, b))
        for a, b in itertools.combinations(words, 2)
        if _lev(a, b) <= k
    )
    assert srows == brute, f"seed {seed}: blocking lost pairs"


@pytest.mark.parametrize("seed", range(6))
def test_kn_fuzz(spark, seed):
    from carrot_transform_spark.operators.ngram_lm import kn_nll_docs, kn_nll_sql

    rng = random.Random(4000 + seed)
    rows = _corpus(rng, rng.randrange(5, 25))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    srows = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_nll"])
        for r in kn_nll_docs(df).collect()
    )
    con = duckdb.connect()
    _duck_docs(con, rows)
    orows = sorted(tuple(r) for r in con.execute(kn_nll_sql()).fetchall())
    assert srows == orows, f"seed {seed}"


@pytest.mark.parametrize("seed", range(6))
def test_ndcg_fuzz(spark, seed):
    from carrot_transform_spark.operators.hybrid import ndcg_eval, ndcg_eval_sql

    rng = random.Random(5000 + seed)
    n_q = rng.randrange(1, 5)
    k = rng.randrange(2, 8)
    runs = {}
    for name in ("s1", "s2")[: rng.randrange(1, 3)]:
        rows = []
        for qid in range(n_q):
            docs = rng.sample(range(20), k=rng.randrange(1, 8))
            rows.extend((qid, d, i + 1) for i, d in enumerate(docs))
        runs[name] = rows
    qrels = []
    for qid in range(n_q):
        rel = rng.sample(range(20), k=rng.randrange(1, 4))
        qrels.extend((qid, d, rng.randrange(1, 4)) for d in rel)

    sruns = {
        n: spark.createDataFrame(r, "qid long, doc long, rnk int")
        for n, r in runs.items()
    }
    sq = spark.createDataFrame(qrels, "qid long, rel_doc long, grade int")
    srows = sorted(tuple(r) for r in ndcg_eval(sruns, sq, k=k).collect())

    con = duckdb.connect()
    for n, r in runs.items():
        con.execute(f"CREATE TABLE fz_{n} (qid BIGINT, doc BIGINT, rnk INT)")
        con.executemany(f"INSERT INTO fz_{n} VALUES (?, ?, ?)", r)
    con.execute("CREATE TABLE fz_qr (qid BIGINT, rel_doc BIGINT, grade INT)")
    con.executemany("INSERT INTO fz_qr VALUES (?, ?, ?)", qrels)
    orows = sorted(
        tuple(r)
        for r in con.execute(
            ndcg_eval_sql(
                {n: f"SELECT * FROM fz_{n}" for n in runs},
                "SELECT * FROM fz_qr",
                k=k,
            )
        ).fetchall()
    )
    assert srows == orows, f"seed {seed}"


@pytest.mark.parametrize("seed", range(6))
def test_kn3_fuzz(spark, seed):
    from carrot_transform_spark.operators.ngram_lm import kn3_nll_docs, kn3_nll_sql

    rng = random.Random(6000 + seed)
    rows = _corpus(rng, rng.randrange(5, 25))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    srows = sorted(
        (r["doc_id"], r["n_trigrams"], r["avg_nll"])
        for r in kn3_nll_docs(df).collect()
    )
    con = duckdb.connect()
    _duck_docs(con, rows)
    orows = sorted(tuple(r) for r in con.execute(kn3_nll_sql()).fetchall())
    assert srows == orows, f"seed {seed}"
