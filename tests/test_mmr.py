"""MMR diversification (operators/mmr.py): hand-computed greedy picks on
a tiny candidate set (the near-dup demotion case), lam=1 degeneration to
pure relevance order, short candidate lists, and the chained-CTE DuckDB
twin on in-memory tables."""

from __future__ import annotations

import duckdb

from carrot_transform_spark.operators.mmr import mmr_rerank, mmr_sql

# qid 1: doc 10 (rel .9) and doc 11 (rel .85) are near-dups (sim .95);
# doc 12 (rel .5) is distinct (sim .1 to both).
_CAND = [(1, 10, 0.9), (1, 11, 0.85), (1, 12, 0.5)]
_PAIRS = [
    (1, 10, 11, 0.95),
    (1, 11, 10, 0.95),
    (1, 10, 12, 0.1),
    (1, 12, 10, 0.1),
    (1, 11, 12, 0.1),
    (1, 12, 11, 0.1),
]


def _frames(spark):
    cand = spark.createDataFrame(_CAND, "qid long, doc long, rel double")
    pairs = spark.createDataFrame(_PAIRS, "qid long, doc_a long, doc_b long, sim double")
    return cand, pairs


def test_mmr_demotes_near_dup(spark):
    cand, pairs = _frames(spark)
    out = sorted(
        (r["step"], r["doc"], r["mmr_score"])
        for r in mmr_rerank(cand, pairs, lam=0.5, k=3).collect()
    )
    # step 1: doc 10 (top rel). step 2: doc 11 scores .5*.85-.5*.95 = -.05,
    # doc 12 scores .5*.5-.5*.1 = .2 -> the DISTINCT doc wins despite lower
    # rel. step 3: doc 11 at -.05.
    assert out[0] == (1, 10, 0.9)
    assert out[1][1] == 12 and abs(out[1][2] - 0.2) < 1e-9
    assert out[2][1] == 11 and abs(out[2][2] - (-0.05)) < 1e-9


def test_mmr_lam1_is_pure_relevance(spark):
    cand, pairs = _frames(spark)
    out = {r["step"]: r["doc"] for r in mmr_rerank(cand, pairs, lam=1.0, k=3).collect()}
    assert out == {1: 10, 2: 11, 3: 12}


def test_mmr_short_candidate_list(spark):
    cand, pairs = _frames(spark)
    out = mmr_rerank(cand, pairs, lam=0.5, k=10).collect()
    assert len(out) == 3  # only 3 candidates exist; no padding rows


def test_mmr_tie_breaks_on_doc(spark):
    cand = spark.createDataFrame(
        [(1, 7, 0.5), (1, 3, 0.5)], "qid long, doc long, rel double"
    )
    pairs = spark.createDataFrame(
        [(1, 7, 3, 0.0), (1, 3, 7, 0.0)], "qid long, doc_a long, doc_b long, sim double"
    )
    out = {r["step"]: r["doc"] for r in mmr_rerank(cand, pairs, lam=0.7, k=2).collect()}
    assert out == {1: 3, 2: 7}


def test_mmr_duckdb_twin(spark):
    cand, pairs = _frames(spark)
    srows = sorted(
        (r["qid"], r["doc"], r["step"], r["mmr_score"])
        for r in mmr_rerank(cand, pairs, lam=0.7, k=3).collect()
    )
    con = duckdb.connect()
    cvals = ", ".join(f"({q},{d},{r})" for q, d, r in _CAND)
    pvals = ", ".join(f"({q},{a},{b},{s})" for q, a, b, s in _PAIRS)
    con.execute(
        f"CREATE TABLE mcand AS SELECT qid, doc, CAST(rel AS DOUBLE) AS rel "
        f"FROM (VALUES {cvals}) t(qid, doc, rel)"
    )
    con.execute(
        f"CREATE TABLE mpairs AS SELECT qid, doc_a, doc_b, CAST(sim AS DOUBLE) AS sim "
        f"FROM (VALUES {pvals}) t(qid, doc_a, doc_b, sim)"
    )
    orows = sorted(
        (r[0], r[1], r[2], r[3])
        for r in con.execute(
            mmr_sql("SELECT * FROM mcand", "SELECT * FROM mpairs", lam=0.7, k=3)
        ).fetchall()
    )
    assert srows == orows
