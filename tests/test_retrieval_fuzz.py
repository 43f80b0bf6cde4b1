"""Differential fuzz for the retrieval stack (operators/hybrid.py,
operators/mmr.py): random rank lists / candidate sets / pair sims ->
EXACT row equality between the Spark operators and their DuckDB twins.

Values are generated pre-quantized (multiples of 1e-6, the operators'
fround scale), so both engines start from identical doubles and every
comparison below is ==, not tolerance. Seeds are fixed — failures
reproduce."""

from __future__ import annotations

import random

import duckdb
import pytest

from carrot_transform_spark.operators.hybrid import rrf_fuse, rrf_sql
from carrot_transform_spark.operators.mmr import mmr_rerank, mmr_sql


def _q6(rng: random.Random) -> float:
    return rng.randrange(0, 1_000_001) / 1e6


def _rank_list(rng: random.Random, n_q: int, depth: int) -> list[tuple[int, int, int]]:
    rows = []
    for qid in range(n_q):
        docs = rng.sample(range(depth * 3), k=rng.randrange(1, depth + 1))
        rows.extend((qid, doc, i + 1) for i, doc in enumerate(docs))
    return rows


def _duck_table(con, name: str, rows, cols: str) -> None:
    con.execute(f"CREATE TABLE {name} ({cols})")
    if rows:
        ph = ", ".join("?" * len(rows[0]))
        con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)


@pytest.mark.parametrize("seed", range(12))
def test_rrf_fuse_fuzz(spark, seed):
    rng = random.Random(1000 + seed)
    n_q = rng.randrange(1, 6)
    depth = rng.randrange(2, 9)
    k = rng.choice([10, 60, 97])
    top_k = rng.randrange(1, depth + 2)
    legs = [_rank_list(rng, n_q, depth) for _ in range(rng.randrange(1, 4))]

    sdfs = [
        spark.createDataFrame(leg or [(0, 0, 1)], "qid long, doc long, rnk int").limit(
            len(leg)
        )
        for leg in legs
    ]
    srows = sorted(
        tuple(r) for r in rrf_fuse(sdfs, k=k, top_k=top_k).collect()
    )

    con = duckdb.connect()
    for i, leg in enumerate(legs):
        _duck_table(con, f"fz_leg{i}", leg, "qid BIGINT, doc BIGINT, rnk INT")
    orows = sorted(
        tuple(r)
        for r in con.execute(
            rrf_sql([f"SELECT * FROM fz_leg{i}" for i in range(len(legs))], k=k, top_k=top_k)
        ).fetchall()
    )
    assert srows == orows, f"seed {seed}: fuse mismatch"


@pytest.mark.parametrize("seed", range(8))
def test_mmr_fuzz(spark, seed):
    rng = random.Random(2000 + seed)
    n_q = rng.randrange(1, 4)
    k = rng.randrange(2, 5)
    lam = rng.choice([0.3, 0.5, 0.7, 0.83])
    cand, pairs = [], []
    for qid in range(n_q):
        docs = rng.sample(range(20), k=rng.randrange(1, 7))
        cand.extend((qid, d, _q6(rng)) for d in docs)
        for a in docs:
            for b in docs:
                if a != b:
                    pairs.append((qid, a, b, _q6(rng)))

    cdf = spark.createDataFrame(cand, "qid long, doc long, rel double")
    pdf = spark.createDataFrame(
        pairs or [(0, 0, 1, 0.0)], "qid long, doc_a long, doc_b long, sim double"
    ).limit(len(pairs))
    srows = sorted(tuple(r) for r in mmr_rerank(cdf, pdf, lam=lam, k=k).collect())

    con = duckdb.connect()
    _duck_table(con, "fz_cand", cand, "qid BIGINT, doc BIGINT, rel DOUBLE")
    _duck_table(con, "fz_pairs", pairs, "qid BIGINT, doc_a BIGINT, doc_b BIGINT, sim DOUBLE")
    orows = sorted(
        tuple(r)
        for r in con.execute(
            mmr_sql("SELECT * FROM fz_cand", "SELECT * FROM fz_pairs", lam=lam, k=k)
        ).fetchall()
    )
    assert srows == orows, f"seed {seed}: mmr mismatch (lam={lam}, k={k})"
