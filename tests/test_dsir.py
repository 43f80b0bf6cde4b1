"""DSIR importance resampling (operators/dsir.py, arXiv:2302.03169).

Verified three independent ways: a pure-Python reference implementation on
a hand-sized corpus (exact hashed-n-gram counts, exact smoothed
log-ratios, exact Gumbel keys), the generated DuckDB twin row-for-row on
real test data, and the selection property the operator exists for
(target-like raw documents are enriched in the selected set relative to
uniform sampling)."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import duckdb
import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.dsir import (
    DEFAULT_ALPHA,
    DEFAULT_BUCKETS,
    _HEX_BITS,
    _U_DENOM,
    dsir_scores,
    dsir_select_docs,
    dsir_sql,
    hashed_ngram_counts,
)

US = "\x1f"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:_HEX_BITS], 16)


def py_feats(text: str, buckets: int) -> Counter:
    ws = [w for w in text.split() if w]
    feats = ws + [a + US + b for a, b in zip(ws, ws[1:])]
    return Counter(_h(f) % buckets for f in feats)


def py_dsir(docs: dict[int, str], tmod: int, k: int, buckets: int, alpha: float):
    t_cnt: Counter = Counter()
    r_cnt: Counter = Counter()
    per_doc = {}
    for i, t in docs.items():
        fc = py_feats(t, buckets)
        per_doc[i] = fc
        (t_cnt if i % tmod == 0 else r_cnt).update(fc)
    tt, rt = sum(t_cnt.values()), sum(r_cnt.values())
    ab = alpha * buckets
    lam = {
        b: math.log((t_cnt[b] + alpha) / (tt + ab))
        - math.log((r_cnt[b] + alpha) / (rt + ab))
        for b in set(t_cnt) | set(r_cnt)
    }
    out = {}
    for i in docs:
        if i % tmod == 0:
            continue
        fc = per_doc[i]
        log_w = sum(c * lam[b] for b, c in fc.items())
        u = (_h(f"g:{i}") + 0.5) / _U_DENOM
        key = log_w - math.log(-math.log(u))
        qkey = math.floor(key * 1e6 + 0.5) / 1e6
        out[i] = (sum(fc.values()), log_w, qkey)
    order = sorted(out, key=lambda i: (-out[i][2], i))
    ranks = {i: r + 1 for r, i in enumerate(order[:k])}
    return out, ranks


def test_hashed_feats_match_python(spark):
    df = spark.createDataFrame(
        [(0, "a b a"), (1, "x"), (2, "")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["bucket"]): r["c"]
        for r in hashed_ngram_counts(df, buckets=64).collect()
    }
    want = {}
    for i, t in [(0, "a b a"), (1, "x"), (2, "")]:
        for b, c in py_feats(t, 64).items():
            want[(i, b)] = c
    assert got == want


def test_matches_python_reference(spark):
    rng = random.Random(23)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast"]
    docs = {
        i: " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        for i in range(40)
    }
    tmod, k, buckets, alpha = 5, 8, 128, DEFAULT_ALPHA
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    res = dsir_select_docs(
        df, F.col("doc_id") % tmod == 0, k=k, buckets=buckets, alpha=alpha
    ).collect()
    want, ranks = py_dsir(docs, tmod, k, buckets, alpha)
    assert {r["doc_id"] for r in res} == set(want)
    for r in res:
        nf, lw, qk = want[r["doc_id"]]
        assert r["n_feats"] == nf
        assert r["log_w"] == pytest.approx(lw, abs=1e-6)
        assert r["g_key"] == pytest.approx(qk, abs=2e-6)
        assert r["sel_rank"] == ranks.get(r["doc_id"])
    assert sum(r["sel_rank"] is not None for r in res) == k


def test_empty_and_short_docs_score_zero_evidence(spark):
    df = spark.createDataFrame(
        [(0, "target text here"), (1, ""), (2, "   "), (3, "solo")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"])
        for r in dsir_scores(df, F.col("doc_id") == 0, buckets=32).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3][0] == 1  # one unigram, no bigram


def test_target_like_docs_enriched(spark):
    """The operator's purpose: raw docs sharing the target's vocabulary
    out-select raw docs from a disjoint vocabulary."""
    rng = random.Random(7)
    tvoc = ["alpha", "beta", "gamma", "delta"]
    ovoc = ["noise", "junk", "spam", "blob"]
    rows = []
    for i in range(300):
        if i % 3 == 0:
            voc = tvoc  # target model docs
        elif i % 3 == 1:
            voc = tvoc  # raw, target-like
        else:
            voc = ovoc  # raw, off-distribution
        rows.append((i, " ".join(rng.choice(voc) for _ in range(20))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sel = [
        r["doc_id"]
        for r in dsir_select_docs(df, F.col("doc_id") % 3 == 0, k=50).collect()
        if r["sel_rank"] is not None
    ]
    like = sum(1 for i in sel if i % 3 == 1)
    assert like >= 45  # ~half the raw pool, near-all of the selection


def test_sql_twin_matches_spark(spark):
    sf_dir = "/root/testdata/sf0.001"
    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents")
    res = dsir_select_docs(d, F.col("doc_id") % 7 == 0, k=25).collect()
    got = {
        r["doc_id"]: (r["n_feats"], r["log_w"], r["g_key"], r["sel_rank"])
        for r in res
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        int(i): (int(nf), lw, gk, None if rk is None else int(rk))
        for i, nf, lw, gk, rk in con.execute(dsir_sql(k=25)).fetchall()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], abs=0)
        assert got[i][2] == pytest.approx(want[i][2], abs=0)
        assert got[i][3] == want[i][3]


def test_topk_plan_is_take_ordered(spark):
    """The selection must never materialise a global sort: the k-row
    candidate frame comes from TakeOrderedAndProject."""
    df = spark.createDataFrame(
        [(i, f"w{i % 11} w{i % 5}") for i in range(200)],
        "doc_id long, text string",
    )
    res = dsir_select_docs(df, F.col("doc_id") % 9 == 0, k=10)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
