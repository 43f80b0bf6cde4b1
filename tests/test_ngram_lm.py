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
import pyspark.sql.functions as F
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


# ---- interpolated Kneser-Ney --------------------------------------------

def py_kn_nll(
    train: dict[int, str],
    score: dict[int, str] | None = None,
    d: float = 0.75,
    beta: float = 0.5,
):
    """Pure-Python interpolated-KN reference mirroring the operator's
    quantize-then-decimal-sum aggregation."""
    toks = {i: [w for w in t.split() if w] for i, t in train.items()}
    bi: Counter = Counter()
    vocab = set()
    for ws in toks.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
    ctx: Counter = Counter()
    n1p_fwd: Counter = Counter()
    n1p_bwd: Counter = Counter()
    for (a, b), n in bi.items():
        ctx[a] += n
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    n_types = len(bi)
    v = len(vocab)

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    stoks = toks if score is None else {
        i: [w for w in t.split() if w] for i, t in score.items()
    }
    out = {}
    for i, ws in stoks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        tot = 0.0
        for a, b in pairs:
            pc = (n1p_bwd.get(b, 0) + beta) / (n_types + beta * v)
            if a not in ctx:
                p = pc
            else:
                disc = max(bi.get((a, b), 0) - d, 0.0) / ctx[a]
                lam = d * n1p_fwd[a] / ctx[a]
                p = disc + lam * pc
            tot = round(tot + q6(-math.log(p)), 6)  # decimal-exact sum
        out[i] = (len(pairs), tot / len(pairs))
    return out


def _kn_corpus(seed: int = 7, n: int = 25):
    rng = random.Random(seed)
    words = ["the", "cat", "sat", "on", "mat", "dog", "ran"]
    return {
        i: " ".join(rng.choice(words) for _ in range(rng.randint(0, 14)))
        for i in range(n)
    }


def test_kn_matches_python_reference(spark):
    from carrot_transform_spark.operators.ngram_lm import kn_nll_docs

    docs = _kn_corpus()
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"]) for r in kn_nll_docs(df).collect()}
    exp = py_kn_nll(docs)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == exp[i][1], (i, got[i], exp[i])


def test_kn_unseen_words_degrade_smoothly(spark):
    """Scoring docs with words/contexts the LM never saw must stay finite
    (the add-beta continuation floor) — novel context backs off to
    P_cont, novel word to the beta-uniform mass."""
    from carrot_transform_spark.operators.ngram_lm import (
        bigram_counts,
        kn_score_docs,
    )
    from carrot_transform_spark.operators.ngram_lm import vocab_size

    train = _kn_corpus()
    tdf = spark.createDataFrame(list(train.items()), "doc_id long, text string")
    bi = bigram_counts(tdf)
    v = vocab_size(tdf)
    new = {100: "the cat zzz unseen qqq", 101: "zzz qqq"}
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in kn_score_docs(ndf, bi, v).collect()}
    assert all(math.isfinite(x) and x > 0 for x in got.values())
    exp = py_kn_nll(train, new)
    for i in exp:
        assert got[i] == exp[i][1], (i, got[i], exp[i])


def test_kn_fluent_beats_gibberish(spark):
    from carrot_transform_spark.operators.ngram_lm import kn_nll_docs

    fluent = " ".join(["the cat sat on the mat"] * 10)
    rng = random.Random(3)
    words = fluent.split()
    rng.shuffle(words)
    docs = [(0, fluent), (1, " ".join(words))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in kn_nll_docs(df).collect()}
    assert got[0] < got[1]


def test_kn_sql_twin_matches_spark(spark, sf_dir):
    from carrot_transform_spark.operators.ngram_lm import kn_nll_docs, kn_nll_sql
    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    srows = sorted(
        (r["doc_id"], r["n_bigrams"], r["avg_nll"])
        for r in kn_nll_docs(d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 120"
    )
    orows = sorted(tuple(r) for r in con.execute(kn_nll_sql()).fetchall())
    assert srows == orows


# ---- trigram interpolated Kneser-Ney ------------------------------------

def py_kn3_nll(
    train: dict[int, str],
    score: dict[int, str] | None = None,
    d: float = 0.75,
    beta: float = 0.5,
):
    """Pure-Python trigram-KN reference (Chen & Goodman recursion with
    type-count lower order), mirroring the operator's aggregation."""
    toks = {i: [w for w in t.split() if w] for i, t in train.items()}
    tri: Counter = Counter()
    vocab = set()
    for ws in toks.values():
        vocab.update(ws)
        for a, b, c in zip(ws, ws[1:], ws[2:]):
            tri[(a, b, c)] += 1
    hist_c: Counter = Counter()
    hist_n1p: Counter = Counter()
    cont23: Counter = Counter()
    for (a, b, c), n in tri.items():
        hist_c[(a, b)] += n
        hist_n1p[(a, b)] += 1
        cont23[(b, c)] += 1
    mid_sum: Counter = Counter()
    mid_right: Counter = Counter()
    cont3: Counter = Counter()
    for (b, c), n in cont23.items():
        mid_sum[b] += n
        mid_right[b] += 1
        cont3[c] += 1
    n_types = len(cont23)
    v = len(vocab)

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    stoks = toks if score is None else {
        i: [w for w in t.split() if w] for i, t in score.items()
    }
    out = {}
    for i, ws in stoks.items():
        triples = list(zip(ws, ws[1:], ws[2:]))
        if not triples:
            continue
        tot = 0.0
        for a, b, c in triples:
            pc = (cont3.get(c, 0) + beta) / (n_types + beta * v)
            if b not in mid_sum:
                pkn2 = pc
            else:
                disc2 = max(cont23.get((b, c), 0) - d, 0.0) / mid_sum[b]
                lam2 = d * mid_right[b] / mid_sum[b]
                pkn2 = disc2 + lam2 * pc
            if (a, b) not in hist_c:
                p = pkn2
            else:
                disc3 = max(tri.get((a, b, c), 0) - d, 0.0) / hist_c[(a, b)]
                lam3 = d * hist_n1p[(a, b)] / hist_c[(a, b)]
                p = disc3 + lam3 * pkn2
            tot = round(tot + q6(-math.log(p)), 6)
        out[i] = (len(triples), tot / len(triples))
    return out


def test_kn3_matches_python_reference(spark):
    from carrot_transform_spark.operators.ngram_lm import kn3_nll_docs

    docs = _kn_corpus(seed=13)
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_nll"])
        for r in kn3_nll_docs(df).collect()
    }
    exp = py_kn3_nll(docs)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == exp[i], (i, got[i], exp[i])


def test_kn3_unseen_histories_degrade_smoothly(spark):
    from carrot_transform_spark.operators.ngram_lm import (
        _doc_trigrams,
        kn3_score_docs,
        vocab_size,
    )
    import pyspark.sql.functions as FF

    train = _kn_corpus(seed=13)
    tdf = spark.createDataFrame(list(train.items()), "doc_id long, text string")
    tri = (
        _doc_trigrams(tdf, "doc_id", "text")
        .groupBy("w1", "w2", "w3")
        .agg(FF.count(FF.lit(1)).alias("n"))
    )
    v = vocab_size(tdf)
    new = {100: "zzz qqq unseen the cat sat", 101: "the zzz cat"}
    ndf = spark.createDataFrame(list(new.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in kn3_score_docs(ndf, tri, v).collect()}
    assert all(math.isfinite(x) and x > 0 for x in got.values())
    exp = py_kn3_nll(train, new)
    for i in exp:
        assert got[i] == exp[i][1], (i, got[i], exp[i])


def test_kn3_sql_twin_matches_spark(spark, sf_dir):
    from carrot_transform_spark.operators.ngram_lm import kn3_nll_docs, kn3_nll_sql
    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    srows = sorted(
        (r["doc_id"], r["n_trigrams"], r["avg_nll"])
        for r in kn3_nll_docs(d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 120"
    )
    orows = sorted(tuple(r) for r in con.execute(kn3_nll_sql()).fetchall())
    assert srows == orows
    assert len(srows) > 0
