"""Distributed logistic-regression quality classifier (operators/logreg.py).

Verified three ways: a pure-numpy reference implementation (exact weights
and scores round-for-round, same 1e-9 quantisation), the generated
chained-CTE DuckDB twin on real test data, and the property the filter
exists for (a label carried by the text is actually LEARNED — held-out
accuracy, not just training arithmetic)."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.logreg import (
    _BIAS,
    logreg_quality_docs,
    logreg_score,
    logreg_sql,
    logreg_train,
    presence_features,
)

US = "\x1f"


def _py_feats(text: str, buckets: int) -> set[int]:
    ws = [w for w in text.split() if w]
    fs = ws + [a + US + b for a, b in zip(ws, ws[1:])]
    out = {int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % buckets for f in fs}
    out.add(_BIAS)
    return out


def _py_train(docs, labels, buckets, rounds, lr):
    fs = {i: _py_feats(t, buckets) for i, t in docs.items()}
    all_b = sorted({b for s in fs.values() for b in s})
    w = {b: 0.0 for b in all_b}
    n = len(docs)
    for _ in range(rounds):
        resid = {}
        for i in docs:
            m = sum(w[b] for b in fs[i])
            resid[i] = 1.0 / (1.0 + np.exp(-m)) - labels[i]
        g = Counter()
        for i in docs:
            for b in fs[i]:
                g[b] += resid[i]
        w = {
            b: float(np.floor((w[b] - lr * g[b] / n) * 1e9 + 0.5) / 1e9)
            for b in all_b
        }
    p = {}
    for i in docs:
        m = sum(w[b] for b in fs[i])
        p[i] = float(np.floor(1.0 / (1.0 + np.exp(-m)) * 1e6 + 0.5) / 1e6)
    return w, p


def test_matches_python_reference(spark):
    rng = np.random.default_rng(4)
    words = ["good", "fine", "bad", "ugly", "meh", "ok"]
    docs = {
        i: " ".join(rng.choice(words) for _ in range(int(rng.integers(1, 10))))
        for i in range(30)
    }
    labels = {i: 1.0 if "good" in docs[i] else 0.0 for i in docs}
    B, R, LR = 64, 6, 3.0
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    res = logreg_quality_docs(
        df, F.col("text").contains("good"), buckets=B, rounds=R, lr=LR
    ).collect()
    w_want, p_want = _py_train(docs, labels, B, R, LR)
    got_w = {r["id"]: r["val"] for r in res if r["kind"] == "w"}
    got_p = {r["id"]: r["val"] for r in res if r["kind"] == "p"}
    assert set(got_w) == set(w_want)
    assert set(got_p) == set(p_want)
    for b in w_want:
        assert got_w[b] == pytest.approx(w_want[b], abs=2e-9)
    for i in p_want:
        assert got_p[i] == pytest.approx(p_want[i], abs=2e-6)


def test_learns_heldout_signal(spark):
    """Train on even ids, score odd ids: the trained weights must carry the
    signal to unseen docs (the filter use-case)."""
    rng = np.random.default_rng(9)
    pos_voc = ["alpha", "beta", "gamma"]
    neg_voc = ["noise", "junk", "spam"]
    rows = []
    for i in range(400):
        voc = pos_voc if i % 2 == (i // 2) % 2 else neg_voc  # mixed over ids
        rows.append((i, " ".join(rng.choice(voc) for _ in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    is_pos = {i: t.split()[0] in pos_voc for i, t in rows}
    train = df.filter(F.col("doc_id") % 2 == 0)
    feats_train = presence_features(train, buckets=256)
    labels = train.select(
        "doc_id", F.col("text").contains("alpha").cast("double").alias("y")
    )
    w = logreg_train(feats_train, labels, rounds=10, lr=5.0)
    test_docs = df.filter(F.col("doc_id") % 2 == 1)
    scores = logreg_score(presence_features(test_docs, buckets=256), w)
    got = {r["doc_id"]: r["p"] for r in scores.collect()}
    acc = np.mean([(got[i] >= 0.5) == is_pos[i] for i in got])
    assert acc >= 0.95


def test_empty_docs_get_bias_score(spark):
    df = spark.createDataFrame(
        [(0, "x y"), (1, ""), (2, "x")], "doc_id long, text string"
    )
    res = logreg_quality_docs(
        df, F.col("doc_id") == 0, buckets=32, rounds=2, lr=1.0
    ).collect()
    p = {r["id"]: r["val"] for r in res if r["kind"] == "p"}
    assert set(p) == {0, 1, 2}  # the empty doc still scores (bias feature)


def test_sql_twin_matches_spark(spark):
    sf_dir = "/root/testdata/sf0.001"
    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents")
    res = logreg_quality_docs(
        d, F.col("text").contains("spark"), rounds=4, lr=8.0
    ).collect()
    got = {(r["kind"], r["id"]): r["val"] for r in res}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = {
        (k, int(i)): v
        for k, i, v in con.execute(
            logreg_sql(label_sql="text LIKE '%spark%'", rounds=4, lr=8.0)
        ).fetchall()
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=0), key


def test_cached_matrix_partitioning(spark):
    """The training cache must be pinned to defaultParallelism partitions
    (not the session's shuffle fan-out) — the fix for hundreds of
    near-empty tasks per round under a cached 200-partition join."""
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    feats = presence_features(df, buckets=16)
    labels = df.select("doc_id", F.lit(1.0).alias("y"))
    fx = feats.join(labels, "doc_id").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    assert fx.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_save_load_score_new_docs(spark, tmp_path):
    """Train -> save -> load -> score NEW docs: known vocabulary drives
    the score, unknown buckets contribute nothing, empty docs still score
    through the bias feature."""
    from carrot_transform_spark.operators.logreg import (
        load_model,
        save_model,
        score_new_docs,
    )

    rng = np.random.default_rng(3)
    pos_voc, neg_voc = ["alpha", "beta"], ["junk", "spam"]
    rows = [
        (i, " ".join(rng.choice(pos_voc if i % 2 == 0 else neg_voc) for _ in range(10)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = presence_features(df, buckets=128)
    labels = df.select("doc_id", (F.col("doc_id") % 2 == 0).cast("double").alias("y"))
    w = logreg_train(feats, labels, rounds=10, lr=5.0)
    save_model(str(tmp_path / "m"), w)
    w2 = load_model(spark, str(tmp_path / "m"))
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple, w2.collect()))

    new = spark.createDataFrame(
        [(0, "alpha alpha beta"), (1, "junk spam"), (2, "zzz qqq"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["p"] for r in score_new_docs(new, w2, buckets=128).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] > 0.9 and got[1] < 0.1
    # all-unknown text and empty text both collapse to the bias-only score
    assert got[2] == got[3]


def test_local_gd_path_matches_distributed(spark, sf_dir):
    """The size-gated driver-side GD loop must reproduce the distributed
    loop's weight table EXACTLY (same IEEE op sequence + 1e-9 per-round
    quantisation), and the final scores must match bit-for-bit."""
    import pyspark.sql.functions as F

    import carrot_transform_spark.operators.logreg as lr
    from carrot_transform_spark.queries import load

    docs = load(spark, sf_dir, "documents")
    labels = docs.select("doc_id", (F.col("lang") == "en").cast("double").alias("y"))

    def train(local: bool):
        feats = lr.presence_features(docs, "doc_id", "text", 256).persist()
        old = lr.LOCAL_TRAIN_ROWS
        lr.LOCAL_TRAIN_ROWS = 10**9 if local else 0
        try:
            w = lr.logreg_train(feats, labels, "doc_id", rounds=4, lr=8.0)
            wt = sorted(map(tuple, w.collect()))
            sc = sorted(map(tuple, lr.logreg_score(feats, w, "doc_id").collect()))
        finally:
            lr.LOCAL_TRAIN_ROWS = old
            feats.unpersist()
        return wt, sc

    w_local, s_local = train(local=True)
    w_dist, s_dist = train(local=False)
    assert w_local == w_dist
    assert s_local == s_dist
