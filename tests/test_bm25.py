"""BM25 ranked retrieval (operators/bm25.py): hand-computed scores on a
tiny corpus, max_df stop-word cutoff, rank tie-breaks, and the skew leg —
a hot term appearing in every doc must be cut by max_df BEFORE the query
join (the same guard tfidf uses; at 100 TB the hot term IS the skew)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from carrot_transform_spark.operators.bm25 import B, K1, bm25_rank


def _expected_score(tf: int, df: int, n_docs: int, dl: int, avgdl: float) -> float:
    idf = (n_docs - df + 0.5) / (df + 0.5) + 1.0
    den = tf + K1 * (1.0 - B + B * (dl / avgdl))
    return idf * tf * (K1 + 1.0) / den


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(10, "apple cherry")], "qid long, qtext string")
    out = {
        (r["qid"], r["doc"]): (r["score"], r["rnk"])
        for r in bm25_rank(docs, queries, top_k=10).collect()
    }
    # corpus stats: dls = 3, 2, 4; avgdl = 3.0; N = 3
    avgdl = 3.0
    # doc 0: apple tf=2 df=1; doc 1: cherry tf=1 df=2; doc 2: cherry tf=3 df=2
    exp0 = _expected_score(2, 1, 3, 3, avgdl)
    exp1 = _expected_score(1, 2, 3, 2, avgdl)
    exp2 = _expected_score(3, 2, 3, 4, avgdl)
    assert math.isclose(out[(10, 0)][0], exp0, abs_tol=2e-6)
    assert math.isclose(out[(10, 1)][0], exp1, abs_tol=2e-6)
    assert math.isclose(out[(10, 2)][0], exp2, abs_tol=2e-6)
    # apple is rarer (df=1) and doubled -> doc 0 outranks the cherry docs
    ranks = {doc: rk for (_q, doc), (_s, rk) in out.items()}
    assert ranks[0] == 1
    assert ranks[2] == 2  # tf=3 beats tf=1 for the same term
    assert ranks[1] == 3


def test_bm25_max_df_cuts_hot_term(spark):
    # 'the' appears in EVERY doc (the skew term); 'rare' in one
    docs = spark.createDataFrame(
        [(i, "the filler" + (" rare" if i == 7 else "")) for i in range(50)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame([(1, "the rare")], "qid long, qtext string")
    out = bm25_rank(docs, queries, top_k=5, max_df=10).collect()
    # only 'rare' survives the cutoff: exactly one hit, doc 7
    assert [(r["doc"], r["rnk"]) for r in out] == [(7, 1)]

    # without the cutoff every doc matches 'the' -> 50 candidate docs
    full = bm25_rank(docs, queries, top_k=100).collect()
    assert len(full) == 50
    assert [r["doc"] for r in full if r["rnk"] == 1] == [7]


def test_bm25_rank_tiebreak_is_doc_ordered(spark):
    # identical docs -> identical scores -> rnk follows doc id
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(6)], "doc_id long, text string"
    )
    queries = spark.createDataFrame([(0, "same")], "qid long, qtext string")
    out = bm25_rank(docs, queries, top_k=3).orderBy("rnk").collect()
    assert [r["doc"] for r in out] == [0, 1, 2]
    assert len({r["score"] for r in out}) == 1


def _first_join_line(plan: str, key_marker: str) -> int:
    for i, line in enumerate(plan.splitlines()):
        if "Join" in line and key_marker in line:
            return i
    raise AssertionError(f"no join on {key_marker!r} in plan:\n{plan}")


def test_bm25_plan_broadcasts_query_side_and_reduces_first(spark, tmp_path):
    # parquet-backed so maybe_broadcast has real plan-size stats (the
    # production path; in-memory frames have no stats and fall back to
    # shuffle joins by design)
    spark.createDataFrame(
        [(i, f"w{i % 13} w{i % 7}") for i in range(200)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame(
        [(1, "w1 w2")], "qid long, qtext string"
    ).write.parquet(str(tmp_path / "qs"))
    docs = spark.read.parquet(str(tmp_path / "docs"))
    queries = spark.read.parquet(str(tmp_path / "qs"))
    plan = bm25_rank(docs, queries)._jdf.queryExecution().executedPlan().toString()
    # the query-term join must be a broadcast (never a shuffle of postings
    # against a tiny query set)
    assert "BroadcastHashJoin" in plan
    # join ORDER pin (the 100 TB plan, not just the fast-at-bench one):
    # the corpus-sized doc-length join must be the TOPMOST join — i.e. the
    # query-term reduction joins sit BELOW it in the tree, so the dl join
    # operates on the query-reduced stream. In the plan text, parent nodes
    # print before their subtree: doc join line < term join lines.
    assert _first_join_line(plan, "[doc#") < _first_join_line(plan, "[term#")
    # top-k per query is a window over qid partitions, not a global sort+limit
    assert "Window" in plan


def test_bm25_k3_query_term_frequency(spark):
    # query repeats 'apple' twice -> with k3 the apple contribution is
    # scaled by (k3+1)*2/(k3+2); without k3 qtf is ignored (dedup default)
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(10, "apple apple cherry")], "qid long, qtext string"
    )
    k3 = 8.0
    base = {
        (r["qid"], r["doc"]): r["score"]
        for r in bm25_rank(docs, queries, top_k=10).collect()
    }
    qtf = {
        (r["qid"], r["doc"]): r["score"]
        for r in bm25_rank(docs, queries, top_k=10, k3=k3).collect()
    }
    avgdl = 3.0
    w2 = (k3 + 1.0) * 2.0 / (k3 + 2.0)  # qtf=2 weight
    w1 = (k3 + 1.0) * 1.0 / (k3 + 1.0)  # qtf=1 weight == 1.0
    exp0 = _expected_score(2, 1, 3, 3, avgdl)
    exp1 = _expected_score(1, 2, 3, 2, avgdl)
    # dedup default: qtf ignored entirely
    assert math.isclose(base[(10, 0)], exp0, abs_tol=2e-6)
    # k3 mode: apple doubled in the query boosts doc 0 by w2
    assert math.isclose(qtf[(10, 0)], exp0 * w2, abs_tol=2e-6)
    assert math.isclose(qtf[(10, 1)], exp1 * w1, abs_tol=2e-6)


def test_bm25_k3_duckdb_twin_exact(spark):
    # the flagged qtf mode is oracle-twinned: identical rows (scores
    # bit-exact) between bm25_rank(k3=...) and bm25_sql(k3=...)
    import duckdb

    from carrot_transform_spark.operators.bm25 import bm25_sql

    rows = [
        (i, " ".join(f"t{(i * j) % 11}" for j in range(1, 6))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    queries = spark.createDataFrame(
        [(1, "t1 t1 t3"), (2, "t2 t5 t5 t5")], "qid long, qtext string"
    )
    got = sorted(
        (r["qid"], r["doc"], r["score"], r["rnk"])
        for r in bm25_rank(docs, queries, top_k=7, k3=1.3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    con.execute("CREATE TABLE qs (qid BIGINT, qtext VARCHAR)")
    con.executemany(
        "INSERT INTO qs VALUES (?, ?)", [(1, "t1 t1 t3"), (2, "t2 t5 t5 t5")]
    )
    exp = sorted(tuple(r) for r in con.execute(bm25_sql("docs", "qs", top_k=7, k3=1.3)).fetchall())
    assert got == exp
