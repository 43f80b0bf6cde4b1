"""Hybrid RRF fusion + retrieval eval (operators/hybrid.py): hand-computed
fused scores on tiny rank lists, the absent-from-one-leg convention,
tie-breaks, eval metric components, and the DuckDB twins on in-memory
tables."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from carrot_transform_spark.operators.hybrid import (
    RRF_K,
    retrieval_eval,
    retrieval_eval_sql,
    rrf_fuse,
    rrf_sql,
)


def _rr(rank: int, k: int = RRF_K) -> float:
    # the operator's quantized contribution: fround(1/(k+rnk), 6)
    import math

    return math.floor(1.0 / (k + rank) * 1e6 + 0.5) / 1e6


def _lists(spark):
    # qid 1: lex ranks docs (10, 11, 12); dense ranks (11, 13, 10)
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "qid long, doc long, rnk int"
    )
    dense = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], "qid long, doc long, rnk int"
    )
    return lex, dense


def test_rrf_hand_computed(spark):
    lex, dense = _lists(spark)
    out = {r["doc"]: (r["rrf_score"], r["rnk"]) for r in rrf_fuse([lex, dense]).collect()}
    exp = {
        10: _rr(1) + _rr(3),
        11: _rr(2) + _rr(1),
        12: _rr(3),
        13: _rr(2),
    }
    for doc, score in exp.items():
        assert abs(out[doc][0] - score) < 1e-9, (doc, out[doc], score)
    # 11 (ranks 2+1) and 10 (ranks 1+3): 11 wins; absent-leg docs trail
    assert out[11][1] == 1
    assert out[10][1] == 2
    # 12 and 13 have IDENTICAL single-leg contributions at rank 3? No —
    # 13 is rank 2 in dense (bigger), 12 is rank 3 in lex
    assert out[13][1] == 3
    assert out[12][1] == 4


def test_rrf_tie_breaks_on_doc(spark):
    # two docs with the SAME single contribution -> lower doc id first
    leg = spark.createDataFrame(
        [(1, 7, 1), (1, 3, 1)], "qid long, doc long, rnk int"
    )
    # same qid+rnk twice is fine: they're different docs in one list slot
    out = rrf_fuse([leg]).orderBy("rnk").collect()
    assert [r["doc"] for r in out] == [3, 7]


def test_rrf_top_k_cut(spark):
    leg = spark.createDataFrame(
        [(1, d, d + 1) for d in range(30)], "qid long, doc long, rnk int"
    )
    out = rrf_fuse([leg], top_k=5).collect()
    assert len(out) == 5
    assert {r["doc"] for r in out} == {0, 1, 2, 3, 4}


def test_rrf_duckdb_twin(spark):
    lex, dense = _lists(spark)
    srows = sorted(
        (r["qid"], r["doc"], r["rrf_score"], r["rnk"])
        for r in rrf_fuse([lex, dense]).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lexleg AS SELECT * FROM (VALUES (1,10,1),(1,11,2),(1,12,3)) t(qid,doc,rnk)"
    )
    con.execute(
        "CREATE TABLE denseleg AS SELECT * FROM (VALUES (1,11,1),(1,13,2),(1,10,3)) t(qid,doc,rnk)"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            rrf_sql(["SELECT * FROM lexleg", "SELECT * FROM denseleg"])
        ).fetchall()
    )
    assert srows == orows


def test_retrieval_eval_hand_computed(spark):
    lex, dense = _lists(spark)
    qrels = spark.createDataFrame([(1, 10)], "qid long, rel_doc long")
    out = {
        r["system"]: (r["n_hit"], r["sum_rr"])
        for r in retrieval_eval({"lex": lex, "dense": dense}, qrels, k=2).collect()
    }
    # doc 10 is rank 1 in lex (within k=2), rank 3 in dense (cut by k=2)
    assert out["lex"] == (1, 1.0)
    assert "dense" not in out  # zero hits -> no group row (exact components)


def test_retrieval_eval_duckdb_twin(spark):
    lex, dense = _lists(spark)
    qrels = spark.createDataFrame([(1, 10), (2, 99)], "qid long, rel_doc long")
    srows = sorted(
        (r["system"], r["n_hit"], r["sum_rr"])
        for r in retrieval_eval({"lex": lex, "dense": dense}, qrels, k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lexleg AS SELECT * FROM (VALUES (1,10,1),(1,11,2),(1,12,3)) t(qid,doc,rnk)"
    )
    con.execute(
        "CREATE TABLE denseleg AS SELECT * FROM (VALUES (1,11,1),(1,13,2),(1,10,3)) t(qid,doc,rnk)"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            retrieval_eval_sql(
                {"lex": "SELECT * FROM lexleg", "dense": "SELECT * FROM denseleg"},
                "SELECT * FROM (VALUES (1,10),(2,99)) t(qid, rel_doc)",
                k=3,
            )
        ).fetchall()
    )
    assert srows == orows


def test_eval_qrels_join_broadcasts(spark):
    """The qrels side must attach via a broadcast join — at 100 TB the run
    lists are top-k-bounded but the fusion/eval must not shuffle them
    against a |q|-row qrels frame."""
    lex, _ = _lists(spark)
    qrels = spark.createDataFrame([(1, 10)], "qid long, rel_doc long")
    plan = (
        retrieval_eval({"lex": lex}, qrels, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---- graded nDCG@k ------------------------------------------------------

def _q6(x: float) -> float:
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _ndcg_fixture(spark):
    lex, dense = _lists(spark)
    # graded, multi-doc qrels: qid 1 has a grade-3 and a grade-1 doc;
    # qid 2's only relevant doc is never retrieved by either leg.
    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 11, 1), (2, 99, 2)],
        "qid long, rel_doc long, grade int",
    )
    return lex, dense, qrels


def test_ndcg_hand_computed(spark):
    import math

    from carrot_transform_spark.operators.hybrid import dcg_discounts, ndcg_eval

    lex, dense, qrels = _ndcg_fixture(spark)
    d = dict(dcg_discounts(3))
    out = {
        r["system"]: (r["n_q"], r["sum_ndcg"])
        for r in ndcg_eval({"lex": lex, "dense": dense}, qrels, k=3).collect()
    }
    idcg1 = _q6(7.0 * d[1]) + _q6(1.0 * d[2])  # ideal: grade3 first, then grade1
    # lex qid1: doc10@1 (gain 7), doc11@2 (gain 1) -> the ideal ordering
    lex1 = _q6((_q6(7.0 * d[1]) + _q6(1.0 * d[2])) / idcg1)
    assert out["lex"] == (2, lex1)  # qid2 contributes 0
    assert lex1 == 1.0
    # dense qid1: doc11@1 (gain 1), doc10@3 (gain 7)
    dense1 = _q6((_q6(1.0 * d[1]) + _q6(7.0 * d[3])) / idcg1)
    assert out["dense"] == (2, dense1)
    assert 0.0 < dense1 < 1.0
    assert math.isclose(dense1, _q6(4.5 / 7.63093), rel_tol=0, abs_tol=0)


def test_ndcg_zero_overlap_system_counts_all_queries(spark):
    from carrot_transform_spark.operators.hybrid import ndcg_eval

    miss = spark.createDataFrame([(1, 555, 1)], "qid long, doc long, rnk int")
    _, _, qrels = _ndcg_fixture(spark)
    out = ndcg_eval({"miss": miss}, qrels, k=3).collect()
    assert [(r["system"], r["n_q"], r["sum_ndcg"]) for r in out] == [
        ("miss", 2, 0.0)
    ]


def test_ndcg_duckdb_twin(spark):
    from carrot_transform_spark.operators.hybrid import ndcg_eval, ndcg_eval_sql

    lex, dense, qrels = _ndcg_fixture(spark)
    srows = sorted(
        (r["system"], r["n_q"], r["sum_ndcg"])
        for r in ndcg_eval({"lex": lex, "dense": dense}, qrels, k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lexleg AS SELECT * FROM (VALUES (1,10,1),(1,11,2),(1,12,3)) t(qid,doc,rnk)"
    )
    con.execute(
        "CREATE TABLE denseleg AS SELECT * FROM (VALUES (1,11,1),(1,13,2),(1,10,3)) t(qid,doc,rnk)"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            ndcg_eval_sql(
                {"lex": "SELECT * FROM lexleg", "dense": "SELECT * FROM denseleg"},
                "SELECT * FROM (VALUES (1,10,3),(1,11,1),(2,99,2)) t(qid, rel_doc, grade)",
                k=3,
            )
        ).fetchall()
    )
    assert srows == orows


def test_ndcg_qrels_and_discounts_broadcast(spark):
    from carrot_transform_spark.operators.hybrid import ndcg_eval

    lex, _, qrels = _ndcg_fixture(spark)
    plan = (
        ndcg_eval({"lex": lex}, qrels, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- ANN recall@k -------------------------------------------------------

def test_ann_recall_hand_computed(spark):
    from carrot_transform_spark.operators.hybrid import ann_recall

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1), (2, 21, 2)],
        "query_id long, neighbor_id long, rnk int",
    )
    approx = spark.createDataFrame(
        [(1, 11, 1), (1, 99, 2), (1, 12, 3)],  # query 2 missed entirely
        "query_id long, neighbor_id long, rnk int",
    )
    out = {r["qid"]: (r["n_truth"], r["n_hit"]) for r in ann_recall(truth, approx).collect()}
    assert out == {1: (3, 2), 2: (2, 0)}


def test_ann_recall_k_cut(spark):
    from carrot_transform_spark.operators.hybrid import ann_recall

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rnk int",
    )
    approx = spark.createDataFrame(
        [(1, 12, 1), (1, 10, 2), (1, 11, 3)],
        "query_id long, neighbor_id long, rnk int",
    )
    out = ann_recall(truth, approx, k=2).collect()[0]
    # truth@2 = {10, 11}; approx@2 = {12, 10} -> 1 hit
    assert (out["n_truth"], out["n_hit"]) == (2, 1)


def test_ann_recall_duckdb_twin(spark):
    from carrot_transform_spark.operators.hybrid import ann_recall, ann_recall_sql

    truth = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, neighbor_id long, rnk int",
    )
    approx = spark.createDataFrame(
        [(1, 11, 1), (2, 77, 1)],
        "query_id long, neighbor_id long, rnk int",
    )
    srows = sorted(tuple(r) for r in ann_recall(truth, approx).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1,10,1),(1,11,2),(2,20,1)) x(query_id,neighbor_id,rnk)"
    )
    con.execute(
        "CREATE TABLE a AS SELECT * FROM (VALUES (1,11,1),(2,77,1)) x(query_id,neighbor_id,rnk)"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            ann_recall_sql("SELECT * FROM t", "SELECT * FROM a")
        ).fetchall()
    )
    assert srows == orows
