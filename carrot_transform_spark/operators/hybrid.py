"""Hybrid retrieval: Reciprocal Rank Fusion over lexical + dense rank
lists, plus retrieval-quality metrics (MRR / hit@k).

A training-data pipeline that retrieves (for decontamination audits, RAG
eval set construction, or hard-negative mining) rarely trusts one ranker:
the standard recipe is BM25 for lexical match + embedding cosine for
semantic match, fused with Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher 2009, "Reciprocal Rank Fusion outperforms Condorcet and
individual Rank Learning Methods", SIGIR):

    RRF(d) = sum over rank lists r of 1 / (k + rank_r(d)),  k = 60

No reference counterpart (the reference is an ETL engine); this composes
the repo's bm25_rank and cosine top-k legs.

100 TB posture — fusion is O(|queries| * top_k), NEVER corpus-sized:

- each leg already reduces to its per-query top-k before fusion (BM25 via
  the query-first broadcast reduction in operators/bm25.py; dense via the
  IVF/blocked paths in operators/similarity.py), so rrf_fuse's inputs are
  tiny by construction whatever the corpus size;
- the fuse itself is one union + one groupBy(qid, doc) shuffle over
  O(legs * |q| * k) rows + a per-qid window — all bounded by the query
  workload, not the data;
- retrieval_eval consumes the same top-k lists joined against a qrels
  frame of |q| rows: broadcast semi-join, then a per-system aggregate.

Engine-stable arithmetic: each contribution 1/(k + rnk) is ONE IEEE
double division of exact integers (correctly rounded, so bit-identical
across engines), fround-quantized and summed in exact DECIMAL(27,6) so
parallel-summation reorder cannot flip an ulp (the repo's dsum recipe,
same as operators/bm25.py). Ranks tie-break on doc id — total order.
"""

from __future__ import annotations

import math
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from carrot_transform_spark.functions.rounding import fround, fround_sql

_DEC = "decimal(27,6)"
RRF_K = 60


def _contrib(k: int):
    """1/(k + rnk) as one correctly-rounded double op, then quantized."""
    raw = F.lit(1.0) / (F.lit(float(k)) + F.col("rnk").cast("double"))
    return fround(raw, 6).cast(_DEC)


def _contrib_sql(k: int, rnk_expr: str = "rnk") -> str:
    raw = f"CAST(1 AS DOUBLE) / (CAST({int(k)} AS DOUBLE) + CAST({rnk_expr} AS DOUBLE))"
    return f"CAST({fround_sql(raw, 6)} AS DECIMAL(27,6))"


def rrf_fuse(
    legs: list[DataFrame],
    k: int = RRF_K,
    top_k: int = 10,
) -> DataFrame:
    """(qid, doc, rrf_score, rnk): RRF fusion of ≥1 rank lists.

    Each leg is a (qid, doc, rnk) frame — any extra columns are dropped.
    A doc absent from a leg simply contributes nothing for that leg (the
    standard RRF convention); ties break on doc id ascending.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one rank list")
    tagged = [df.select("qid", "doc", "rnk") for df in legs]
    u = reduce(DataFrame.unionByName, tagged)
    fused = (
        u.select("qid", "doc", _contrib(k).alias("rr"))
        .groupBy("qid", "doc")
        .agg(F.sum("rr").cast("double").alias("rrf_score"))
    )
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("rrf_score"), F.asc("doc"))
    )
    return (
        fused.withColumn("rnk", rn)
        .filter(F.col("rnk") <= top_k)
        .select("qid", "doc", "rrf_score", "rnk")
    )


def rrf_sql(leg_sqls: list[str], k: int = RRF_K, top_k: int = 10) -> str:
    """DuckDB twin of :func:`rrf_fuse`. Each leg SQL must project
    (qid, doc, rnk); extra columns are ignored by the explicit select."""
    if not leg_sqls:
        raise ValueError("rrf_sql needs at least one rank list")
    union = "\nUNION ALL\n".join(
        f"SELECT qid, doc, rnk FROM ({s}) rrf_leg{i}"
        for i, s in enumerate(leg_sqls)
    )
    return f"""
    WITH rrf_all AS ({union}),
    rrf_fused AS (
        SELECT qid, doc, CAST(SUM({_contrib_sql(k)}) AS DOUBLE) AS rrf_score
        FROM rrf_all GROUP BY qid, doc
    ),
    rrf_ranked AS (
        SELECT qid, doc, rrf_score,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_score DESC, doc) AS rnk
        FROM rrf_fused
    )
    SELECT qid, doc, rrf_score, rnk FROM rrf_ranked WHERE rnk <= {int(top_k)}
    """


def retrieval_eval(
    runs: dict[str, DataFrame],
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(system, n_hit, sum_rr): cutoff-k retrieval metrics per system.

    ``runs`` maps a system name to its (qid, doc, rnk) list; ``qrels`` is
    (qid, rel_doc) with ONE relevant doc per query (the self-retrieval
    audit shape). Emits exact integer/decimal components rather than the
    final means — n_hit is hits@k, sum_rr the exact sum of quantized
    reciprocal ranks (MRR = sum_rr / |q|, recall@k = n_hit / |q|); keeping
    the division OUT of the frame keeps every value engine-exact.

    Scale: each run is already top-k-bounded; qrels is |q| rows and
    broadcasts; the aggregate is one row per system.
    """
    if not runs:
        raise ValueError("retrieval_eval needs at least one run")
    rr = fround(F.lit(1.0) / F.col("rnk").cast("double"), 6).cast(_DEC)
    qr = qrels.select(F.col("qid").alias("r_qid"), F.col("rel_doc"))
    per = [
        (
            run.select("qid", "doc", "rnk")
            .filter(F.col("rnk") <= k)
            .join(
                F.broadcast(qr),
                (F.col("qid") == F.col("r_qid"))
                & (F.col("doc") == F.col("rel_doc")),
            )
            .select(F.lit(name).alias("system"), rr.alias("rr"))
        )
        for name, run in sorted(runs.items())
    ]
    u = reduce(DataFrame.unionByName, per)
    return u.groupBy("system").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit"),
        F.coalesce(F.sum("rr").cast("double"), F.lit(0.0)).alias("sum_rr"),
    )


def retrieval_eval_sql(
    run_sqls: dict[str, str],
    qrels_sql: str,
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`retrieval_eval` (same quantize-then-decimal-
    sum recipe). ``qrels_sql`` must project (qid, rel_doc)."""
    if not run_sqls:
        raise ValueError("retrieval_eval_sql needs at least one run")
    rr = f"CAST({fround_sql('CAST(1 AS DOUBLE) / CAST(r.rnk AS DOUBLE)', 6)} AS DECIMAL(27,6))"
    per = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS system, {rr} AS rr
        FROM ({sql}) r JOIN rql ON rql.qid = r.qid AND rql.rel_doc = r.doc
        WHERE r.rnk <= {int(k)}"""
        for name, sql in sorted(run_sqls.items())
    )
    return f"""
    WITH rql AS (SELECT qid, rel_doc FROM ({qrels_sql}) rql_in),
    rev_all AS ({per})
    SELECT system, CAST(COUNT(*) AS BIGINT) AS n_hit,
           COALESCE(CAST(SUM(rr) AS DOUBLE), 0.0) AS sum_rr
    FROM rev_all GROUP BY system
    """


# ---- graded nDCG@k ------------------------------------------------------
# hits@k / MRR above treat relevance as binary with one relevant doc per
# query; eval-set grading (TREC-style qrels) needs GRADED multi-doc
# relevance, and the standard metric is nDCG@k (Jarvelin & Kekalainen
# 2002, "Cumulated gain-based evaluation of IR techniques", TOIS):
#
#     DCG@k  = sum over hits of (2^grade - 1) / log2(rank + 1)
#     nDCG@k = DCG@k / IDCG@k   (IDCG = DCG of the ideal ordering)
#
# Engine-stable arithmetic: log2 is libm (NOT correctly rounded across
# engines), so the rank discounts 1/log2(r+1) for r = 1..k are computed
# ONCE in Python — one canonical double per rank — and enter BOTH engines
# as literals (a k-row broadcast frame / VALUES CTE). Gains 2^grade - 1
# are exact integers (bit shift, no pow); each hit contribution is then
# ONE IEEE multiply of exact inputs, fround-quantized, summed in exact
# DECIMAL(27,6); nDCG per query is ONE division of the two exact decimal
# sums cast to double. Every step is correctly rounded on identical
# inputs, so the twin equality is exact, not tolerance-based.


def dcg_discounts(k: int) -> list[tuple[int, float]]:
    """[(rank, 1/log2(rank+1))] for rank = 1..k — the canonical doubles
    shipped to both engines (Python floats repr-round-trip exactly)."""
    return [(r, 1.0 / math.log2(r + 1.0)) for r in range(1, int(k) + 1)]


def _gain():
    """(2^grade - 1) as an exact integer cast to double (no libm pow).

    SQL-form shiftleft: the Python F.shiftleft only takes a literal bit
    count, but the engine function shifts by an expression fine."""
    return F.expr("CAST(shiftleft(1, CAST(grade AS INT)) - 1 AS DOUBLE)")


def ndcg_eval(
    runs: dict[str, DataFrame],
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """(system, n_q, sum_ndcg): graded nDCG@k components per system.

    ``qrels`` is (qid, rel_doc, grade) with integer grades >= 1 and any
    number of relevant docs per query. Emits exact components: n_q is the
    number of assessed queries (same for every system — a system that
    retrieves nothing relevant for a query scores 0 for it, it is not
    dropped), sum_ndcg the exact sum of per-query quantized nDCG values
    (mean nDCG@k = sum_ndcg / n_q; keeping the mean's division OUT of the
    frame keeps the emission engine-exact).

    Scale: runs are top-k-bounded per query; qrels and the k-row discount
    table broadcast; per-system frames are O(|q|) rows.
    """
    if not runs:
        raise ValueError("ndcg_eval needs at least one run")
    spark = qrels.sparkSession
    disc = spark.createDataFrame(dcg_discounts(k), "rnk int, d double")
    qr = qrels.select(
        F.col("qid").alias("r_qid"), "rel_doc", F.col("grade").cast("int").alias("grade")
    )

    contrib = fround(_gain() * F.col("d"), 6).cast(_DEC)
    iw = Window.partitionBy("r_qid").orderBy(F.desc("grade"), F.asc("rel_doc"))
    ideal = (
        qr.withColumn("rnk", F.row_number().over(iw))
        .filter(F.col("rnk") <= k)
        .join(F.broadcast(disc), "rnk")
        .select(F.col("r_qid").alias("qid"), contrib.alias("ic"))
        .groupBy("qid")
        .agg(F.sum("ic").alias("idcg"))
    )

    per = []
    for name, run in sorted(runs.items()):
        dcg = (
            run.select("qid", "doc", "rnk")
            .filter(F.col("rnk") <= k)
            .join(
                F.broadcast(qr),
                (F.col("qid") == F.col("r_qid"))
                & (F.col("doc") == F.col("rel_doc")),
            )
            .join(F.broadcast(disc), "rnk")
            .select("qid", contrib.alias("c"))
            .groupBy("qid")
            .agg(F.sum("c").alias("dcg"))
        )
        ndcg = fround(
            F.coalesce(F.col("dcg").cast("double"), F.lit(0.0))
            / F.col("idcg").cast("double"),
            6,
        ).cast(_DEC)
        # dcg is at most one row per assessed query (same bound as qrels,
        # which already broadcasts) — broadcasting keeps the per-system
        # attach shuffle-free.
        per.append(
            ideal.join(F.broadcast(dcg), "qid", "left").select(
                F.lit(name).alias("system"), ndcg.alias("ndcg")
            )
        )
    u = reduce(DataFrame.unionByName, per)
    return u.groupBy("system").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_q"),
        F.sum("ndcg").cast("double").alias("sum_ndcg"),
    )


def ndcg_eval_sql(
    run_sqls: dict[str, str],
    qrels_sql: str,
    k: int = 10,
) -> str:
    """DuckDB twin of :func:`ndcg_eval` — the same Python-computed rank
    discounts as a VALUES CTE, bit-shift gains, and the quantize-then-
    decimal-sum recipe at every aggregate."""
    if not run_sqls:
        raise ValueError("ndcg_eval_sql needs at least one run")
    disc_rows = ", ".join(
        f"({r}, CAST({d!r} AS DOUBLE))" for r, d in dcg_discounts(k)
    )
    gain = "CAST((1 << CAST(grade AS INT)) - 1 AS DOUBLE)"
    contrib = f"CAST({fround_sql(f'{gain} * nd_disc.d', 6)} AS DECIMAL(27,6))"
    per = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS system,
               CAST({fround_sql('COALESCE(CAST(nd_dcg.dcg AS DOUBLE), 0.0) / CAST(nd_ideal.idcg AS DOUBLE)', 6)}
                    AS DECIMAL(27,6)) AS ndcg
        FROM nd_ideal LEFT JOIN (
            SELECT r.qid, SUM({contrib}) AS dcg
            FROM ({sql}) r
            JOIN nd_qr ON nd_qr.r_qid = r.qid AND nd_qr.rel_doc = r.doc
            JOIN nd_disc ON nd_disc.rnk = r.rnk
            WHERE r.rnk <= {int(k)}
            GROUP BY r.qid
        ) nd_dcg ON nd_dcg.qid = nd_ideal.qid"""
        for name, sql in sorted(run_sqls.items())
    )
    return f"""
    WITH nd_disc(rnk, d) AS (VALUES {disc_rows}),
    nd_qr AS (
        SELECT qid AS r_qid, rel_doc, CAST(grade AS INT) AS grade
        FROM ({qrels_sql}) nd_qr_in
    ),
    nd_ideal AS (
        SELECT r_qid AS qid, SUM({contrib}) AS idcg
        FROM (
            SELECT r_qid, grade,
                   ROW_NUMBER() OVER (
                       PARTITION BY r_qid ORDER BY grade DESC, rel_doc
                   ) AS rnk
            FROM nd_qr
        ) nd_irk JOIN nd_disc ON nd_disc.rnk = nd_irk.rnk
        WHERE nd_irk.rnk <= {int(k)}
        GROUP BY r_qid
    ),
    nd_all AS ({per})
    SELECT system, CAST(COUNT(*) AS BIGINT) AS n_q,
           CAST(SUM(ndcg) AS DOUBLE) AS sum_ndcg
    FROM nd_all GROUP BY system
    """


# ---- ANN recall@k -------------------------------------------------------
# The approximate-retrieval counterpart of the graded/binary evals above:
# an IVF/LSH/PQ leg is only as good as its recall against the exact
# brute-force ranking (the standard ANN quality metric, e.g. Johnson,
# Douze & Jegou 2017, "Billion-scale similarity search with GPUs" —
# recall@k = |approx top-k  ∩  exact top-k| / k, averaged over queries).
# Pure integer arithmetic: set intersections and counts, no floats — the
# division stays OUT of the frame (recall@k = sum_hit / sum_truth).


def ann_recall(
    truth: DataFrame,
    approx: DataFrame,
    k: int | None = None,
    qid_col: str = "query_id",
    id_col: str = "neighbor_id",
    rnk_col: str = "rnk",
) -> DataFrame:
    """(qid, n_truth, n_hit): per-query overlap of the approximate top-k
    with the exact top-k. ``truth``/``approx`` are (qid, id, rnk) frames;
    pass ``k`` to cut both lists, else they are taken as delivered.
    Queries the approx leg missed entirely still appear (n_hit = 0).
    Aggregate recall@k = SUM(n_hit) / SUM(n_truth) — left to the caller
    so the emission stays integer-exact."""
    t = truth.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("nid"), F.col(rnk_col).alias("rnk")
    )
    a = approx.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("nid"), F.col(rnk_col).alias("rnk")
    )
    if k is not None:
        t = t.filter(F.col("rnk") <= int(k))
        a = a.filter(F.col("rnk") <= int(k))
    base = t.groupBy("qid").agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    hits = (
        t.join(a.select("qid", "nid"), ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )
    # both sides are |q|-row aggregates of workload-bounded lists
    return base.join(F.broadcast(hits), "qid", "left").select(
        "qid", "n_truth", F.coalesce(F.col("n_hit"), F.lit(0).cast("bigint")).alias("n_hit")
    )


def ann_recall_sql(
    truth_sql: str,
    approx_sql: str,
    k: int | None = None,
    qid_expr: str = "query_id",
    id_expr: str = "neighbor_id",
    rnk_expr: str = "rnk",
) -> str:
    """DuckDB twin of :func:`ann_recall` — each leg SQL must project
    (qid_expr, id_expr, rnk_expr)."""
    cut = f"WHERE rnk <= {int(k)}" if k is not None else ""
    return f"""
    WITH ar_t AS (
        SELECT {qid_expr} AS qid, {id_expr} AS nid, {rnk_expr} AS rnk
        FROM ({truth_sql}) ar_tin {cut}
    ),
    ar_a AS (
        SELECT {qid_expr} AS qid, {id_expr} AS nid, {rnk_expr} AS rnk
        FROM ({approx_sql}) ar_ain {cut}
    ),
    ar_base AS (
        SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_truth FROM ar_t GROUP BY qid
    ),
    ar_hits AS (
        SELECT t.qid, CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM ar_t t JOIN ar_a a ON a.qid = t.qid AND a.nid = t.nid
        GROUP BY t.qid
    )
    SELECT b.qid, b.n_truth,
           COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit
    FROM ar_base b LEFT JOIN ar_hits h ON h.qid = b.qid
    """
