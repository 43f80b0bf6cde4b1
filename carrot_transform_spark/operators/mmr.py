"""Maximal Marginal Relevance (MMR) diversification rerank.

After retrieval (BM25 / dense / hybrid-RRF), training-data pipelines
diversify the final list so near-duplicate hits don't crowd out coverage
— hard-negative mining, RAG context assembly, and eval-set construction
all use MMR (Carbonell & Goldstein 1998, "The Use of MMR, Diversity-Based
Reranking for Reordering Documents and Producing Summaries", SIGIR):

    next = argmax over unselected d of
           lam * rel(d) - (1 - lam) * max over s in selected of sim(d, s)

No reference counterpart (the reference is an ETL engine).

Spark-first shape — the greedy loop is UNROLLED into k declarative
steps, NOT an applyInPandas escape: each step is one join + one window
over frames keyed by qid, so Catalyst sees the whole plan and every step
is embarrassingly parallel across queries. The same unrolling generates
the DuckDB twin as chained CTEs (the recipe the repo already uses for
logreg GD rounds and unigram EM rounds — loop bounds are plan constants,
iteration data stays in the engine).

100 TB posture:

- candidates are the upstream top-k per query (bounded by construction)
  and pairwise sims are candidate×candidate WITHIN a query — O(|q| * k^2)
  rows total, never corpus-sized;
- each of the k steps shuffles on qid only (the selected-set frame is one
  row per query); millions of queries spread across the cluster, and no
  step holds global state;
- k is a plan constant (a rerank depth, typically 5-20), so plan size is
  O(k) — the same discipline as the GD/EM unrolls.

Engine-stable arithmetic: rel and sim enter PRE-QUANTIZED (fround 6dp —
the caller quantizes, because it knows the provenance); each step's
selection score lam*rel - (1-lam)*maxsim uses CAST-double constants and
one fixed association order, is fround-quantized, and ties break on doc
ascending — so both engines make the identical greedy choice at every
step, and the outputs are exactly row-equal (the twin test is ==, not
tolerance).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from carrot_transform_spark.functions.rounding import fround, fround_sql


def mmr_rerank(
    cand: DataFrame,
    pairs: DataFrame,
    lam: float = 0.7,
    k: int = 5,
) -> DataFrame:
    """(qid, doc, step, mmr_score): greedy MMR selection of k docs/query.

    ``cand``: (qid, doc, rel) — the retrieval candidates, rel quantized.
    ``pairs``: (qid, doc_a, doc_b, sim) — pairwise similarity between
    candidates of the same query, BOTH directions present, sim quantized.
    Step 1 picks the highest-rel doc (ties: doc asc); later steps score
    lam*rel - (1-lam)*max(sim to the selected set). Queries with fewer
    than k candidates yield all of them.
    """
    lamc = F.lit(float(lam))
    one_m = F.lit(1.0 - float(lam))
    # The greedy recurrence references c/p/sel once per step and sel_i
    # references sel_{i-1} through several branches — without truncation
    # the logical plan grows EXPONENTIALLY in k (k=10 on 3 rows hung the
    # analyzer). Same per-iteration localCheckpoint discipline as the
    # unigram DP / BPE rounds: the checkpointed frames are O(|q| * k) and
    # O(|q| * k^2) rows — bounded by the query workload, never the corpus.
    c = cand.select("qid", "doc", "rel").localCheckpoint(eager=True)
    p = pairs.select("qid", "doc_a", "doc_b", "sim").localCheckpoint(eager=True)

    w1 = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("doc"))
    pick = (
        c.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") == 1)
        .select("qid", "doc", F.col("rel").alias("mmr_score"))
        .withColumn("step", F.lit(1))
        .localCheckpoint(eager=True)
    )
    sel = pick.select("qid", F.array("doc").alias("chosen"))
    out = [pick]

    for step in range(2, int(k) + 1):
        rest = c.join(sel, "qid").filter(~F.array_contains("chosen", F.col("doc")))
        maxsim = (
            rest.join(
                p,
                (rest["qid"] == p["qid"])
                & (p["doc_a"] == rest["doc"])
                & F.array_contains(rest["chosen"], p["doc_b"]),
            )
            .groupBy(rest["qid"].alias("qid"), rest["doc"].alias("doc"))
            .agg(F.max("sim").alias("maxsim"))
        )
        scored = (
            rest.select("qid", "doc", "rel")
            .join(maxsim, ["qid", "doc"], "left")
            .select(
                "qid",
                "doc",
                fround(
                    lamc * F.col("rel")
                    - one_m * F.coalesce(F.col("maxsim"), F.lit(0.0)),
                    6,
                ).alias("mmr_score"),
            )
        )
        ws = Window.partitionBy("qid").orderBy(F.desc("mmr_score"), F.asc("doc"))
        pick = (
            scored.withColumn("_rn", F.row_number().over(ws))
            .filter(F.col("_rn") == 1)
            .select("qid", "doc", "mmr_score")
            .withColumn("step", F.lit(step))
            .localCheckpoint(eager=True)
        )
        out.append(pick)
        sel = (
            sel.join(pick.select("qid", F.col("doc").alias("_new")), "qid")
            .select("qid", F.concat("chosen", F.array("_new")).alias("chosen"))
            .localCheckpoint(eager=True)
        )

    from functools import reduce

    u = reduce(DataFrame.unionByName, [o.select("qid", "doc", "step", "mmr_score") for o in out])
    return u


def mmr_sql(
    cand_sql: str,
    pairs_sql: str,
    lam: float = 0.7,
    k: int = 5,
) -> str:
    """DuckDB twin of :func:`mmr_rerank` — the identical greedy unroll as
    chained CTEs (list_contains/list_append carry the selected set)."""
    lamc = f"CAST({float(lam)!r} AS DOUBLE)"
    one_m = f"CAST({1.0 - float(lam)!r} AS DOUBLE)"
    ctes = [
        f"mmr_c AS (SELECT qid, doc, rel FROM ({cand_sql}) mmr_cin)",
        f"mmr_p AS (SELECT qid, doc_a, doc_b, sim FROM ({pairs_sql}) mmr_pin)",
        """mmr_pick1 AS (
        SELECT qid, doc, rel AS mmr_score, 1 AS step FROM (
            SELECT qid, doc, rel,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS rn
            FROM mmr_c) mmr_r1 WHERE rn = 1
    )""",
        "mmr_sel1 AS (SELECT qid, [doc] AS chosen FROM mmr_pick1)",
    ]
    for step in range(2, int(k) + 1):
        i, j = step, step - 1
        score = f"{lamc} * r.rel - {one_m} * COALESCE(m.maxsim, CAST(0 AS DOUBLE))"
        ctes.append(
            f"""mmr_scored{i} AS (
        SELECT r.qid, r.doc, {fround_sql(score, 6)} AS mmr_score
        FROM (SELECT c.qid, c.doc, c.rel, s.chosen
              FROM mmr_c c JOIN mmr_sel{j} s ON s.qid = c.qid
              WHERE NOT list_contains(s.chosen, c.doc)) r
        LEFT JOIN (
            SELECT c.qid, c.doc, MAX(p.sim) AS maxsim
            FROM mmr_c c
            JOIN mmr_sel{j} s ON s.qid = c.qid
            JOIN mmr_p p ON p.qid = c.qid AND p.doc_a = c.doc
                        AND list_contains(s.chosen, p.doc_b)
            WHERE NOT list_contains(s.chosen, c.doc)
            GROUP BY c.qid, c.doc
        ) m ON m.qid = r.qid AND m.doc = r.doc
    )"""
        )
        ctes.append(
            f"""mmr_pick{i} AS (
        SELECT qid, doc, mmr_score, {i} AS step FROM (
            SELECT qid, doc, mmr_score,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY mmr_score DESC, doc) AS rn
            FROM mmr_scored{i}) mmr_r{i} WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""mmr_sel{i} AS (
        SELECT s.qid, list_append(s.chosen, p.doc) AS chosen
        FROM mmr_sel{j} s JOIN mmr_pick{i} p ON p.qid = s.qid
    )"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT qid, doc, step, mmr_score FROM mmr_pick{i}"
        for i in range(1, int(k) + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union
