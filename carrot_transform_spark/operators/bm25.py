"""BM25 ranked retrieval over an inverted index — the retrieval twin of
operators/tfidf.py.

A training-data pipeline needs corpus-level retrieval for decontamination
audits ("which corpus docs does this benchmark query pull up?") and RAG
evals; Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") is the standard lexical ranker.

Spark-first shape (nothing here is a doc-at-a-time loop):

- postings (doc, term, tf) + doc lengths come from ONE corpus scan
  (operators/tfidf.postings — shared tokenisation);
- **the query-term reduction happens FIRST**: the postings stream is
  semi-joined (broadcast) against the query vocabulary before ANY
  corpus-sized join, so every downstream frame is O(Σ df of the query
  terms) — df itself is computed from that reduced stream (a term's doc
  count is the same whether or not the other terms are kept), never as a
  vocab-wide aggregate. Spark executes inner joins in written order (no
  CBO reorder by default), so the order in THIS function is the order on
  the cluster: at 100 TB a 10-query decontamination audit must not shuffle
  the full postings⋈doc-lengths product, and here it can't;
- idf keeps the SAME max_df stop-word cutoff as tfidf: ubiquitous terms
  are the skew source at 100 TB, and the cutoff bounds every term's
  postings fan-out;
- the per-term df/idf frame is ≤ |query vocabulary| rows after the
  reduction, so it broadcasts (size-bounded via maybe_broadcast keyed on
  the query frame — the discipline used for scale-variant dims);
- the ONLY remaining corpus-sized join input is the doc-length frame
  (doc, dl) — one narrow shuffle on doc against the reduced hits, last;
- top-k per query is a row_number over qid partitions — sorts are
  per-partition after a shuffle on qid, never a global sort.

Semantics vs textbook Okapi: the idf is the ratio form
(N - df + 0.5)/(df + 0.5) + 1 (Lucene-style shifted positive), which is
monotone in the ln form PER TERM — so rankings match ln-BM25 exactly for
single-term queries, but after summation over multi-term queries rare
terms weigh polynomially (not logarithmically) more and rankings can
deviate from Okapi/Lucene. That trade is deliberate: no libm ln in the
hot path keeps every score bit-identical across engines (the oracle twin
is exact, not tolerance-based). Likewise query terms are deduplicated by
default — a deliberate choice matching most decontamination audits;
pass ``k3`` to enable the Okapi query-term-frequency component
(k3+1)·qtf/(k3+qtf) instead.

Engine-stable arithmetic: +,-,*,/ on doubles are IEEE exact-rounded, so
with the SAME inputs (integers: tf, df, dl, qtf, N) and the SAME
association order, every per-term score is bit-identical across engines —
the only unstable piece is float-sum reorder, which the final aggregate
avoids by fround-quantizing each term score and summing in exact
DECIMAL(27,6) (the repo's dsum recipe)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from carrot_transform_spark.functions.rounding import fround, fround_sql

_DEC = "decimal(27,6)"
K1 = 1.2
B = 0.75


def bm25_rank(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    top_k: int = 10,
    max_df: int | None = None,
    k3: float | None = None,
) -> DataFrame:
    """(qid, doc, score, rnk): BM25 top-k docs per query.

    ``queries`` is any (qid, qtext) frame — at scale it is the SMALL side
    and its term set reduces the postings stream via a broadcast join
    BEFORE any corpus-sized join (size-bounded: a huge query set falls
    back to a shuffle join instead of a forced multi-GB broadcast).

    ``k3``: when set, each term's score carries the Okapi query-term-
    frequency factor (k3+1)·qtf/(k3+qtf); when None (default) query terms
    are deduplicated (qtf ignored) — the common audit semantics.
    """
    from carrot_transform_spark.operators.tfidf import postings
    from carrot_transform_spark.queries import maybe_broadcast

    p = postings(docs, id_col, text_col)
    dl = p.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )

    qterms = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(F.split(F.col(qtext_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("qid", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qvocab = qterms.select("term").distinct()

    # ---- query-term reduction FIRST (the 100 TB-critical step) ----
    # p_q is O(Σ df of query terms); everything below operates on it.
    p_q = p.join(maybe_broadcast(qvocab, size_like=qterms), "term")

    # df per query term == df over the full corpus (restriction to the
    # query vocabulary doesn't change any kept term's doc count).
    dfreq = p_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    dfreq = dfreq.crossJoin(F.broadcast(stats))
    # ratio idf (monotone in the ln form per term): (N-df+0.5)/(df+0.5)+1
    idf = (
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    terms = dfreq.select("term", idf.alias("idf"), "avgdl")

    # terms is ≤ |query vocabulary| rows; dl (corpus-sized, narrow) LAST.
    hits = (
        p_q.join(maybe_broadcast(qterms), "term")
        .join(maybe_broadcast(terms, size_like=qterms), "term")
        .join(dl, "doc")
    )
    # den = tf + k1 * (1 - b + b * dl/avgdl); ts = idf * tf * (k1+1) / den
    # — association order mirrored EXACTLY in bm25_sql (IEEE-stable)
    ratio = F.col("dl").cast("double") / F.col("avgdl")
    inner = F.lit(1.0) - F.lit(B) + F.lit(B) * ratio
    den = F.col("tf").cast("double") + F.lit(K1) * inner
    ts = F.col("idf") * F.col("tf").cast("double") * F.lit(K1 + 1.0) / den
    if k3 is not None:
        qtfd = F.col("qtf").cast("double")
        qw = F.lit(float(k3) + 1.0) * qtfd / (F.lit(float(k3)) + qtfd)
        ts = ts * qw
    scored = (
        hits.select("qid", "doc", fround(ts, 6).cast(_DEC).alias("ts"))
        .groupBy("qid", "doc")
        .agg(F.sum("ts").cast("double").alias("score"))
    )
    rn = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc"))
    )
    return (
        scored.withColumn("rnk", rn)
        .filter(F.col("rnk") <= top_k)
        .select("qid", "doc", "score", "rnk")
    )


def bm25_sql(
    doc_table: str,
    query_table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    qid_expr: str = "qid",
    qtext_expr: str = "qtext",
    top_k: int = 10,
    max_df: int | None = None,
    k3: float | None = None,
) -> str:
    """DuckDB twin of bm25_rank — identical tokenisation, the same IEEE
    double op order per term score, fround + exact-decimal sum, and
    (score DESC, doc) rank tie-break. The join reorder in bm25_rank is a
    physical-plan change only (per-term arithmetic and association order
    unchanged), so the twin keeps the straightforward logical shape.

    Float constants are CAST(... AS DOUBLE), never bare decimal literals:
    DuckDB parses a bare literal as exact DECIMAL, which silently changes
    the arithmetic for non-representable values (the unigram prune-frac
    divergence class)."""
    df_filter = f"WHERE df <= {max_df}" if max_df is not None else ""
    idf = (
        "(CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0"
    )
    ratio = "CAST(dl.dl AS DOUBLE) / s.avgdl"
    inner = f"1.0 - {B} + {B} * ({ratio})"
    den = f"CAST(p.tf AS DOUBLE) + {K1} * ({inner})"
    ts = f"t.idf * CAST(p.tf AS DOUBLE) * {K1 + 1.0} / ({den})"
    if k3 is not None:
        k3p1 = f"CAST({float(k3) + 1.0!r} AS DOUBLE)"
        k3d = f"CAST({float(k3)!r} AS DOUBLE)"
        qw = f"{k3p1} * CAST(qt.qtf AS DOUBLE) / ({k3d} + CAST(qt.qtf AS DOUBLE))"
        ts = f"({ts}) * ({qw})"
    return f"""
    WITH p AS MATERIALIZED (
        SELECT {id_expr} AS doc, t.term AS term, COUNT(*) AS tf
        FROM {doc_table}, UNNEST(string_split({text_expr}, ' ')) AS t(term)
        WHERE t.term <> ''
        GROUP BY doc, t.term
    ),
    dl AS (SELECT doc, SUM(tf) AS dl FROM p GROUP BY doc),
    s AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ),
    dfreq AS (
        SELECT term, COUNT(*) AS df FROM p GROUP BY term
    ),
    kept AS (SELECT * FROM dfreq {df_filter}),
    t AS (
        SELECT term, {idf} AS idf FROM kept CROSS JOIN s
    ),
    qt AS (
        SELECT {qid_expr} AS qid, u.term AS term, COUNT(*) AS qtf
        FROM {query_table}, UNNEST(string_split({qtext_expr}, ' ')) AS u(term)
        WHERE u.term <> ''
        GROUP BY qid, u.term
    ),
    scored AS (
        SELECT qt.qid, p.doc,
               CAST(SUM(CAST({fround_sql(ts, 6)} AS DECIMAL(27,6))) AS DOUBLE)
                   AS score
        FROM p
        JOIN dl ON dl.doc = p.doc
        JOIN t ON t.term = p.term
        JOIN qt ON qt.term = p.term
        CROSS JOIN s
        GROUP BY qt.qid, p.doc
    )
    SELECT qid, doc, score, rnk FROM (
        SELECT qid, doc, score,
               ROW_NUMBER() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc
               ) AS rnk
        FROM scored
    ) r WHERE rnk <= {top_k}
    """
