"""Bigram language-model quality scoring (CCNet-style perplexity filter).

The missing member of the quality-filter family (operators/quality.py
does rule-based FineWeb/Gopher filters): CCNet/RedPajama-class pipelines
rank documents by LANGUAGE-MODEL perplexity — fluent text scores low,
boilerplate/gibberish scores high — and keep the low-perplexity tail.
A full KenLM is out of scope (no external models in-container), but an
add-alpha-smoothed bigram LM is the same mechanism and trains ON the
corpus with two aggregations:

* ``bigram_counts``: consecutive-token pairs per document, one
  map-side-combined groupBy — the corpus-sized job;
* context counts derive from the bigram table (sum over the left
  token), so normalization is exact: P(w2|w1) = (c(w1,w2) + a) /
  (c_ctx(w1) + a*V), V = |vocab|.

Scoring joins each document's bigrams against the LM — two equi-joins
(on (w1,w2) and on w1) + one per-doc aggregation. At scale the LM table
shuffles like any fact-fact join (AQE handles skewed contexts like
"the"); nothing is collected to the driver. All math is built-in
Column expressions (ln/exp), no UDFs, and the identical arithmetic is
expressible in DuckDB — the oracle twin re-derives every count and
probability from the same parquet.

Tokenisation matches operators/bpe.py (explicit [ \\t\\r\\n]+ class,
empty tokens dropped) so the two text stacks agree on word boundaries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_WS = "[ \t\r\n]+"
DEFAULT_ALPHA = 0.5


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(F.split(F.col(text_col), _WS), lambda t: t != "")
    return docs.select(F.col(id_col), toks.alias("toks"))


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair per document."""
    t = _doc_tokens(docs, id_col, text_col)
    npairs = F.greatest(F.size("toks") - 1, F.lit(0))  # 0/1-token docs
    pairs = F.arrays_zip(
        F.slice("toks", 1, npairs).alias("w1"),
        F.slice(F.col("toks"), 2, npairs).alias("w2"),
    )
    return t.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(w1, w2, n) over the corpus — the training aggregation."""
    return (
        _doc_bigrams(docs, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def vocab_size(docs: DataFrame, text_col: str = "text") -> int:
    """|distinct tokens| — the smoothing denominator's V."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), _WS)).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w"))
        .first()[0]
    )


def score_bigram_nll(
    docs: DataFrame,
    bigrams: DataFrame,
    v: int,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_nll): average negative natural-log likelihood
    under the add-alpha bigram model; perplexity = exp(avg_nll). Unseen
    bigrams and unseen contexts degrade smoothly to the smoothed floor
    (alpha / (c_ctx + alpha*V), c_ctx = 0 for novel contexts). Documents
    with fewer than two tokens score NULL (no bigrams to judge)."""
    ctx = bigrams.groupBy("w1").agg(F.sum("n").alias("c_ctx"))
    db = _doc_bigrams(docs, id_col, text_col)
    joined = (
        db.join(bigrams, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + F.lit(alpha))
                    / (F.coalesce(F.col("c_ctx"), F.lit(0)) + F.lit(alpha * v))
                )
            ).alias("nll"),
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("nll") / F.count(F.lit(1))).alias("avg_nll"),
    )


def bigram_nll_docs(
    docs: DataFrame,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-train + score in one call (the sub-check shape): the corpus is
    its own LM training set, as when ranking a crawl against itself."""
    bi = bigram_counts(docs, id_col, text_col)
    v = vocab_size(docs, text_col)
    return score_bigram_nll(docs, bi, v, alpha, id_col, text_col)


def bigram_nll_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = DEFAULT_ALPHA,
) -> str:
    """DuckDB twin of bigram_nll_docs: identical tokenisation, counts,
    smoothing and ln arithmetic."""
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT {id_col},
               list_filter(regexp_split_to_array({text_col}, '{_WS}'),
                           t -> t <> '') AS l
        FROM {table}
    ),
    db AS MATERIALIZED (
        SELECT {id_col}, l[u.i] AS w1, l[u.i + 1] AS w2
        FROM toks, UNNEST(range(1, len(l))) AS u(i)
    ),
    bi AS MATERIALIZED (
        SELECT w1, w2, COUNT(*) AS n FROM db GROUP BY w1, w2
    ),
    ctx AS MATERIALIZED (
        SELECT w1, SUM(n) AS c_ctx FROM bi GROUP BY w1
    ),
    v AS (
        SELECT COUNT(DISTINCT w) AS v FROM (
            SELECT unnest(l) AS w FROM toks
        )
    )
    SELECT d.{id_col},
           COUNT(*) AS n_bigrams,
           SUM(-ln((COALESCE(b.n, 0) + {alpha})
                   / (COALESCE(c.c_ctx, 0) + {alpha} * (SELECT v FROM v))))
               / COUNT(*) AS avg_nll
    FROM db d
    LEFT JOIN bi b ON b.w1 = d.w1 AND b.w2 = d.w2
    LEFT JOIN ctx c ON c.w1 = d.w1
    GROUP BY d.{id_col}
    """
