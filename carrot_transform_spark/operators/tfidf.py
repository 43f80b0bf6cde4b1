"""TF-IDF document vectors and sparse cosine similarity.

Inverted-index form throughout: documents are exploded to (doc, term, tf)
postings, IDF comes from a term-keyed aggregate, and pairwise cosine is a
term-keyed equi-join of postings — never a doc×doc product. This is the
shape that survives 100 TB: every stage shuffles on `term` (or `doc`), and
the classic skew source — stop-word terms appearing in most documents —
is cut off by `max_df` *before* the pair join, which also bounds each
term's contribution to the join to max_df² pairs.

Two IDF modes:

- ``log`` (default): idf = ln((1+N)/(1+df)) + 1 (smoothed, sklearn-style).
  The right choice for real ranking, but ln() is not bit-identical across
  engines (Java's fdlibm vs glibc), so cross-engine hash checks can't use
  it.
- ``ratio``: idf = round(N/df, 6) computed in exact decimal — a monotone
  transform of the same ordering, bit-identical everywhere; the
  DuckDB-oracle queries use this mode.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DEC = "decimal(27,6)"


def postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc, term, tf): whitespace-token postings list."""
    return (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_mode: str = "log",
    max_df: int | None = None,
) -> DataFrame:
    """(doc, term, w): TF-IDF weight per posting.

    max_df drops terms appearing in more than max_df documents (stop-word
    cutoff; at scale this is also the skew guard for downstream joins).
    """
    p = postings(docs, id_col, text_col)
    dfreq = p.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    # total docs as a 1-row broadcast join — no driver action, so the
    # weight frame stays a pure plan
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    dfreq = dfreq.crossJoin(F.broadcast(n_docs))
    if idf_mode == "log":
        idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    elif idf_mode == "ratio":
        idf = (
            F.col("n_docs").cast(_DEC) / F.col("df").cast(_DEC)
        ).cast("decimal(27,6)").cast("double")
    else:
        raise ValueError(f"unknown idf_mode: {idf_mode}")
    dfreq = dfreq.select("term", idf.alias("idf"))
    return p.join(dfreq, "term").select(
        "doc", "term", (F.col("tf") * F.col("idf")).alias("w")
    )


def cosine_pairs(
    weights: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b, cosine) for doc_a < doc_b with cosine >= threshold.

    Norms per doc and dot products per pair both sum through exact decimal
    (parallel reordering can't flip a ulp), and the final cosine is rounded
    with the engine-stable floor trick — the same pattern the dsum/fround
    oracle helpers pin down.
    """
    norms = weights.groupBy("doc").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast(_DEC)).cast("double")
        ).alias("nrm")
    )
    a = weights.select(F.col("doc").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = weights.select(F.col("doc").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("wa") * F.col("wb")).cast(_DEC)).cast("double").alias("dot"))
    )
    na = norms.select(F.col("doc").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc").alias("doc_b"), F.col("nrm").alias("nb"))
    m = 10**4
    cos = F.floor(F.col("dot") / (F.col("na") * F.col("nb")) * m + F.lit(0.5)) / m
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.cast("double").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def tfidf_weights_sql(
    table: str, id_expr: str, text_expr: str, max_df: int | None = None
) -> str:
    """DuckDB twin of tfidf_weights(idf_mode='ratio')."""
    df_filter = f"WHERE df <= {max_df}" if max_df is not None else ""
    return f"""
    WITH p AS (
        SELECT {id_expr} AS doc, t.term AS term, COUNT(*) AS tf
        FROM {table}, UNNEST(string_split({text_expr}, ' ')) AS t(term)
        WHERE t.term <> ''
        GROUP BY doc, t.term
    ),
    dfreq AS (
        SELECT term, COUNT(*) AS df FROM p GROUP BY term
    ),
    kept AS (SELECT * FROM dfreq {df_filter}),
    n AS (SELECT COUNT(DISTINCT {id_expr}) AS n_docs FROM {table})
    SELECT p.doc, p.term,
           p.tf * CAST(CAST(CAST(n.n_docs AS DECIMAL(27,6)) / CAST(kept.df AS DECIMAL(27,6)) AS DECIMAL(27,6)) AS DOUBLE) AS w
    FROM p JOIN kept USING (term) CROSS JOIN n
    """


def cosine_pairs_sql(weights_sql: str, threshold: float = 0.5) -> str:
    """DuckDB twin of cosine_pairs over a weights subquery."""
    return f"""
    WITH w AS ({weights_sql}),
    norms AS (
        SELECT doc, SQRT(CAST(SUM(CAST(w*w AS DECIMAL(27,6))) AS DOUBLE)) AS nrm
        FROM w GROUP BY doc
    ),
    dots AS (
        SELECT a.doc AS doc_a, b.doc AS doc_b,
               CAST(SUM(CAST(a.w * b.w AS DECIMAL(27,6))) AS DOUBLE) AS dot
        FROM w a JOIN w b ON a.term = b.term AND a.doc < b.doc
        GROUP BY a.doc, b.doc
    )
    SELECT d.doc_a, d.doc_b,
           CAST(FLOOR(d.dot / (na.nrm * nb.nrm) * 10000 + 0.5) / 10000 AS DOUBLE) AS cosine
    FROM dots d
    JOIN norms na ON na.doc = d.doc_a
    JOIN norms nb ON nb.doc = d.doc_b
    WHERE CAST(FLOOR(d.dot / (na.nrm * nb.nrm) * 10000 + 0.5) / 10000 AS DOUBLE) >= {threshold}
    """
