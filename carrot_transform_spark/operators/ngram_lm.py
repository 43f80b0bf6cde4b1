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


# ---- interpolated Kneser-Ney --------------------------------------------
# Add-alpha above is the simplest smoother; production perplexity filters
# (KenLM-backed CCNet and friends) use interpolated Kneser-Ney smoothing
# (Kneser & Ney 1995; the formulation below is Chen & Goodman 1999,
# "An empirical study of smoothing techniques for language modeling",
# §2.7, at the bigram level):
#
#   P_KN(w2|w1) = max(c(w1,w2) - D, 0) / c(w1)
#               + (D * N1+(w1*) / c(w1)) * P_cont(w2)
#   P_cont(w2)  = N1+(*w2) / N1+(**)
#
# where N1+(w1*) is the number of distinct continuations of w1, N1+(*w2)
# the number of distinct contexts preceding w2, and N1+(**) the number of
# distinct bigram types. Novel-context/novel-word totality (needed when
# scoring docs the LM never saw): an unseen context backs off to P_cont
# directly, and P_cont itself carries add-beta mass over the vocabulary —
# P_cont'(w2) = (N1+(*w2) + beta) / (N1+(**) + beta * V) — a documented
# variant of the textbook model (which leaves novel words at zero).
#
# Spark shape: every model statistic is ONE aggregation over the bigram
# table (context totals + distinct-continuation counts share a groupBy;
# continuation counts are a groupBy on the other key; the type count is a
# broadcast scalar). Scoring is the same two equi-joins as the add-alpha
# scorer plus one more narrow join on w2. Engine-stable scoring: all
# counts are exact integers, D and beta enter both engines as CAST-double
# literals, the per-bigram probability uses ONE pinned association order,
# and the per-doc aggregate fround-quantizes each -ln(p) before summing
# in exact DECIMAL(27,6) (stricter than the add-alpha sibling, which
# relies on raw double summation staying under the 6dp render).

KN_D = 0.75
KN_BETA = 0.5


def kn_score_docs(
    docs: DataFrame,
    bigrams: DataFrame,
    v: int,
    d: float = KN_D,
    beta: float = KN_BETA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, avg_nll) under interpolated Kneser-Ney with
    add-beta continuation totality. ``bigrams`` is the (w1, w2, n) table
    from :func:`bigram_counts`; ``v`` the vocabulary size."""
    ctx = bigrams.groupBy("w1").agg(
        F.sum("n").alias("c_ctx"), F.count(F.lit(1)).alias("n1p_fwd")
    )
    cont = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    types = bigrams.agg(F.count(F.lit(1)).alias("n_types"))

    dd = F.lit(float(d))
    bb = F.lit(float(beta))
    db = _doc_bigrams(docs, id_col, text_col)
    j = (
        db.join(bigrams, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(types))
    )
    pc = (F.coalesce(F.col("n1p_bwd"), F.lit(0)).cast("double") + bb) / (
        F.col("n_types").cast("double") + bb * F.lit(float(v))
    )
    c_ctx = F.col("c_ctx").cast("double")
    disc = (
        F.greatest(F.coalesce(F.col("n"), F.lit(0)).cast("double") - dd, F.lit(0.0))
        / c_ctx
    )
    lam = dd * F.col("n1p_fwd").cast("double") / c_ctx
    p = F.when(F.col("c_ctx").isNull(), pc).otherwise(disc + lam * pc)
    from carrot_transform_spark.functions.rounding import fround

    nll = fround(-F.log(p), 6).cast("decimal(27,6)")
    return (
        j.select(id_col, nll.alias("nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.sum("nll").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def kn_nll_docs(
    docs: DataFrame,
    d: float = KN_D,
    beta: float = KN_BETA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-train + KN-score in one call (the sub-check shape)."""
    bi = bigram_counts(docs, id_col, text_col)
    v = vocab_size(docs, text_col)
    return kn_score_docs(docs, bi, v, d, beta, id_col, text_col)


def kn_nll_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    d: float = KN_D,
    beta: float = KN_BETA,
) -> str:
    """DuckDB twin of kn_nll_docs: identical tokenisation, counts, pinned
    probability association order, and the fround+DECIMAL(27,6) nll sum.
    D/beta enter as CAST(... AS DOUBLE) (never bare decimal literals —
    DuckDB's exact-DECIMAL literal arithmetic diverges from IEEE)."""
    from carrot_transform_spark.functions.rounding import fround_sql

    dd = f"CAST({float(d)!r} AS DOUBLE)"
    bb = f"CAST({float(beta)!r} AS DOUBLE)"
    pc = (
        f"(CAST(COALESCE(c.n1p_bwd, 0) AS DOUBLE) + {bb})"
        f" / (CAST(t.n_types AS DOUBLE) + {bb} * CAST((SELECT v FROM v) AS DOUBLE))"
    )
    disc = (
        f"GREATEST(CAST(COALESCE(b.n, 0) AS DOUBLE) - {dd}, 0.0)"
        f" / CAST(x.c_ctx AS DOUBLE)"
    )
    lam = f"{dd} * CAST(x.n1p_fwd AS DOUBLE) / CAST(x.c_ctx AS DOUBLE)"
    p = f"CASE WHEN x.c_ctx IS NULL THEN {pc} ELSE ({disc}) + ({lam}) * ({pc}) END"
    nll = f"CAST({fround_sql(f'-ln({p})', 6)} AS DECIMAL(27,6))"
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
        SELECT w1, SUM(n) AS c_ctx, COUNT(*) AS n1p_fwd FROM bi GROUP BY w1
    ),
    cont AS MATERIALIZED (
        SELECT w2, COUNT(*) AS n1p_bwd FROM bi GROUP BY w2
    ),
    kn_types AS (SELECT COUNT(*) AS n_types FROM bi),
    v AS (
        SELECT COUNT(DISTINCT w) AS v FROM (
            SELECT unnest(l) AS w FROM toks
        )
    )
    SELECT dx.{id_col},
           COUNT(*) AS n_bigrams,
           CAST(SUM({nll}) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM db dx
    LEFT JOIN bi b ON b.w1 = dx.w1 AND b.w2 = dx.w2
    LEFT JOIN ctx x ON x.w1 = dx.w1
    LEFT JOIN cont c ON c.w2 = dx.w2
    CROSS JOIN kn_types t
    GROUP BY dx.{id_col}
    """


# ---- trigram interpolated Kneser-Ney ------------------------------------
# The full Chen & Goodman 1999 §2.7 recursion, one level up: the trigram
# probability discounts the raw count and interpolates with the BIGRAM
# Kneser-Ney distribution, which itself is built from CONTINUATION counts
# (how many distinct left contexts a bigram completes), not raw counts —
# the property that makes KN the production smoother:
#
#   P(w3|w1w2) = max(c(w1w2w3) - D, 0) / c(w1w2)
#              + (D * N1+(w1w2*) / c(w1w2)) * Pkn(w3|w2)
#   Pkn(w3|w2) = max(N1+(*w2w3) - D, 0) / N1+(*w2*)
#              + (D * N1+(w2*) / N1+(*w2*)) * Pc(w3)
#   Pc(w3)     = (N1+(*w3) + beta) / (N1+(**) + beta * V)
#
# where N1+(x) counts DISTINCT completions/contexts and the bigram-level
# quantities come from the trigram type table (Chen & Goodman's "lower
# order built from types"). Totality for novel histories: c(w1w2) = 0
# backs off to Pkn(w3|w2); N1+(*w2*) = 0 backs off to Pc(w3); novel w3
# carries the add-beta floor — same documented variant as the bigram
# scorer above.
#
# Spark shape: trigram counts are ONE corpus aggregation; every other
# statistic is a groupBy over the trigram TYPE table (tiny by
# comparison); scoring is the doc-trigram stream left-joined to five
# narrow count tables. Engine-stable: integer counts, CAST-double D and
# beta, one pinned association order, fround(6) + DECIMAL(27,6) nll sum.


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) — one row per consecutive token triple."""
    t = _doc_tokens(docs, id_col, text_col)
    n3 = F.greatest(F.size("toks") - 2, F.lit(0))
    tri = F.arrays_zip(
        F.slice("toks", 1, n3).alias("w1"),
        F.slice(F.col("toks"), 2, n3).alias("w2"),
        F.slice(F.col("toks"), 3, n3).alias("w3"),
    )
    return t.select(id_col, F.explode(tri).alias("p")).select(
        id_col,
        F.col("p.w1").alias("w1"),
        F.col("p.w2").alias("w2"),
        F.col("p.w3").alias("w3"),
    )


def kn3_score_docs(
    docs: DataFrame,
    trigrams: DataFrame,
    v: int,
    d: float = KN_D,
    beta: float = KN_BETA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_trigrams, avg_nll) under trigram interpolated Kneser-Ney.
    ``trigrams`` is the (w1, w2, w3, n) corpus count table; ``v`` the
    vocabulary size. Documents with fewer than three tokens are absent
    (no trigrams to judge)."""
    # history counts c(w1w2) + distinct continuations N1+(w1w2*)
    hist = trigrams.groupBy("w1", "w2").agg(
        F.sum("n").alias("c_hist"), F.count(F.lit(1)).alias("n1p_hist")
    )
    # bigram-level continuation stats from the trigram TYPE table:
    # N1+(*w2w3), N1+(*w2*) and the middle's distinct right types N1+(w2*)
    cont23 = trigrams.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).alias("n1p_c23")
    )
    mid = cont23.groupBy("w2").agg(
        F.sum("n1p_c23").alias("n1p_mid"), F.count(F.lit(1)).alias("n1p_right")
    )
    # unigram continuation N1+(*w3) over distinct (w2, w3) types and the
    # global bigram type count N1+(**)
    cont3 = cont23.groupBy("w3").agg(F.count(F.lit(1)).alias("n1p_c3"))
    types = cont23.agg(F.count(F.lit(1)).alias("n_types"))

    dd = F.lit(float(d))
    bb = F.lit(float(beta))
    db = _doc_trigrams(docs, id_col, text_col)
    j = (
        db.join(trigrams, ["w1", "w2", "w3"], "left")
        .join(hist, ["w1", "w2"], "left")
        .join(cont23, ["w2", "w3"], "left")
        .join(mid, ["w2"], "left")
        .join(cont3, ["w3"], "left")
        .crossJoin(F.broadcast(types))
    )
    pc = (F.coalesce(F.col("n1p_c3"), F.lit(0)).cast("double") + bb) / (
        F.col("n_types").cast("double") + bb * F.lit(float(v))
    )
    n1p_mid = F.col("n1p_mid").cast("double")
    disc2 = (
        F.greatest(
            F.coalesce(F.col("n1p_c23"), F.lit(0)).cast("double") - dd, F.lit(0.0)
        )
        / n1p_mid
    )
    lam2 = dd * F.col("n1p_right").cast("double") / n1p_mid
    pkn2 = F.when(F.col("n1p_mid").isNull(), pc).otherwise(disc2 + lam2 * pc)
    c_hist = F.col("c_hist").cast("double")
    disc3 = (
        F.greatest(F.coalesce(F.col("n"), F.lit(0)).cast("double") - dd, F.lit(0.0))
        / c_hist
    )
    lam3 = dd * F.col("n1p_hist").cast("double") / c_hist
    p = F.when(F.col("c_hist").isNull(), pkn2).otherwise(disc3 + lam3 * pkn2)
    from carrot_transform_spark.functions.rounding import fround

    nll = fround(-F.log(p), 6).cast("decimal(27,6)")
    return (
        j.select(id_col, nll.alias("nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (F.sum("nll").cast("double") / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def kn3_nll_docs(
    docs: DataFrame,
    d: float = KN_D,
    beta: float = KN_BETA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-train + trigram-KN-score in one call (the sub-check shape)."""
    tri = (
        _doc_trigrams(docs, id_col, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    v = vocab_size(docs, text_col)
    return kn3_score_docs(docs, tri, v, d, beta, id_col, text_col)


def kn3_nll_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    d: float = KN_D,
    beta: float = KN_BETA,
) -> str:
    """DuckDB twin of kn3_nll_docs: identical tokenisation, type-count
    recursion, pinned probability association order and the
    fround+DECIMAL(27,6) nll sum."""
    from carrot_transform_spark.functions.rounding import fround_sql

    dd = f"CAST({float(d)!r} AS DOUBLE)"
    bb = f"CAST({float(beta)!r} AS DOUBLE)"
    pc = (
        f"(CAST(COALESCE(c3.n1p_c3, 0) AS DOUBLE) + {bb})"
        f" / (CAST(t.n_types AS DOUBLE) + {bb} * CAST((SELECT v FROM v) AS DOUBLE))"
    )
    disc2 = (
        f"GREATEST(CAST(COALESCE(c23.n1p_c23, 0) AS DOUBLE) - {dd}, 0.0)"
        f" / CAST(m.n1p_mid AS DOUBLE)"
    )
    lam2 = f"{dd} * CAST(m.n1p_right AS DOUBLE) / CAST(m.n1p_mid AS DOUBLE)"
    pkn2 = f"CASE WHEN m.n1p_mid IS NULL THEN {pc} ELSE ({disc2}) + ({lam2}) * ({pc}) END"
    disc3 = (
        f"GREATEST(CAST(COALESCE(tr.n, 0) AS DOUBLE) - {dd}, 0.0)"
        f" / CAST(h.c_hist AS DOUBLE)"
    )
    lam3 = f"{dd} * CAST(h.n1p_hist AS DOUBLE) / CAST(h.c_hist AS DOUBLE)"
    p = f"CASE WHEN h.c_hist IS NULL THEN {pkn2} ELSE ({disc3}) + ({lam3}) * ({pkn2}) END"
    nll = f"CAST({fround_sql(f'-ln({p})', 6)} AS DECIMAL(27,6))"
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT {id_col},
               list_filter(regexp_split_to_array({text_col}, '{_WS}'),
                           t -> t <> '') AS l
        FROM {table}
    ),
    db3 AS MATERIALIZED (
        SELECT {id_col}, l[u.i] AS w1, l[u.i + 1] AS w2, l[u.i + 2] AS w3
        FROM toks, UNNEST(range(1, len(l) - 1)) AS u(i)
    ),
    tri AS MATERIALIZED (
        SELECT w1, w2, w3, COUNT(*) AS n FROM db3 GROUP BY w1, w2, w3
    ),
    hist AS MATERIALIZED (
        SELECT w1, w2, SUM(n) AS c_hist, COUNT(*) AS n1p_hist
        FROM tri GROUP BY w1, w2
    ),
    cont23 AS MATERIALIZED (
        SELECT w2, w3, COUNT(*) AS n1p_c23 FROM tri GROUP BY w2, w3
    ),
    mid AS MATERIALIZED (
        SELECT w2, SUM(n1p_c23) AS n1p_mid, COUNT(*) AS n1p_right
        FROM cont23 GROUP BY w2
    ),
    cont3 AS MATERIALIZED (
        SELECT w3, COUNT(*) AS n1p_c3 FROM cont23 GROUP BY w3
    ),
    kn3_types AS (SELECT COUNT(*) AS n_types FROM cont23),
    v AS (
        SELECT COUNT(DISTINCT w) AS v FROM (
            SELECT unnest(l) AS w FROM toks
        )
    )
    SELECT dx.{id_col},
           COUNT(*) AS n_trigrams,
           CAST(SUM({nll}) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM db3 dx
    LEFT JOIN tri tr ON tr.w1 = dx.w1 AND tr.w2 = dx.w2 AND tr.w3 = dx.w3
    LEFT JOIN hist h ON h.w1 = dx.w1 AND h.w2 = dx.w2
    LEFT JOIN cont23 c23 ON c23.w2 = dx.w2 AND c23.w3 = dx.w3
    LEFT JOIN mid m ON m.w2 = dx.w2
    LEFT JOIN cont3 c3 ON c3.w3 = dx.w3
    CROSS JOIN kn3_types t
    GROUP BY dx.{id_col}
    """
