"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169).

The published data-selection operator for LLM pretraining corpora: given a
small TARGET corpus (the distribution you want, e.g. curated wiki/books)
and a huge RAW crawl, score every raw document by the log importance
weight of a hashed bag-of-n-grams generative model and sample k documents
with probability proportional to the weight (Gumbel top-k, i.e. sampling
without replacement). This fills the gap between the rule-based filters
(operators/quality.py), the perplexity ranker (operators/ngram_lm.py) and
the plain samplers (operators/sampling.py): it selects raw data to MATCH a
target distribution rather than to exceed an absolute quality bar.

Spark-first plan (no UDFs, no driver-sized collects):

1. ``hashed_ngram_counts``: unigram + bigram features per document, each
   hashed into one of B buckets — explode + one map-side-combined groupBy;
   the only corpus-sized shuffle.
2. bucket model: one groupBy over the (doc, bucket) counts splits totals
   into target/raw sides; the B-row result crossJoins the 1-row grand
   totals (the repo's standard 1-row-broadcast pattern) to form the
   add-alpha log-ratio table  lambda_b = ln p_b - ln q_b.
3. scoring: raw-doc bucket counts equi-join the <=B-row lambda table
   (broadcastable) and aggregate  log_w = sum_b c_b * lambda_b  per doc.
4. resampling: Gumbel key = log_w + g, g = -ln(-ln(u)) with u derived
   from md5(doc_id) — deterministic, engine-reproducible "randomness",
   exactly like ds_weighted_sample / ds_hash_split. Top-k is a global
   TakeOrderedAndProject(k) (no full sort), ranks are assigned on the
   k-row result and broadcast-joined back.

Everything is engine-stable: bucket hashing, the uniform draw and the
Gumbel transform are md5/ln arithmetic reproduced verbatim by the DuckDB
twin (``dsir_sql``); float emissions are fround()-quantized before the
DECIMAL(27,6) render. Tokenisation matches operators/bpe.py and
operators/ngram_lm.py (explicit [ \\t\\r\\n]+ class, empty tokens dropped)
so all three text stacks agree on word boundaries.

At 100 TB: the feature explode/groupBy is the only job proportional to
corpus size (map-side combine keeps the shuffle at |docs|x|distinct
buckets per doc| <= B rows per doc); the bucket model is B rows total; the
lambda join broadcasts; top-k never materialises a global sort. The
target corpus is typically ~1e4-1e6 docs — its feature pass is noise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from carrot_transform_spark.functions.rounding import fround, fround_sql

_WS = "[ \t\r\n]+"
_US = "\x1f"
DEFAULT_BUCKETS = 1024
DEFAULT_ALPHA = 0.5
# 15 hex chars = 60 bits: positive in a signed 64-bit int in both engines.
_HEX_BITS = 15
_U_DENOM = float(1 << 60)


def _bucket(col, buckets: int):
    """md5-based feature hash -> [0, buckets): identical in DuckDB."""
    h = F.conv(F.substring(F.md5(col), 1, _HEX_BITS), 16, 10).cast("bigint")
    return (h % buckets).alias("bucket")


def _doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(F.split(F.col(text_col), _WS), lambda t: t != "")
    return docs.select(F.col(id_col), toks.alias("toks"))


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram bag counts per document.

    Unigram feature = the token itself; bigram feature = "w1<US>w2". Both
    hash through md5 into [0, buckets). One explode + one groupBy.
    """
    t = _doc_tokens(docs, id_col, text_col)
    npairs = F.greatest(F.size("toks") - 1, F.lit(0))
    bi = F.transform(
        F.arrays_zip(
            F.slice("toks", 1, npairs).alias("w1"),
            F.slice(F.col("toks"), 2, npairs).alias("w2"),
        ),
        lambda p: F.concat_ws(_US, p["w1"], p["w2"]),
    )
    feats = t.select(id_col, F.explode(F.concat("toks", bi)).alias("feat"))
    return (
        feats.select(id_col, _bucket(F.col("feat"), buckets))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_bucket_model(
    feats: DataFrame,
    is_target,
    id_col: str = "doc_id",
    alpha: float = DEFAULT_ALPHA,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, t_cnt, r_cnt, lam): the add-alpha hashed-n-gram log-ratio.

    ``is_target`` is a Column predicate over ``id_col`` splitting documents
    into the target corpus vs the raw pool. lam_b = ln((t_b + a)/(T + aB))
    - ln((r_b + a)/(R + aB)).
    """
    sided = feats.withColumn("_t", is_target)
    bt = sided.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("t_cnt"),
        F.sum(F.when(~F.col("_t"), F.col("c")).otherwise(F.lit(0))).alias("r_cnt"),
    )
    totals = bt.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    ab = alpha * buckets
    return bt.crossJoin(F.broadcast(totals)).select(
        "bucket",
        "t_cnt",
        "r_cnt",
        (
            F.log((F.col("t_cnt") + F.lit(alpha)) / (F.col("t_tot") + F.lit(ab)))
            - F.log((F.col("r_cnt") + F.lit(alpha)) / (F.col("r_tot") + F.lit(ab)))
        ).alias("lam"),
    )


def dsir_scores(
    docs: DataFrame,
    is_target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
    persist_registry: list | None = None,
) -> DataFrame:
    """(id, n_feats, log_w) for every RAW document (target docs are the
    model, not candidates). Docs with no tokens score log_w = 0 with
    n_feats = 0 — they carry no evidence either way.

    The feature frame feeds BOTH the bucket model and the scoring branch;
    it is persisted (and materialized) so the corpus-sized tokenize +
    explode + hash + groupBy runs once, not once per branch (plan audit:
    unpersisted, the executedPlan re-derived it from the parquet scan in
    each branch)."""
    feats = hashed_ngram_counts(docs, id_col, text_col, buckets).persist()
    if persist_registry is not None:
        persist_registry.append(feats)
    feats.count()
    model = dsir_bucket_model(feats, is_target, id_col, alpha, buckets)
    raw_feats = feats.filter(~is_target)
    scored = (
        raw_feats.join(F.broadcast(model.select("bucket", "lam")), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("lam")).alias("log_w"),
        )
    )
    base = docs.filter(~is_target).select(id_col)
    return base.join(scored, [id_col], "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
    )


def _gumbel_key(id_col: str):
    """log_w + Gumbel(0,1) with u drawn deterministically from md5(id):
    Gumbel top-k == sampling without replacement proportional to w."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("g:"), F.col(id_col).cast("string"))), 1, _HEX_BITS),
        16,
        10,
    ).cast("bigint")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)
    return F.col("log_w") - F.log(-F.log(u))


def dsir_resample(
    scores: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_feats, log_w, g_key, sel_rank): Gumbel top-k selection.

    g_key is fround(log_w + g, 6) — quantized so the ordering both engines
    rank on is the same double. The top-k is a TakeOrderedAndProject (sort
    + limit k, no global sort materialised); ranks are assigned on the
    k-row frame and broadcast-joined back, so the full corpus is never
    windowed in one partition.
    """
    keyed = scores.withColumn("g_key", fround(_gumbel_key(id_col), 6))
    topk = (
        keyed.select(id_col, "g_key")
        .orderBy(F.desc("g_key"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("g_key"), F.asc(id_col))
    ranks = topk.select(id_col, F.row_number().over(w).alias("sel_rank"))
    return keyed.join(F.broadcast(ranks), [id_col], "left").select(
        id_col,
        "n_feats",
        fround("log_w", 6).alias("log_w"),
        "g_key",
        "sel_rank",
    )


def dsir_select_docs(
    docs: DataFrame,
    is_target,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
    persist_registry: list | None = None,
) -> DataFrame:
    """End-to-end DSIR: score every raw doc against the target model and
    Gumbel-top-k resample k of them (sel_rank NULL = not selected)."""
    scores = dsir_scores(
        docs, is_target, id_col, text_col, buckets, alpha, persist_registry
    )
    return dsir_resample(scores, k, id_col)


def dsir_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    target_pred: str = "doc_id % 7 = 0",
    k: int = 100,
    buckets: int = DEFAULT_BUCKETS,
    alpha: float = DEFAULT_ALPHA,
) -> str:
    """DuckDB twin of dsir_select_docs: identical tokenisation, bucket
    hashing, smoothing, Gumbel arithmetic and rank tie-breaks."""
    ab = alpha * buckets
    bucket = (
        "CAST(CAST(CONCAT('0x', substring(md5(feat), 1, {n})) AS UBIGINT)"
        " % {b} AS BIGINT)"
    ).format(n=_HEX_BITS, b=buckets)
    h_g = (
        "CAST(CAST(CONCAT('0x', substring(md5('g:' || CAST({id} AS VARCHAR)),"
        " 1, {n})) AS UBIGINT) AS BIGINT)"
    ).format(id=id_col, n=_HEX_BITS)
    return f"""
    WITH tflag AS MATERIALIZED (
        -- target membership computed ONCE on the raw table: textual
        -- predicate rewriting per use-site corrupts any predicate where
        -- id_col appears as a substring of another identifier or inside
        -- a string literal
        SELECT {id_col}, CASE WHEN {target_pred} THEN TRUE ELSE FALSE END AS is_t
        FROM {table}
    ),
    toks AS MATERIALIZED (
        SELECT {id_col},
               list_filter(regexp_split_to_array({text_col}, '{_WS}'),
                           t -> t <> '') AS l
        FROM {table}
    ),
    feats AS MATERIALIZED (
        SELECT {id_col}, unnest(l) AS feat FROM toks
        UNION ALL
        SELECT {id_col}, l[u.i] || chr(31) || l[u.i + 1] AS feat
        FROM toks, UNNEST(range(1, len(l))) AS u(i)
    ),
    fc AS MATERIALIZED (
        SELECT {id_col}, {bucket} AS bucket, COUNT(*) AS c
        FROM feats GROUP BY 1, 2
    ),
    bt AS (
        SELECT bucket,
               SUM(CASE WHEN t.is_t THEN c ELSE 0 END) AS t_cnt,
               SUM(CASE WHEN t.is_t THEN 0 ELSE c END) AS r_cnt
        FROM fc JOIN tflag t USING ({id_col}) GROUP BY bucket
    ),
    lam AS (
        SELECT bucket,
               ln((t_cnt + {alpha}) / ((SELECT SUM(t_cnt) FROM bt) + {ab}))
             - ln((r_cnt + {alpha}) / ((SELECT SUM(r_cnt) FROM bt) + {ab}))
               AS lam
        FROM bt
    ),
    scored AS (
        SELECT f.{id_col},
               SUM(f.c) AS n_feats,
               SUM(f.c * l.lam) AS log_w
        FROM fc f JOIN lam l USING (bucket) JOIN tflag t USING ({id_col})
        WHERE NOT t.is_t
        GROUP BY f.{id_col}
    ),
    base AS (
        SELECT d.{id_col},
               COALESCE(s.n_feats, 0) AS n_feats,
               COALESCE(s.log_w, 0.0) AS log_w
        FROM {table} d JOIN tflag t USING ({id_col})
                       LEFT JOIN scored s USING ({id_col})
        WHERE NOT t.is_t
    ),
    keyed AS (
        SELECT {id_col}, n_feats, log_w,
               {fround_sql(f"log_w - ln(-ln(({h_g} + 0.5) / {_U_DENOM!r}))", 6)}
                   AS g_key
        FROM base
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY g_key DESC, {id_col}) AS rn
        FROM keyed
    )
    SELECT {id_col}, n_feats,
           {fround_sql("log_w", 6)} AS log_w,
           g_key,
           CASE WHEN rn <= {k} THEN rn END AS sel_rank
    FROM ranked
    """
