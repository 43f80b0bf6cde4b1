"""TF-IDF cosine-similarity sub-check (part of sim_blocking_suite).

The synthetic corpus has a ~31-word vocabulary, so every term is near-
ubiquitous and pairwise TF-IDF cosines cluster high — an unbounded
threshold check would be O(n²) rows and tell us nothing. The check is
bounded instead: pairs within a doc-id slice, global top-N under a total
order (cosine DESC, doc_a, doc_b), which is non-vacuous and identically
sized at every scale factor. The operator itself (operators/tfidf.py)
guards real corpora with max_df — the stop-word cutoff that both shrinks
the inverted index and bounds per-term join fan-out at 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from carrot_transform_spark.operators.tfidf import (
    cosine_pairs,
    cosine_pairs_sql,
    tfidf_weights,
    tfidf_weights_sql,
)
from carrot_transform_spark.queries import load, qpersist

_SLICE = 80  # doc_id < _SLICE; covers the whole corpus at sf0.001
_TOP = 40


def sim_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _SLICE)
    # the weights frame feeds three consumers (pair join a-side, b-side,
    # norms) — persist it once instead of re-running scan+explode+agg 3x
    w = qpersist(tfidf_weights(d, idf_mode="ratio"))
    pairs = cosine_pairs(w, threshold=0.0)
    rn = F.row_number().over(
        Window.orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
    )
    return (
        pairs.withColumn("rnk", rn)
        .filter(F.col("rnk") <= _TOP)
        .select("doc_a", "doc_b", "cosine", "rnk")
    )


TFIDF_SQL = f"""
    SELECT doc_a, doc_b, cosine, rnk FROM (
        SELECT doc_a, doc_b, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_a, doc_b) AS rnk
        FROM ({cosine_pairs_sql(
            tfidf_weights_sql(
                f"(SELECT * FROM documents WHERE doc_id < {_SLICE}) docs",
                "doc_id",
                "text",
            ),
            threshold=0.0,
        )}) p
    ) ranked WHERE rnk <= {_TOP}
    """
