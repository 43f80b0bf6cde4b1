"""Deterministic stratified sampling query (training-data mix rebalancing).

Exercises operators/sampling.stratified_sample: downsample over-represented
English docs to 30%, keep other languages at 80% — the classic corpus
rebalance — with a hash rule any engine reproduces exactly.

Registered as part of pipe_ops_suite (queries/pipeline_ops.py), which
bundles the training-pipeline operators into one driver-window entry.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import load
from carrot_transform_spark.operators.sampling import (
    sample_hash_sql,
    sample_threshold_sql,
    stratified_sample,
)

_RATES = {"en": 0.3, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 0.8}

DS_STRATIFIED_SQL = f"""
    WITH kept AS (
        SELECT doc_id, lang, source
        FROM documents
        WHERE {sample_hash_sql("doc_id", "lang")}
              < {sample_threshold_sql("lang", _RATES, default_rate=1.0)}
    )
    SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc
    FROM kept GROUP BY lang ORDER BY lang
    """


def ds_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sample, summarized per stratum (the
    per-row subset is pinned by sum/min/max of kept ids). Pure narrow
    filter — no shuffle for the sample itself; at 100 TB the decision is
    evaluated inside the scan stage."""
    d = load(spark, sf_dir, "documents")
    kept = stratified_sample(d, key_col="doc_id", strata_col="lang", rates=_RATES)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("doc_id").cast("bigint").alias("sum_doc"),
        )
        .orderBy("lang")
    )
