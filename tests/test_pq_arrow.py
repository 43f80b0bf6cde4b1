"""Arrow fast paths for PQ encode and batch ADC (operators/pq.py).

Parity contract: on corpora with well-separated codewords (no near-exact
distance ties) the arrow paths must reproduce the fold paths exactly —
codes bit-identical, ADC top-k identical in (query, rank) -> neighbor.
The broadcast guard contract: shrinking max_broadcast_bytes to force the
non-broadcast join must not change any result row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.pq import (
    adc_topk_batch,
    encode,
    train_codebooks,
)

DIM = 16
M = 4
K_SUB = 8
N = 200


@pytest.fixture()
def corpus(spark):
    # hash-jittered vectors around two well-separated regions: codeword
    # distances are O(1) apart, far beyond last-ulp summation differences
    return spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.when(F.col("id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(25.0))
            + (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000) / 500.0,
        ).alias("embedding"),
    ).persist()


@pytest.fixture()
def books(corpus):
    return train_codebooks(corpus, m=M, k_sub=K_SUB)


def test_encode_arrow_matches_fold(corpus, books):
    fold = {(r["id"], tuple(r["code"])) for r in encode(corpus, books).collect()}
    arrow = {
        (r["id"], tuple(r["code"]))
        for r in encode(corpus, books, impl="arrow").collect()
    }
    assert arrow == fold and len(fold) == N


def _topk_map(df):
    return {
        (r["query_id"], r["rnk"]): r["neighbor_id"] for r in df.collect()
    }


def test_adc_batch_arrow_matches_fold(spark, corpus, books):
    codes = encode(corpus, books).persist()
    queries = corpus.filter(F.col("vec_id") % 29 == 0)
    fold = _topk_map(adc_topk_batch(codes, queries, books, k=5))
    arrow = _topk_map(adc_topk_batch(codes, queries, books, k=5, impl="arrow"))
    assert arrow == fold and fold


def test_adc_batch_shuffle_join_fallback_same_result(spark, corpus, books):
    codes = encode(corpus, books).persist()
    queries = corpus.filter(F.col("vec_id") % 29 == 0)
    hinted = _topk_map(adc_topk_batch(codes, queries, books, k=5))
    # 1-byte budget: every batch exceeds it, the broadcast hint is dropped
    plain = _topk_map(
        adc_topk_batch(codes, queries, books, k=5, max_broadcast_bytes=1)
    )
    assert plain == hinted and hinted


def test_adc_batch_guard_with_query_cells(spark, corpus, books):
    from carrot_transform_spark.operators.similarity import assign_cells, probe_cells

    centroids = [[0.0] * DIM, [25.0] * DIM]
    cells = assign_cells(corpus, centroids).withColumnRenamed("id", "__cid")
    codes = (
        encode(corpus, books)
        .join(cells, F.col("id") == F.col("__cid"))
        .drop("__cid")
        .persist()
    )
    queries = corpus.filter(F.col("vec_id") % 29 == 0)
    qc = probe_cells(queries, centroids, n_probe=2).withColumnRenamed("id", "query_id")
    hinted = _topk_map(
        adc_topk_batch(codes, queries, books, k=5, query_cells=qc)
    )
    plain = _topk_map(
        adc_topk_batch(
            codes, queries, books, k=5, query_cells=qc, max_broadcast_bytes=1
        )
    )
    assert plain == hinted and hinted
