"""Streaming IVF vector-index maintenance (streaming/ann_index.py).

Invariants: union of per-step pair outputs == one-shot cell-blocked
neardup_pairs over the full corpus; final store == full corpus with cells;
restart over the same checkpoint is a no-op.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.similarity import (
    assign_cells,
    cosine_topk,
    neardup_pairs,
)
from carrot_transform_spark.streaming.ann_index import (
    ivf_corpus,
    maintain_vector_index,
    search_vector_store,
    vector_store,
)

_THRESH = 0.2  # low enough that the small sf0.001 corpus yields pairs


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )


@pytest.fixture(scope="module")
def centroids(vecs):
    rows = vecs.orderBy("vec_id").limit(4).collect()
    return [[float(x) for x in r["embedding"]] for r in rows]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_and_restart_noop(vecs, centroids, tmp_path):
    spark = vecs.sparkSession
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil

    for i in range(3):
        part = tmp_path / f"part{i}"
        vecs.filter(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        shutil.copy(next(part.glob("part-*.parquet")), flat / f"{i:02d}.parquet")

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(vecs.schema)
            .option("maxFilesPerTrigger", 1)
            .load(str(flat))
        )
        q = maintain_vector_index(
            stream,
            store_dir=str(tmp_path / "store"),
            pairs_dir=str(tmp_path / "pairs"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            centroids=centroids,
            threshold=_THRESH,
        )
        q.awaitTermination(300)

    run()

    got_pairs = spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
        "id_a", "id_b", "cosine_sim"
    )
    cells = assign_cells(vecs, centroids).withColumnRenamed("id", "__cid")
    corpus = vecs.join(cells, F.col("vec_id") == F.col("__cid")).drop("__cid")
    expected = neardup_pairs(corpus, "cell", threshold=_THRESH)
    assert _rows(got_pairs) == _rows(expected)
    assert len(_rows(got_pairs)) > 0, "no pairs at this threshold; test is vacuous"

    # store == full corpus with cells (ids + cells; vectors spot-checked by count)
    stored = ivf_corpus(spark, str(tmp_path / "store"))
    assert _rows(stored.select("id", "cell")) == _rows(
        corpus.select(F.col("vec_id").alias("id"), "cell")
    )
    units1 = vector_store(spark, str(tmp_path / "store")).units()
    assert len(units1) == 3

    run()  # restart: no new files -> no new units, pairs unchanged
    assert vector_store(spark, str(tmp_path / "store")).units() == units1
    assert _rows(
        spark.read.parquet(str(tmp_path / "pairs" / "s*")).select(
            "id_a", "id_b", "cosine_sim"
        )
    ) == _rows(expected)

    # query-time search over the store at full probe width == brute force
    queries = vecs.filter(F.col("vec_id") < 5)
    got = search_vector_store(
        spark, str(tmp_path / "store"), queries, centroids,
        n_probe=len(centroids), k=3,
    )
    want = cosine_topk(vecs, queries, k=3)
    assert _rows(got) == _rows(want)

    # cell-partitioned compaction: contents identical, probes prune
    from carrot_transform_spark.streaming.ann_index import compact_vector_store

    compact_vector_store(spark, str(tmp_path / "store"))
    stored2 = ivf_corpus(spark, str(tmp_path / "store"))
    assert _rows(stored2.select("id", "cell")) == _rows(
        corpus.select(F.col("vec_id").alias("id"), "cell")
    )
    one_cell = stored2.filter(F.col("cell") == 0)
    plan = one_cell._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell" in plan or "PartitionFilters: [cell" in plan or (
        "cell#" in plan.split("PartitionFilters")[1][:120]
    ), f"cell filter did not reach PartitionFilters:\n{plan[:800]}"
    # search results unchanged over the compacted layout
    got2 = search_vector_store(
        spark, str(tmp_path / "store"), queries, centroids,
        n_probe=len(centroids), k=3,
    )
    assert _rows(got2) == _rows(want)
