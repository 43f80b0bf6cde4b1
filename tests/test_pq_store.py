"""IVF-PQ store (streaming/ann_index.py maintain_pq_index / search_pq_store).

PQ is lossy by design, so the contracts are: codes are identical to a
one-shot encode with the same frozen codebooks; replay retrains/encodes
identically; and ADC search recall against exact brute force clears a
deterministic floor (everything is hash-derived, so the measured recall
is a constant of the code, not a flake)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.pq import encode
from carrot_transform_spark.operators.similarity import cosine_topk
from carrot_transform_spark.streaming.ann_index import (
    _load_codebooks,
    maintain_pq_index,
    pq_store,
    search_pq_store,
)


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


def test_pq_store_stream_and_search(vecs, centroids, tmp_path):
    spark = vecs.sparkSession
    flat = tmp_path / "flat"
    flat.mkdir()
    import shutil

    for i in range(2):
        part = tmp_path / f"p{i}"
        vecs.filter(F.col("vec_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(part))
        shutil.copy(next(part.glob("part-*.parquet")), flat / f"{i:02d}.parquet")

    stream = (
        spark.readStream.format("parquet")
        .schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(flat))
    )
    q = maintain_pq_index(
        stream,
        store_dir=str(tmp_path / "store"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        centroids=centroids,
        m=8,
        k_sub=16,
    )
    q.awaitTermination(300)

    store = pq_store(spark, str(tmp_path / "store"))
    assert len(store.units()) == 2
    books = _load_codebooks(store)
    assert len(books) == 8 and len(books[0]) == 16

    # stored codes == one-shot encode of the full corpus with the SAME
    # frozen books (trained on batch 0 = even vec_ids)
    stored = store.load("codes")
    one_shot = encode(vecs, books)
    assert _rows(stored.select("id", "code")) == _rows(one_shot)
    assert stored.count() == vecs.count()

    # ADC approximates squared L2, so the recall oracle is exact L2 — and
    # PQ at m=8/k16 on this corpus is intrinsically coarse (the operator
    # test's floor is >=4/10 overlap for one query). The store-level floor
    # is the summed top-10 overlap across 10 queries; measured 32/100,
    # fully deterministic (hash-derived data, no RNG), floor set at 25.
    allv = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in vecs.collect()}
    total_overlap = 0
    for qid in sorted(allv)[:10]:
        qv = allv[qid]
        got = search_pq_store(
            spark, str(tmp_path / "store"), qv,
            centroids, n_probe=len(centroids), k=10,
        )
        ids = {r["neighbor_id"] for r in got.collect()}
        exact = {
            vid
            for _, vid in sorted(
                (sum((a - b) ** 2 for a, b in zip(qv, v)), vid)
                for vid, v in allv.items()
            )[:10]
        }
        total_overlap += len(ids & exact)
    assert total_overlap >= 25, f"PQ recall floor broken: {total_overlap}/100"
