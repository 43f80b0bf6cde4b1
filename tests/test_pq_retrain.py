"""Codebook refresh on drift (streaming/ann_index.retrain_pq_store).

Scenario: books frozen on a first batch from distribution A underquantize
a corpus that drifts to region B (every B subvector collapses onto A-region
codewords, so ADC can no longer rank B candidates). The retrain must
(1) lift recall on drifted queries back over a pinned floor, (2) switch
books and re-encoded codes atomically in ONE unit commit, (3) replay
idempotently, and (4) keep the retrained books through a later routine
compaction (the _meta-* sidecar is carried forward).

Everything is hash-derived — measured recalls are constants of the code,
not flakes.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.streaming.ann_index import (
    _META_BOOKS,
    _load_codebooks,
    pq_step_fn,
    pq_store,
    retrain_pq_store,
    search_pq_store,
)
from carrot_transform_spark.streaming.maintenance import make_step

DIM = 16
M = 4
K_SUB = 8
N_A = 120
N_B = 120


def _vecs(spark, lo, n, offset):
    """n vectors with ids [lo, lo+n): hash-jittered points near `offset`."""
    return spark.range(lo, lo + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: F.lit(float(offset))
            + (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000) / 500.0,
        ).alias("embedding"),
    )


@pytest.fixture()
def corpus(spark):
    a = _vecs(spark, 0, N_A, 0.0)      # region A: around 0
    b = _vecs(spark, N_A, N_B, 40.0)   # drifted region B: around 40
    return a, b, a.unionByName(b).persist()


def _recall(spark, path, centroids, all_rows, query_ids, k=10):
    total = 0
    byid = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in all_rows}
    for qid in query_ids:
        qv = byid[qid]
        got = search_pq_store(spark, path, qv, centroids, n_probe=len(centroids), k=k)
        ids = {r["neighbor_id"] for r in got.collect()}
        exact = {
            vid
            for _, vid in sorted(
                (sum((x - y) ** 2 for x, y in zip(qv, v)), vid)
                for vid, v in byid.items()
            )[:k]
        }
        total += len(ids & exact)
    return total


def test_retrain_restores_recall_after_drift(spark, tmp_path, corpus):
    a, b, full = corpus
    path = str(tmp_path / "store")
    # one centroid per region so IVF routing is not the variable under test
    centroids = [[0.0] * DIM, [40.0] * DIM]
    step = make_step(lambda: pq_store(spark, path), pq_step_fn(centroids, m=M, k_sub=K_SUB))
    step(a, 0)   # trains + freezes books on region A
    step(b, 1)   # drifted batch, encoded with A-books

    all_rows = full.collect()
    drift_q = sorted(r["vec_id"] for r in all_rows if r["vec_id"] >= N_A)[:8]
    before = _recall(spark, path, centroids, all_rows, drift_q)

    unit = retrain_pq_store(spark, path, full, centroids, m=M, k_sub=K_SUB)
    store = pq_store(spark, path)
    assert store.units() == [unit]
    after = _recall(spark, path, centroids, all_rows, drift_q)

    # measured: A-books collapse region B onto a few codewords; retrained
    # books quantize both regions. The retrain must recover a clear margin.
    assert after >= before + 8, f"retrain did not lift drifted recall: {before} -> {after}"
    assert after >= 40, f"pinned post-retrain recall floor broken: {after}/80"

    # atomicity of the transition: the live unit's codes match a fresh
    # encode under the sidecar books (never old codes + new books)
    from carrot_transform_spark.operators.pq import encode

    books = json.loads(store.sidecars(unit)[_META_BOOKS])
    assert _load_codebooks(store) == books
    stored = {(r["id"], tuple(r["code"])) for r in store.load("codes").collect()}
    fresh = {(r["id"], tuple(r["code"])) for r in encode(full, books).collect()}
    assert stored == fresh


def test_drift_triggers_auto_retrain(spark, tmp_path, corpus):
    """With corpus_source set, the drifted batch's distortion blowout must
    trigger the retrain INSIDE the step — recall recovers past the same
    pinned floor as the explicit-call test, with NO retrain_pq_store call."""
    a, b, full = corpus
    path = str(tmp_path / "store")
    centroids = [[0.0] * DIM, [40.0] * DIM]
    step = make_step(
        lambda: pq_store(spark, path),
        pq_step_fn(
            centroids, m=M, k_sub=K_SUB, corpus_source=lambda: full, drift_factor=4.0
        ),
    )
    step(a, 0)   # trains + freezes books + distortion baseline on region A
    step(b, 1)   # drifted batch: distortion >> 4x baseline -> auto retrain

    store = pq_store(spark, path)
    units = store.units()
    # a retrain unit (prefix r) plus the batch unit must both be live
    assert any(u.startswith("r") for u in units), units
    assert _load_codebooks(store) is not None

    all_rows = full.collect()
    drift_q = sorted(r["vec_id"] for r in all_rows if r["vec_id"] >= N_A)[:8]
    after = _recall(spark, path, centroids, all_rows, drift_q)
    assert after >= 40, f"auto-retrain did not recover drifted recall: {after}/80"

    # every stored code row is consistent with the current books: batch b's
    # rows were encoded under the retrained books, never the frozen A-books
    import json as _j

    from carrot_transform_spark.operators.pq import encode

    books = _load_codebooks(store)
    stored = {(r["id"], tuple(r["code"])) for r in store.load("codes").collect()}
    fresh = {(r["id"], tuple(r["code"])) for r in encode(full, books).collect()}
    assert stored == fresh

    # replaying the drifted step is idempotent: distortion under the NEW
    # books is below threshold, so no second retrain unit appears
    step(b, 1)
    units2 = pq_store(spark, path).units()
    assert sum(u.startswith("r") for u in units2) == 1, units2


def test_retrain_replay_is_idempotent(spark, tmp_path, corpus):
    a, b, full = corpus
    path = str(tmp_path / "store")
    centroids = [[0.0] * DIM, [40.0] * DIM]
    step = make_step(lambda: pq_store(spark, path), pq_step_fn(centroids, m=M, k_sub=K_SUB))
    step(a, 0)
    step(b, 1)

    u1 = retrain_pq_store(spark, path, full, centroids, m=M, k_sub=K_SUB)
    store = pq_store(spark, path)
    books1 = store.sidecars(u1)[_META_BOOKS]
    codes1 = sorted((r["id"], tuple(r["code"]), r["cell"]) for r in store.load("codes").collect())

    # crash-replay: run the retrain again (deterministic Lloyd -> identical
    # books; the new unit atomically replaces the old retrain unit)
    u2 = retrain_pq_store(spark, path, full, centroids, m=M, k_sub=K_SUB)
    assert store.units() == [u2]
    assert store.sidecars(u2)[_META_BOOKS] == books1
    codes2 = sorted((r["id"], tuple(r["code"]), r["cell"]) for r in store.load("codes").collect())
    assert codes2 == codes1


def test_retrained_books_survive_routine_compaction(spark, tmp_path, corpus):
    a, b, full = corpus
    path = str(tmp_path / "store")
    centroids = [[0.0] * DIM, [40.0] * DIM]
    step = make_step(lambda: pq_store(spark, path), pq_step_fn(centroids, m=M, k_sub=K_SUB))
    step(a, 0)
    step(b, 1)
    retrain_pq_store(spark, path, full, centroids, m=M, k_sub=K_SUB)
    store = pq_store(spark, path)
    retrained = _load_codebooks(store)

    # a later streamed batch encodes under the retrained books...
    c = _vecs(spark, N_A + N_B, 40, 40.0)
    step(c, 2)
    from carrot_transform_spark.operators.pq import encode

    stored_c = {
        (r["id"], tuple(r["code"]))
        for r in store.load("codes").filter(F.col("id") >= N_A + N_B).collect()
    }
    fresh_c = {(r["id"], tuple(r["code"])) for r in encode(c, retrained).collect()}
    assert stored_c == fresh_c

    # ...and a routine compaction carries the sidecar into the folded unit
    folded = store.fresh_unit("c")
    store.vacuum(store.compact(folded))
    assert store.units() == [folded]
    assert _load_codebooks(store) == retrained


def test_batch_adc_search_matches_per_query_loop(spark, tmp_path, corpus):
    """search_pq_store_batch (one plan for the whole query frame) must
    return exactly what the per-query search_pq_store loop returns, for
    every query, at full probe width."""
    from carrot_transform_spark.streaming.ann_index import (
        search_pq_store,
        search_pq_store_batch,
    )

    a, b, full = corpus
    path = str(tmp_path / "store")
    centroids = [[0.0] * DIM, [40.0] * DIM]
    step = make_step(lambda: pq_store(spark, path), pq_step_fn(centroids, m=M, k_sub=K_SUB))
    step(a, 0)
    step(b, 1)

    queries = full.filter(F.col("vec_id") % 37 == 0)  # a handful from both regions
    batch = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], round(r["approx_dist"], 9))
        for r in search_pq_store_batch(
            spark, path, queries, centroids, n_probe=len(centroids), k=5
        ).collect()
    }
    loop = {}
    for q in queries.collect():
        got = search_pq_store(
            spark, path, [float(x) for x in q["embedding"]], centroids,
            n_probe=len(centroids), k=5,
        )
        for r in got.collect():
            loop[(q["vec_id"], r["rnk"])] = (r["neighbor_id"], round(r["approx_dist"], 9))
    assert batch == loop and batch
