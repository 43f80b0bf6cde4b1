"""The ANN-family codebooks must travel as broadcast DATA, never as plan
literals: a 10^4-cell IVF coarse codebook (the 100 TB shape) has to compile
in the same time and plan size as an 8-cell one. These tests pin that
contract (plan text free of centroid values, plan size flat in the cell
count, compile-time budget at 4,096 cells) plus the numeric contract that
the data-driven argmin matches a driver-side float argmin bit-for-bit.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators import similarity as sim
from carrot_transform_spark.operators.kmeans import assign as km_assign
from carrot_transform_spark.operators.pq import encode as pq_encode

SENTINEL = 123.456789  # planted in centroid payloads; must never hit the plan

DIM = 8


def _vecs(spark, n=64):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: (F.col("id") % 7 + d).cast("double") / 3.0,
            ).alias("embedding"),
        )
    )


def _cents(n_cells, dim=DIM):
    return [
        [SENTINEL if d == 0 else float((c * 31 + d * 7) % 17) / 5.0 for d in range(dim)]
        for c in range(n_cells)
    ]


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_assign_cells_no_literal_centroids(spark):
    out = sim.assign_cells(_vecs(spark), _cents(64))
    plan = _plan(out)
    assert "123.456" not in plan
    # plan text must not grow with the codebook
    plan_big = _plan(sim.assign_cells(_vecs(spark), _cents(512)))
    assert len(plan_big) < len(plan) + 200


def test_probe_cells_no_literal_centroids(spark):
    out = sim.probe_cells(_vecs(spark), _cents(64), n_probe=3)
    assert "123.456" not in _plan(out)


def test_kmeans_assign_no_literal_centroids(spark):
    out = km_assign(_vecs(spark), _cents(64))
    assert "123.456" not in _plan(out)


def test_pq_encode_no_literal_codebooks(spark):
    books = [[[SENTINEL, 2.0], [0.5, 1.5]] for _ in range(DIM // 2)]
    out = pq_encode(_vecs(spark), books)
    assert "123.456" not in _plan(out)


def test_assign_cells_compile_budget_4096_cells(spark):
    t0 = time.perf_counter()
    out = sim.assign_cells(_vecs(spark), _cents(4096))
    out.schema  # forces analysis
    assert time.perf_counter() - t0 < 10.0


def test_assign_cells_matches_driver_argmin(spark):
    cents = _cents(32)
    rows = _vecs(spark, 48).collect()
    got = {r["id"]: r["cell"] for r in sim.assign_cells(_vecs(spark, 48), cents).collect()}

    norms = [sum(x * x for x in c) ** 0.5 or 1.0 for c in cents]
    for r in rows:
        v = list(r["embedding"])
        vn = sum(x * x for x in v) ** 0.5
        sims = []
        for c, cn in zip(cents, norms):
            acc = 0.0
            for x, y in zip(v, c):  # same left-to-right fold as the operator
                acc = acc + x * y
            sims.append(acc / (vn * cn))
        best = max(range(len(cents)), key=lambda i: (sims[i], -i))
        assert got[r["vec_id"]] == best


def test_probe_cells_rank0_equals_assign(spark):
    cents = _cents(16)
    v = _vecs(spark, 40)
    primary = {r["id"]: r["cell"] for r in sim.assign_cells(v, cents).collect()}
    p0 = {
        r["id"]: r["cell"]
        for r in sim.probe_cells(v, cents, n_probe=2).filter("probe_rank = 0").collect()
    }
    assert p0 == primary


def test_assign_cells_arrow_matches_fold_on_separated_cells(spark):
    # well-separated centroids: summation-order differences can't flip the
    # argmax, so the BLAS path must agree with the fold path exactly
    cents = _cents(24)
    v = _vecs(spark, 96)
    fold = {r["id"]: r["cell"] for r in sim.assign_cells(v, cents).collect()}
    arrow = {r["id"]: r["cell"] for r in sim.assign_cells(v, cents, impl="arrow").collect()}
    assert arrow == fold


def test_assign_cells_arrow_preserves_id_type(spark):
    out = sim.assign_cells(_vecs(spark), _cents(8), impl="arrow")
    assert dict(out.dtypes) == {"id": "bigint", "cell": "int"}


def test_probe_cells_arrow_matches_fold(spark):
    cents = _cents(24)
    v = _vecs(spark, 80)
    fold = {(r["id"], r["probe_rank"]): r["cell"]
            for r in sim.probe_cells(v, cents, n_probe=3).collect()}
    arrow = {(r["id"], r["probe_rank"]): r["cell"]
             for r in sim.probe_cells(v, cents, n_probe=3, impl="arrow").collect()}
    assert arrow == fold and fold


def test_knn_multiprobe_full_width_equals_bruteforce(spark):
    """At n_probe = n_cells the multi-probe graph is the exact brute-force
    k-NN graph (every node sees every candidate)."""
    cents = _cents(6)
    v = _vecs(spark, 60)
    full = {
        (r["id"], r["rnk"]): r["neighbor_id"]
        for r in sim.knn_graph_multiprobe(v, cents, n_probe=6, k=3).collect()
    }
    # brute force: single-cell corpus -> within-"cell" join is all-pairs
    one_cell = v.withColumn("c0", F.lit(0))
    brute = {
        (r["id"], r["rnk"]): r["neighbor_id"]
        for r in sim.knn_graph(one_cell, "c0", k=3).collect()
    }
    assert full == brute and full


def test_knn_multiprobe_recall_grows_with_probes(spark):
    cents = _cents(8)
    v = _vecs(spark, 120)
    one_cell = v.withColumn("c0", F.lit(0))
    exact = {
        (r["id"], r["rnk"]): r["neighbor_id"]
        for r in sim.knn_graph(one_cell, "c0", k=3).collect()
    }

    def recall(n_probe):
        got = {
            (r["id"], r["rnk"]): r["neighbor_id"]
            for r in sim.knn_graph_multiprobe(v, cents, n_probe=n_probe, k=3).collect()
        }
        return sum(1 for key, nid in exact.items() if got.get(key) == nid) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    assert recall(8) == 1.0
