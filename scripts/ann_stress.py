#!/usr/bin/env python
"""ANN-family scale stress: coarse quantization, corpus-wide k-NN graph,
and multi-probe IVF search over a hash-synthesized vector corpus.

Usage: python scripts/ann_stress.py [n_vectors] [n_cells] [k] [impl]

impl = "arrow" (default — numpy/BLAS quantization via mapInArrow, the
large-codebook scale path) or "fold" (JVM higher-order-function scoring,
bit-identical to the DuckDB oracles). Both must recover every planted
cell; run both when touching the quantizer.

Vectors are planted near their cell's centroid (pattern + small hash
jitter), so the run validates itself: assign_cells must recover the
planted cell for every vector, and the k-NN graph must only pair
same-cell vectors with full k rows per node. Reports wall + vectors/s
per stage.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.similarity import (  # noqa: E402
    assign_cells,
    ivf_topk_multiprobe,
    knn_graph,
)
from carrot_transform_spark.session import get_spark  # noqa: E402

DIM = 64
_PRIMES = (521, 1031, 2053, 4099, 8209, 16411, 32771, 65537)


def pattern_mod(n_cells: int) -> int:
    # patterns depend only on c mod p, so the modulus must EXCEED the cell
    # count (256 cells under mod 101 collapsed to 101 patterns and broke
    # both the planted check and the cell balance)
    return next(p for p in _PRIMES if p > n_cells)


def centroid(c: int, p: int) -> list[float]:
    return [float((c * 37 + d * 11 + c * d) % p) / 50.0 - 5.0 for d in range(DIM)]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    impl = sys.argv[4] if len(sys.argv) > 4 else "arrow"

    spark = get_spark(app_name="ann-stress")
    spark.sparkContext.setLogLevel("ERROR")
    P = pattern_mod(n_cells)
    cents = [centroid(c, P) for c in range(n_cells)]

    # planted corpus: centroid pattern of cell (id % n_cells) + hash jitter
    # in [-0.1, 0.1] — far inside the inter-centroid separation
    cell = (F.col("id") % n_cells).cast("int")
    jitter_base = F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), F.col("d").cast("string")))
    vecs = (
        spark.range(n)
        .select("id", F.explode(F.sequence(F.lit(0), F.lit(DIM - 1))).alias("d"))
        .select(
            "id",
            "d",
            (
                (((F.col("id") % n_cells) * 37 + F.col("d") * 11
                  + (F.col("id") % n_cells) * F.col("d")) % P) / 50.0 - 5.0
                + (F.conv(F.substring(jitter_base, 1, 6), 16, 10).cast("long") % 201 - 100)
                / 1000.0
            ).cast("float").alias("x"),
        )
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("d", "x"))).alias("dx"))
        .select(
            F.col("id").alias("vec_id"),
            F.transform("dx", lambda s: s["x"]).alias("embedding"),
        )
        .persist()
    )
    vecs.count()

    t0 = time.perf_counter()
    assigned = assign_cells(vecs, cents, impl=impl).persist()
    n_assigned = assigned.count()
    t_assign = time.perf_counter() - t0
    wrong = assigned.filter(F.col("cell") != (F.col("id") % n_cells)).count()

    corpus = vecs.join(
        assigned.withColumnRenamed("id", "__cid"), F.col("vec_id") == F.col("__cid")
    ).drop("__cid").persist()
    corpus.count()

    t1 = time.perf_counter()
    g = knn_graph(corpus, "cell", k=k)
    n_edges = g.count()
    t_knn = time.perf_counter() - t1
    cross_cell = (
        g.join(assigned.withColumnRenamed("id", "nid").withColumnRenamed("cell", "ncell"),
               F.col("neighbor_id") == F.col("nid"))
        .join(assigned.withColumnRenamed("id", "sid").withColumnRenamed("cell", "scell"),
              F.col("id") == F.col("sid"))
        .filter(F.col("ncell") != F.col("scell"))
        .count()
    )

    queries = vecs.filter(F.col("vec_id") < 256)
    t2 = time.perf_counter()
    topk = ivf_topk_multiprobe(corpus, queries, cents, n_probe=2, k=k, corpus_cell_col="cell")
    n_topk = topk.count()
    t_ivf = time.perf_counter() - t2

    print(
        json.dumps(
            {
                "n_vectors": n_assigned,
                "impl": impl,
                "n_cells": n_cells,
                "k": k,
                "assign_sec": round(t_assign, 1),
                "assign_vecs_per_sec": int(n / t_assign),
                "assign_wrong": wrong,
                "knn_sec": round(t_knn, 1),
                "knn_edges": n_edges,
                "knn_edges_expected": n * k,
                "knn_cross_cell_edges": cross_cell,
                "knn_vecs_per_sec": int(n / t_knn),
                "ivf_queries": 256,
                "ivf_sec": round(t_ivf, 1),
                "ivf_rows": n_topk,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
