#!/usr/bin/env python
"""Hot-cell stress: k-NN graph over a corpus with one degenerate cell.

Usage: python scripts/hotcell_stress.py [n_vectors] [hot_frac] [cap] [shards]

Plants `hot_frac` of the corpus in cell 0 (default 20% of 1M vectors — the
VERDICT round-6 task-3 shape) and the rest uniformly over 4,096 cells, then
builds the capped + salted k-NN graph. Without the bound, cell 0 alone is
|cell|^2 = 4x10^10 pair scores in ONE task; with max_cell_size=cap and
`shards` salting it is |cell| x cap scores spread over `shards` tasks.

Self-validating:
- every hot-cell node must still receive k edges (the cap bounds the
  candidate side only, nodes are never dropped);
- reports the max/median ratio of per-shuffle-task scored-candidate
  volume (join-key groups mapped to tasks with the same pmod(murmur3)
  rule Spark's HashPartitioning uses), which must stay <= 10x.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.similarity import knn_graph  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402

DIM = 32
N_COLD_CELLS = 4096


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
    # no knobs set -> the operator derives cap/shards from the observed
    # cell-size distribution (similarity._auto_cap)
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else "auto"
    shards = int(sys.argv[4]) if len(sys.argv) > 4 else "auto"
    k = 10

    spark = get_spark(app_name="hotcell-stress")
    spark.sparkContext.setLogLevel("ERROR")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    hot_n = int(n * hot_frac)
    cell = F.when(F.col("id") < hot_n, F.lit(0)).otherwise(
        (F.pmod(F.xxhash64("id"), F.lit(N_COLD_CELLS - 1)) + 1).cast("int")
    )
    # centroid-pattern component + small per-(vector, dim) hash jitter
    vecs = (
        spark.range(n)
        .select("id", cell.alias("cell"))
        .select(
            F.col("id").alias("vec_id"),
            "cell",
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: ((F.col("cell") * 37 + d * 11 + F.col("cell") * d) % 8209)
                / 50.0
                - 5.0
                + (F.pmod(F.xxhash64(F.col("vec_id"), d), F.lit(2001)) - 1000) / 10000.0,
            ).alias("embedding"),
        )
        .persist()
    )
    vecs.count()

    t0 = time.perf_counter()
    g = knn_graph(vecs, "cell", k=k, max_cell_size=cap, shards=shards).persist()
    if cap == "auto" or shards == "auto":
        from carrot_transform_spark.operators.similarity import _auto_cap, _normed

        a_cap, a_shards = _auto_cap(_normed(vecs, "vec_id", "embedding", ["cell"]), "cell")
        cap = (a_cap if a_cap is not None else n) if cap == "auto" else cap
        shards = (a_shards if a_cap is not None else 1) if shards == "auto" else shards
        print(f"auto-derived cap={cap} shards={shards}", flush=True)
    n_edges = g.count()
    wall = time.perf_counter() - t0

    hot_nodes_with_full_k = (
        g.join(vecs.select(F.col("vec_id").alias("id"), "cell"), "id")
        .filter(F.col("cell") == 0)
        .groupBy("id")
        .agg(F.max("rnk").alias("mx"))
        .filter(F.col("mx") >= k)
        .count()
    )

    # scored-candidate volume per shuffle task: nodes-in-(cell,shard) x
    # min(cap, |cell|), groups mapped to tasks with Spark's own
    # pmod(murmur3(join key), numPartitions) rule
    sizes = vecs.groupBy("cell").agg(F.count(F.lit(1)).alias("cell_n"))
    groups = (
        vecs.withColumn("shard", F.pmod(F.xxhash64("vec_id"), F.lit(shards)))
        .groupBy("cell", "shard")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .join(sizes, "cell")
        .withColumn("scores", F.col("n_nodes") * F.least(F.lit(cap), F.col("cell_n")))
    )
    per_task = (
        groups.withColumn("task", F.pmod(F.hash("cell", "shard"), F.lit(n_shuffle)))
        .groupBy("task")
        .agg(F.sum("scores").alias("w"))
    )
    stats = per_task.agg(
        F.expr("percentile_approx(w, 0.5)").alias("med"), F.max("w").alias("mx")
    ).first()
    ratio = float(stats["mx"]) / max(float(stats["med"]), 1.0)

    print(
        json.dumps(
            {
                "n_vectors": n,
                "hot_cell_size": hot_n,
                "cap": cap,
                "shards": shards,
                "knn_sec": round(wall, 1),
                "edges": n_edges,
                "hot_nodes_with_full_k": hot_nodes_with_full_k,
                "hot_nodes_expected": hot_n,
                "task_work_max_over_median": round(ratio, 2),
                "balanced": ratio <= 10.0,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
