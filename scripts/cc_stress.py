"""Adversarial-diameter stress for connected components.

The near-dup graphs CC normally sees have tiny diameter (~3 rounds for
min-label propagation), so this script drives the worst case instead: one
chain of N links (diameter N — propagation would need N rounds) plus a
forest of K random star-ish clusters, through connected_components_star.
Correctness is asserted structurally (chain collapses to one component
labeled 0; cluster count matches), wall time and row counts are printed
for BASELINE.md.

Usage: python scripts/cc_stress.py [chain_links] [n_clusters] [cluster_size]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from carrot_transform_spark.operators.dedup import connected_components_star
from carrot_transform_spark.session import get_spark


def main() -> None:
    chain_links = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    cluster_size = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spark = get_spark(app_name="cc-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # chain: 0-1-2-...-N (node ids [0, N]); diameter = chain_links
    chain = spark.range(chain_links).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    # clusters: star around each hub h (ids offset past the chain)
    offset = chain_links + 1
    clusters = (
        spark.range(n_clusters * (cluster_size - 1))
        .select(
            (
                F.lit(offset) + (F.col("id") / (cluster_size - 1)).cast("long") * cluster_size
            ).alias("id_a"),
            (
                F.lit(offset)
                + (F.col("id") / (cluster_size - 1)).cast("long") * cluster_size
                + F.col("id") % (cluster_size - 1)
                + 1
            ).alias("id_b"),
        )
    )
    edges = chain.unionByName(clusters)
    n_edges = edges.count()

    t0 = time.time()
    labels = connected_components_star(edges, max_iter=40)
    agg = labels.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.countDistinct("component_id").alias("components"),
        F.sum(F.when(F.col("component_id") == 0, 1).otherwise(0)).alias("chain_nodes"),
    ).collect()[0]
    wall = time.time() - t0

    assert agg["chain_nodes"] == chain_links + 1, agg
    assert agg["components"] == 1 + n_clusters, agg
    print(
        f"edges={n_edges:,} nodes={agg['nodes']:,} components={agg['components']:,} "
        f"chain_diameter={chain_links:,} wall={wall:.1f}s "
        f"({agg['nodes'] / wall:,.0f} nodes/s)"
    )


if __name__ == "__main__":
    main()
