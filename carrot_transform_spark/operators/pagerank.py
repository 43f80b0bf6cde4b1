"""PageRank on the DataFrame API — the canonical iterative graph operator.

Each iteration is one keyed join (edges ⋈ ranks on src) plus one keyed
aggregation (contributions grouped by dst): two shuffles per round, state
bounded by |nodes|, no driver-side data beyond the node count. That is
the same shape GraphX/Pregel executes; on 100 TB the edge list partitions
by src and the rank table co-partitions with it, so each round reuses the
same exchange.

Determinism contract (what makes an ITERATIVE algorithm oracle-checkable,
same recipe as operators/kmeans.py): per-edge contributions are a single
IEEE division rounded to 9 decimals with the engine-stable floor trick,
summed in exact DECIMAL(38,12) (order-independent), and each new rank is
re-rounded to 9 decimals — so iteration t+1's inputs are bit-identical in
any engine that computed iteration t. A DuckDB twin unrolled to the same
number of rounds (pagerank_sql) reproduces every rank exactly.

Multi-edges contribute once per edge; dangling nodes (out-degree 0) keep
contributing nothing and still receive the teleport base — the standard
simplification when the graph construction guarantees out-edges.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DDEC = "decimal(38,12)"
_M = 1_000_000_000  # 9-decimal engine-stable rounding


def _r9(col):
    return F.floor(col * _M + F.lit(0.5)) / _M


def _r9f(x: float) -> float:
    return math.floor(x * _M + 0.5) / _M


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    persist_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """(node, rank) after `iters` rounds from a uniform start. The only
    driver action is the node count (the teleport base's denominator).
    The persisted node set backs every round AND the returned frame; pass
    persist_registry to unpersist it after materializing the result."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct().persist()
    if persist_registry is not None:
        persist_registry.append(nodes)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(_r9f(1.0 / n)).alias("rank"))
    for t in range(iters):
        contrib = (
            e.join(ranks, e.src == F.col("node"))
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                _r9(F.col("rank") / F.col("deg")).cast(_DDEC).alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                _r9(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        # ranks is referenced once per round, so lineage grows linearly (not
        # the CC loop's exponential case) — but Catalyst re-analyzes the whole
        # accumulated tree per action, a quadratic cost that bites past ~20
        # rounds. Cut lineage every 8 rounds; checkpointing changes no values,
        # so the unrolled DuckDB twin stays exact.
        if (t + 1) % 8 == 0 and t + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_sql(
    edges_sql: str, iters: int = 5, damping: float = 0.85
) -> str:
    """DuckDB twin: the same rounds unrolled as chained CTEs. edges_sql must
    yield (src, dst)."""
    r9 = lambda x: f"FLOOR(({x}) * {_M} + 0.5) / {_M}"
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, {r9('CAST(1.0 AS DOUBLE) / nn.n')} AS rank FROM nodes, nn)",
    ]
    # CAST the teleport constants to DOUBLE so DuckDB performs the same IEEE
    # subtract-then-divide Python used for Spark's literal base — DECIMAL
    # parsing of 1.0/0.85 can differ by 1 ulp before the 9-decimal rounding.
    new_rank = (
        f"(CAST(1.0 AS DOUBLE) - CAST({damping} AS DOUBLE)) / nn.n"
        f" + CAST({damping} AS DOUBLE) * COALESCE(CAST(s.s AS DOUBLE), 0.0)"
    )
    for t in range(iters):
        contrib = (
            f"SELECT e.dst AS node, CAST({r9(f'r{t}.rank / deg.deg')} AS DECIMAL(38,12)) AS c "
            f"FROM edges e JOIN r{t} ON e.src = r{t}.node JOIN deg ON e.src = deg.src"
        )
        ctes.append(
            f"r{t + 1} AS (SELECT nodes.node, "
            f"{r9(new_rank)} AS rank "
            f"FROM nodes CROSS JOIN nn LEFT JOIN "
            f"(SELECT node, SUM(c) AS s FROM ({contrib}) GROUP BY node) s ON nodes.node = s.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, rank FROM r{iters}"
