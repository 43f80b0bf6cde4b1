"""pagerank_sql cross-engine determinism, pytest-collected.

The Spark<->DuckDB pagerank parity is exercised by the sql_ops_suite oracle
row, but a regression in pagerank_sql itself previously had no pytest
coverage (tests/oracle_compare.py is a harness, not collected). This runs
pagerank_sql through DuckDB on a tiny edge list and compares every rank
EXACTLY against a pure-Python oracle implementing the documented rounding
contract (operators/pagerank.py: per-edge contribution = 9-decimal
floor-round of an IEEE division, cast to DECIMAL(38,12); exact decimal sum;
new rank = 9-decimal floor-round of base + damping * double(sum)).

No SparkSession needed — this pins the SQL twin against the contract; the
Spark side is pinned to the same contract by the suite oracle.
"""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from carrot_transform_spark.operators.pagerank import pagerank_sql

_M = 1_000_000_000
_Q12 = Decimal("1.000000000000")

# multi-edge (4->1 twice), dangling receiver (5 has no out-edges), cycle
EDGES = [(1, 2), (1, 3), (1, 5), (2, 3), (3, 1), (4, 1), (4, 1)]


def _r9(x: float) -> float:
    return math.floor(x * _M + 0.5) / _M


def _pagerank_py(edges, iters=5, damping=0.85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = Counter(s for s, _ in edges)
    n = len(nodes)
    base = (1.0 - damping) / n
    rank = {v: _r9(1.0 / n) for v in nodes}
    for _ in range(iters):
        sums = {v: Decimal(0) for v in nodes}
        for s, d in edges:
            c = _r9(rank[s] / deg[s])
            # DuckDB's DOUBLE -> DECIMAL(38,12) cast: round the exact binary
            # value of the double to 12 decimals, half away from zero.
            sums[d] += Decimal(c).quantize(_Q12, rounding=ROUND_HALF_UP)
        rank = {v: _r9(base + damping * float(sums[v])) for v in nodes}
    return rank


def test_pagerank_sql_matches_python_oracle():
    edges_sql = " UNION ALL ".join(f"SELECT {s} AS src, {d} AS dst" for s, d in EDGES)
    sql = pagerank_sql(edges_sql, iters=5, damping=0.85)
    got = dict(duckdb.sql(sql).fetchall())
    want = _pagerank_py(EDGES, iters=5, damping=0.85)
    assert got == want  # exact float equality — that's the contract


def test_pagerank_sql_iters_zero_is_uniform():
    edges_sql = "SELECT 1 AS src, 2 AS dst"
    got = dict(duckdb.sql(pagerank_sql(edges_sql, iters=0)).fetchall())
    assert got == {1: _r9(0.5), 2: _r9(0.5)}


def test_pagerank_spark_deep_iters_matches_python_oracle(spark):
    """20 rounds crosses the every-8-rounds localCheckpoint lineage cut
    twice — pins that checkpointing changes no values AND that deep
    iteration counts don't accumulate an unanalyzable plan."""
    from carrot_transform_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=20).collect()}
    want = _pagerank_py(EDGES, iters=20, damping=0.85)
    assert got == want  # exact float equality — that's the contract


def test_pagerank_sql_ranks_sum_near_one():
    edges_sql = " UNION ALL ".join(f"SELECT {s} AS src, {d} AS dst" for s, d in EDGES)
    ranks = [r for _, r in duckdb.sql(pagerank_sql(edges_sql, iters=8)).fetchall()]
    # node 5 is dangling, so its mass leaks each round; sum stays in (0, 1]
    assert 0.5 < sum(ranks) <= 1.0 + 1e-9
