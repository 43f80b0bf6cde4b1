"""Cross-cell recall for SemDeDup (operators/semdedup.semantic_dedup with
n_probe > 1): a planted near-duplicate pair straddling a cell boundary —
each member's primary cell is different — is PROVABLY invisible to
single-cell blocking and must be found by the multi-probe pair stage.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.semdedup import semantic_dedup
from carrot_transform_spark.operators.similarity import (
    assign_cells,
    neardup_pairs,
    neardup_pairs_multiprobe,
)

DIM = 8
# three well-separated centroids
CENTS = [
    [4.0 if d == 0 else 0.0 for d in range(DIM)],
    [4.0 if d == 1 else 0.0 for d in range(DIM)],
    [4.0 if d == 2 else 0.0 for d in range(DIM)],
]
# boundary pair: both near the c0/c1 bisector, tipped to opposite sides
P1 = [1.0 + 0.25, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
P2 = [1.0, 1.0 + 0.25, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
PID1, PID2 = 1_000_001, 1_000_002


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


@pytest.fixture()
def corpus(spark):
    # jittered points firmly inside each cell, plus the planted pair
    rows = []
    for i in range(60):
        c = CENTS[i % 3]
        rows.append(
            (i, [x + ((i * 31 + d * 7) % 11 - 5) / 50.0 for d, x in enumerate(c)])
        )
    rows.append((PID1, P1))
    rows.append((PID2, P2))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_planted_pair_straddles_cells(spark, corpus):
    cells = {
        r["id"]: r["cell"]
        for r in assign_cells(
            corpus.filter(F.col("vec_id") >= PID1), CENTS
        ).collect()
    }
    assert cells[PID1] == 0 and cells[PID2] == 1
    assert _cos(P1, P2) >= 0.9


def test_single_cell_blocking_misses_planted_pair(spark, corpus):
    out = {
        r["id"]: (r["component_id"], r["keep"])
        for r in semantic_dedup(corpus, centroids=CENTS, threshold=0.9).collect()
    }
    # both planted rows survive as singletons: the pair is invisible
    assert out[PID1] == (PID1, 1)
    assert out[PID2] == (PID2, 1)


def test_multiprobe_finds_planted_pair(spark, corpus):
    out = {
        r["id"]: (r["component_id"], r["keep"])
        for r in semantic_dedup(
            corpus, centroids=CENTS, threshold=0.9, n_probe=2
        ).collect()
    }
    assert out[PID1] == (PID1, 1)
    assert out[PID2] == (PID1, 0)  # grouped under the planted min id
    # exactly one row per input row either way
    assert len(out) == corpus.count()


def test_full_probe_equals_bruteforce_pairs(spark, corpus):
    """At n_probe = n_cells the multi-probe pair set IS the all-pairs
    threshold join (here: single-block neardup_pairs)."""
    brute = {
        (r["id_a"], r["id_b"])
        for r in neardup_pairs(
            corpus.withColumn("blk", F.lit(0)), "blk", threshold=0.9
        ).collect()
    }
    mp = {
        (r["id_a"], r["id_b"])
        for r in neardup_pairs_multiprobe(
            corpus, CENTS, n_probe=len(CENTS), threshold=0.9
        ).collect()
    }
    assert mp == brute and (PID1, PID2) in mp
