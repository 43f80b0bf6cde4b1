"""Partition-layout invariance for the dedup/similarity family.

At 100 TB the physical layout (number of partitions, row placement,
task ordering) is whatever the cluster happens to produce; every operator
whose output feeds a correctness gate must return the SAME rows for any
layout. Hash-based operators earn this by construction (deterministic
per-row hashes, order-independent aggregations) — these tests pin it by
running each operator over three adversarial layouts of the same data:
one partition, many tiny partitions, and a skewed two-bucket split.
"""

import pyspark.sql.functions as F
import pytest

import carrot_transform_spark.operators.dedup as dd
from carrot_transform_spark.operators.sampling import stratified_sample

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2, "the quick brown fox jumps over the lazy dog again and again!", "en"),
    (3, "completely different content with no overlap to speak of here", "en"),
    (4, "el zorro marron salta sobre el perro perezoso una y otra vez", "es"),
    (5, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (6, "yet another entirely unrelated document about spark physical plans", "en"),
    (7, "el zorro marron salta sobre el perro perezoso una y otra vez si", "es"),
    (8, "short", "en"),
]


def _layouts(spark):
    base = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return [
        base.coalesce(1),
        base.repartition(16),
        base.repartition(2, (F.col("doc_id") % 2).cast("int")),  # skewed-ish
    ]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("op", ["minhash", "simhash", "sample"])
def test_layout_invariance(spark, op):
    results = []
    for layout in _layouts(spark):
        if op == "minhash":
            out = dd.minhash_lsh_dedup(layout, "doc_id", "text", threshold=0.5)
        elif op == "simhash":
            sig = dd.simhash_signatures(layout, "doc_id", "text", bits=64)
            out = dd.hamming_pairs(sig, max_distance=8, prefix_bits=16)
        else:
            out = stratified_sample(
                layout, "doc_id", "lang", {"en": 0.5, "es": 1.0}
            ).select("doc_id")
        results.append(_rows(out))
    assert results[0] == results[1] == results[2], f"{op} depends on layout"
    if op == "minhash":
        # sanity: the planted dup pairs actually surface
        pairs = {(a, b) for a, b, _ in results[0]}
        assert (1, 5) in pairs and (1, 2) in pairs
