"""The replica-restriction invariant in miniature (see
scripts/replica_invariant.py, which runs it against the generated sf10
corpus): replicate a corpus with disjoint token spaces per replica, and
the dedup results restricted to replica 0 must equal the single-corpus
results EXACTLY — extra replicas may add LSH/bucket candidates but can
never change which within-replica pairs survive exact verification."""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators.dedup import (
    exact_dedup_groups,
    hamming_pairs,
    simhash_signatures,
)

OFF = 10_000_000


def _corpus(spark):
    rows = []
    for i in range(40):
        base = f"tok{i % 8} alpha beta gamma delta tok{i % 5} epsilon zeta"
        if i % 4 == 0:
            text = base  # groups of exact dups (same i%8, i%5 pattern)
        else:
            text = base + f" unique{i} filler{i * 7}"
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _replicate(df, factor):
    reps = df.sparkSession.range(factor).select(F.col("id").cast("int").alias("r"))
    return df.crossJoin(reps).select(
        (F.col("doc_id") + F.col("r").cast("long") * OFF).alias("doc_id"),
        F.when(F.col("r") == 0, F.col("text"))
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.split("text", r"\s+"),
                    lambda t: F.concat(t, F.lit("~"), F.col("r").cast("string")),
                ),
            )
        )
        .alias("text"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_groups_restriction(spark):
    small = _corpus(spark)
    big = _replicate(small, 3)
    want = _rows(exact_dedup_groups(small, "doc_id", "text"))
    got_all = exact_dedup_groups(big, "doc_id", "text")
    got = _rows(got_all.filter(F.col("canonical_id") < OFF))
    assert got == want
    # and the replicas tripled the group count without cross-bleed
    assert got_all.count() == 3 * len(want)


def test_simhash_pairs_restriction(spark):
    small = _corpus(spark)
    big = _replicate(small, 3)

    def pairs(df):
        sig = simhash_signatures(df, "doc_id", "text", bits=64)
        return hamming_pairs(sig, max_distance=3).select("id_a", "id_b", "hamming")

    want = _rows(pairs(small))
    assert want, "corpus must actually contain near-dup pairs"
    got = _rows(pairs(big).filter((F.col("id_a") < OFF) & (F.col("id_b") < OFF)))
    assert got == want
