#!/usr/bin/env python
"""Dedup scale stress: generate a large synthetic corpus with planted
near-duplicates and run the MinHash+LSH and SimHash pipelines end-to-end.

Usage: python scripts/dedup_stress.py [n_docs] [dup_pct]

Reports wall time per stage and verifies the planted duplicates are found
(recall on the planted set) so throughput numbers can't come from a
degenerate pipeline.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators import dedup as dd  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402

WORDS = [f"w{i}" for i in range(5000)]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dup_pct = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

    spark = get_spark(app_name="dedup-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # base docs: 40 pseudo-random words drawn by hash arithmetic (no RNG —
    # reproducible). Every k-th doc is a near-dup of doc (id - 1): same text
    # with ONE word changed.
    k = max(int(1 / dup_pct), 2)
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    # seed: unique per doc EXCEPT docs with id % k == 1, which reuse the
    # previous doc's seed (and then get one word perturbed) — so the only
    # similar pairs are the planted (k*i, k*i+1) neighbors
    seed = F.when(F.col("id") % k == 1, F.col("id") - 1).otherwise(F.col("id"))
    base = (
        spark.range(n_docs)
        .withColumn(
            "toks",
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.element_at(
                    words_arr,
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(seed.cast("string"), F.lit(":"), i.cast("string"))),
                                1, 8,
                            ), 16, 10,
                        ).cast("long") % len(WORDS)
                    ).cast("int") + 1,
                ),
            ),
        )
        .withColumn(
            "toks",
            F.when(
                F.col("id") % k == 1,  # near-dup: perturb one word
                F.concat(F.slice("toks", 1, 39), F.array(F.lit("PERTURBED"))),
            ).otherwise(F.col("toks")),
        )
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", "toks").alias("text"))
        .persist()
    )
    n = base.count()

    t0 = time.perf_counter()
    pairs = dd.minhash_lsh_dedup(base, "doc_id", "text", threshold=0.5)
    n_pairs = pairs.count()
    t_minhash = time.perf_counter() - t0

    # planted recall: doc k*i+1 should pair with k*i (jaccard ~ 39/41)
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % k == 0)
    ).count()
    expected_planted = sum(1 for i in range(n_docs) if i % k == 1)

    t1 = time.perf_counter()
    sig = dd.simhash_signatures(base, "doc_id", "text")
    ham = dd.hamming_pairs(sig, max_distance=8, prefix_bits=16)
    n_ham = ham.count()
    t_simhash = time.perf_counter() - t1

    print(
        json.dumps(
            {
                "n_docs": n,
                "minhash_sec": round(t_minhash, 1),
                "minhash_pairs": n_pairs,
                "planted_found": planted,
                "planted_expected": expected_planted,
                "planted_recall": round(planted / max(expected_planted, 1), 3),
                "simhash_sec": round(t_simhash, 1),
                "simhash_pairs": n_ham,
                "docs_per_sec_minhash": int(n / t_minhash),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
