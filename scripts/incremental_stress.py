#!/usr/bin/env python
"""Incremental-index scale stress: prove a maintenance step costs
O(batch + collisions), not O(corpus).

Usage: python scripts/incremental_stress.py [n_docs] [batch_frac]

Builds the same hash-synthesized corpus as dedup_stress.py (planted
near-dup of doc id-1 at every id % k == 1), commits the first
(1 - batch_frac) of it as the base index, then times ONE
update_minhash_index step for the remaining batch. Reports:

- step wall + batch docs/s,
- from-scratch full-corpus wall at the same total size (the cost the
  incremental path avoids paying per batch),
- planted-pair recall restricted to batch-touching pairs (so the timing
  can't come from a degenerate run).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators import dedup as dd  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402

WORDS = [f"w{i}" for i in range(5000)]
K = 20  # every 20th doc is a planted near-dup of its predecessor


def synth_corpus(spark, n_docs: int):
    """Hash-synthesized 40-word docs, no RNG (mirrors dedup_stress.py)."""
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    seed = F.when(F.col("id") % K == 1, F.col("id") - 1).otherwise(F.col("id"))
    return (
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
                F.col("id") % K == 1,
                F.concat(F.slice("toks", 1, 39), F.array(F.lit("PERTURBED"))),
            ).otherwise(F.col("toks")),
        )
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", "toks").alias("text"))
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    batch_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

    spark = get_spark(app_name="incremental-stress")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="inc_stress_")
    store = f"{tmp}/mh_index"
    cut = int(n_docs * (1 - batch_frac))

    corpus = synth_corpus(spark, n_docs).persist()
    corpus.count()
    base = corpus.filter(F.col("doc_id") < cut)
    batch = corpus.filter(F.col("doc_id") >= cut)
    n_batch = n_docs - cut

    # setup: one-shot base index build + commit (not the measured step)
    t0 = time.perf_counter()
    b_bands, b_index = dd.minhash_index_frames(base, "doc_id", "text")
    dd.save_minhash_index(b_bands, b_index, store)
    t_base = time.perf_counter() - t0
    b_index.unpersist()

    # the measured maintenance step
    t1 = time.perf_counter()
    pairs = dd.update_minhash_index(store, batch, "doc_id", "text", threshold=0.5)
    n_pairs = pairs.count()
    t_step = time.perf_counter() - t1

    # planted pairs whose later member is in the batch
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1)
        & (F.col("id_a") % K == 0)
        & (F.col("id_b") >= cut)
    ).count()
    expected = sum(1 for i in range(cut, n_docs) if i % K == 1)

    # the cost the incremental path avoids: from-scratch at full size
    t2 = time.perf_counter()
    reg: list = []
    full = dd.minhash_lsh_dedup(corpus, "doc_id", "text", threshold=0.5,
                                persist_registry=reg)
    full.count()
    t_full = time.perf_counter() - t2
    for df in reg:
        df.unpersist()

    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_batch": n_batch,
                "base_build_sec": round(t_base, 1),
                "step_sec": round(t_step, 1),
                "batch_docs_per_sec": int(n_batch / t_step),
                "full_rescan_sec": round(t_full, 1),
                "step_vs_rescan": round(t_step / t_full, 3),
                "pairs": n_pairs,
                "planted_found": planted,
                "planted_expected": expected,
                "planted_recall": round(planted / max(expected, 1), 3),
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
