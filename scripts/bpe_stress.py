"""BPE training scale check: per-round cost is FLAT in corpus size.

Two corpora with the SAME distinct-word vocabulary but 10x the
occurrences (each document replicated 10x) must train at ~the same
per-round cost, because every round after the word-dedup pass runs on
the |vocab|-sized words table — the corpus size only affects the one-off
dedup job. The merge sequences must also be IDENTICAL (every pair count
scales by exactly 10, so argmaxes and tie-breaks are unchanged) — a
correctness invariant the scale replication gives us for free.

Usage: python scripts/bpe_stress.py [sf_dir] [n_merges]
Prints one JSON line: dedup seconds scale ~linearly, per-round seconds
stay ~flat (ratio near 1.0), merges_equal must be true.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from carrot_transform_spark.operators.bpe import bpe_train, word_counts  # noqa: E402
from carrot_transform_spark.queries import load  # noqa: E402


def run(docs, n_merges: int) -> dict:
    t0 = time.time()
    w = word_counts(docs).persist()
    n_vocab = w.count()
    t1 = time.time()
    merges, final = bpe_train(w, n_merges)
    t2 = time.time()
    w.unpersist()
    final.unpersist()
    return {
        "n_vocab": n_vocab,
        "dedup_s": round(t1 - t0, 3),
        "per_round_s": round((t2 - t1) / max(len(merges), 1), 4),
        "merges": merges,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    repl = 10
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents").select("text")
    big = docs.select(
        "text",
        F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("r"),
    ).drop("r")

    small = run(docs, n_merges)
    large = run(big, n_merges)

    # second leg: a SYNTHETIC 100k-word vocabulary (md5-derived pseudo-words,
    # 8 per doc) so per-round cost reflects |vocab| work, not bare job
    # latency; corpus again replicated 10x with the vocabulary held fixed
    n_src = 12_500
    syn = spark.range(n_src).select(
        F.concat_ws(
            " ",
            *[
                F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(f"_{k}"))), 1, 9)
                for k in range(8)
            ],
        ).alias("text")
    )
    syn_big = syn.select(
        "text",
        F.explode(F.array(*[F.lit(i) for i in range(repl)])).alias("r"),
    ).drop("r")
    syn_small = run(syn, n_merges)
    syn_large = run(syn_big, n_merges)

    merges_equal = [(a, b, n * repl) for a, b, n in small["merges"]] == large["merges"]
    out = {
        "sf_dir": sf_dir,
        "n_merges": n_merges,
        "repl": repl,
        "vocab_small": small["n_vocab"],
        "vocab_large": large["n_vocab"],
        "dedup_s_small": small["dedup_s"],
        "dedup_s_large": large["dedup_s"],
        "per_round_s_small": small["per_round_s"],
        "per_round_s_large": large["per_round_s"],
        "per_round_ratio": round(
            large["per_round_s"] / max(small["per_round_s"], 1e-9), 3
        ),
        "merges_equal": merges_equal,
        "syn_vocab": syn_small["n_vocab"],
        "syn_dedup_s_small": syn_small["dedup_s"],
        "syn_dedup_s_large": syn_large["dedup_s"],
        "syn_per_round_s_small": syn_small["per_round_s"],
        "syn_per_round_s_large": syn_large["per_round_s"],
        "syn_per_round_ratio": round(
            syn_large["per_round_s"] / max(syn_small["per_round_s"], 1e-9), 3
        ),
        "syn_merges_equal": [
            (a, b, n * repl) for a, b, n in syn_small["merges"]
        ] == syn_large["merges"],
    }
    print(json.dumps(out))
    ok = (
        merges_equal
        and out["syn_merges_equal"]
        and small["n_vocab"] == large["n_vocab"]
        and syn_small["n_vocab"] == syn_large["n_vocab"]
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
