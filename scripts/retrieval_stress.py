"""Retrieval-stack scale stress: RRF fusion and MMR rerank at large
query-workload sizes, with a linearity leg (2x queries -> ~2x wall).

Both operators are query-workload-bounded by design (they consume only
the upstream legs' top-k lists, never the corpus), so the stress
generates the WORKLOAD directly: n_q queries x LEG_K-deep rank lists
(fusion) and n_q x LEG_K candidates + n_q x LEG_K^2 pairwise sims (MMR).
Synthetic values are hash-derived (deterministic, no RNG).

Usage: python scripts/retrieval_stress.py [n_queries] (default 50000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.functions.rounding import fround  # noqa: E402
from carrot_transform_spark.operators.hybrid import rrf_fuse  # noqa: E402
from carrot_transform_spark.operators.mmr import mmr_rerank  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402

LEG_K = 20
MMR_K = 5


def _leg(spark, n_q: int, salt: int):
    """n_q x LEG_K rank list: doc ids and order vary per (qid, salt)."""
    base = spark.range(n_q * LEG_K).select(
        (F.col("id") / LEG_K).cast("long").alias("qid"),
        (F.col("id") % LEG_K).cast("int").alias("slot"),
    )
    doc = F.pmod(F.xxhash64("qid", "slot", F.lit(salt)), F.lit(LEG_K * 3)).cast("long")
    return base.select(
        "qid", doc.alias("doc"), (F.col("slot") + 1).alias("rnk")
    ).dropDuplicates(["qid", "doc"])


def _cand(spark, n_q: int):
    base = spark.range(n_q * LEG_K).select(
        (F.col("id") / LEG_K).cast("long").alias("qid"),
        (F.col("id") % LEG_K).cast("long").alias("doc"),
    )
    rel = fround(
        (F.pmod(F.xxhash64("qid", "doc"), F.lit(1000000)).cast("double")) / 1e6, 6
    )
    return base.select("qid", "doc", rel.alias("rel"))


def _pairs(cand):
    a = cand.select("qid", F.col("doc").alias("doc_a"))
    b = cand.select(F.col("qid").alias("qid_b"), F.col("doc").alias("doc_b"))
    sim = fround(
        (F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(1000000)).cast("double")) / 1e6, 6
    )
    return a.join(
        b, (F.col("qid") == F.col("qid_b")) & (F.col("doc_a") != F.col("doc_b"))
    ).select("qid", "doc_a", "doc_b", sim.alias("sim"))


def _run_fuse(spark, n_q: int) -> tuple[float, int]:
    t0 = time.time()
    out = rrf_fuse([_leg(spark, n_q, 1), _leg(spark, n_q, 2)], top_k=10)
    n = out.count()
    return time.time() - t0, n


def _run_mmr(spark, n_q: int) -> tuple[float, int]:
    t0 = time.time()
    cand = _cand(spark, n_q)
    out = mmr_rerank(cand, _pairs(cand), lam=0.7, k=MMR_K)
    n = out.count()
    return time.time() - t0, n


def main() -> None:
    n_q = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(
        app_name="retrieval-stress", master="local[16]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = {"n_queries": n_q, "leg_k": LEG_K, "mmr_k": MMR_K}

    for tag, nq in (("half", n_q // 2), ("full", n_q)):
        w, n = _run_fuse(spark, nq)
        res[f"fuse_{tag}"] = {"n_q": nq, "wall_sec": round(w, 2), "rows": n}
        print(f"rrf_fuse {tag}: n_q={nq} rows={n} wall={w:.2f}s", flush=True)
    for tag, nq in (("half", n_q // 2), ("full", n_q)):
        w, n = _run_mmr(spark, nq)
        res[f"mmr_{tag}"] = {"n_q": nq, "wall_sec": round(w, 2), "rows": n}
        print(
            f"mmr_rerank {tag}: n_q={nq} cand={nq * LEG_K} "
            f"pairs~{nq * LEG_K * (LEG_K - 1)} rows={n} wall={w:.2f}s",
            flush=True,
        )

    fr = res["fuse_full"]["wall_sec"] / max(res["fuse_half"]["wall_sec"], 1e-9)
    mr = res["mmr_full"]["wall_sec"] / max(res["mmr_half"]["wall_sec"], 1e-9)
    res["fuse_scale_ratio_2x"] = round(fr, 2)
    res["mmr_scale_ratio_2x"] = round(mr, 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
