#!/usr/bin/env python
"""PQ encode/ADC fold-vs-arrow stress at the byte-code shape (m=16,
k_sub=256) — the VERDICT r8 task-5 measurement. Prints wall times for
both impls of encode() and adc_topk_batch() and the speedups.

Usage: python scripts/pq_stress.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.pq import adc_topk_batch, encode  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402

DIM = 64
M = 16
K_SUB = 256


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    spark = get_spark(app_name="pq-stress", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    vecs = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda d: (F.pmod(F.xxhash64(F.col("id"), d), F.lit(2001)) - 1000) / 100.0,
            ).alias("embedding"),
        )
        .persist()
    )
    vecs.count()
    # hash-derived books (training at k_sub=256 is not the thing measured)
    import numpy as np

    rng = np.random.default_rng(42)
    books = (rng.standard_normal((M, K_SUB, DIM // M)) * 10).round(3).tolist()

    t0 = time.time()
    encode(vecs, books).write.mode("overwrite").format("noop").save()
    t_fold = time.time() - t0
    t0 = time.time()
    encode(vecs, books, impl="arrow").write.mode("overwrite").format("noop").save()
    t_arrow = time.time() - t0
    print(f"encode n={n} m={M} k_sub={K_SUB}: fold={t_fold:.1f}s arrow={t_arrow:.1f}s "
          f"speedup={t_fold / max(t_arrow, 1e-9):.1f}x", flush=True)

    codes = encode(vecs, books, impl="arrow").persist()
    codes.count()
    queries = vecs.limit(n_q).persist()
    queries.count()
    t0 = time.time()
    adc_topk_batch(codes, queries, books, k=5).write.mode("overwrite").format("noop").save()
    t_fold = time.time() - t0
    t0 = time.time()
    adc_topk_batch(codes, queries, books, k=5, impl="arrow").write.mode(
        "overwrite"
    ).format("noop").save()
    t_arrow = time.time() - t0
    print(f"adc_topk_batch n_q={n_q}: fold={t_fold:.1f}s arrow={t_arrow:.1f}s "
          f"speedup={t_fold / max(t_arrow, 1e-9):.1f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
