"""BM25 scale stress: full-corpus retrieval at two sizes for linearity +
a hot-term skew leg showing max_df bounds the postings join.

Usage: python scripts/bm25_stress.py [sf_dir] (default data/sf1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.bm25 import bm25_rank  # noqa: E402
from carrot_transform_spark.queries import load  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    spark = get_spark(app_name="bm25-stress", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    d_full = load(spark, sf_dir, "documents").persist()
    n_full = d_full.count()

    def queries(d):
        return d.filter(F.col("doc_id") % 97 == 3).select(
            F.col("doc_id").alias("qid"),
            F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ").alias(
                "qtext"
            ),
        )

    for frac, label in ((2, "half"), (1, "full")):
        d = d_full.filter(F.col("doc_id") % frac == 0)
        q = queries(d)
        t0 = time.time()
        n = bm25_rank(d, q, top_k=10).count()
        print(
            f"{label}: docs={n_full // frac} queries={q.count()} "
            f"rows={n} in {time.time() - t0:.1f}s",
            flush=True,
        )

    # skew leg: with the synthetic ~31-word vocab every term is hot;
    # max_df below the corpus size empties the index (all terms cut) —
    # demonstrate the cutoff bounding the join input vs unbounded
    q = queries(d_full)
    for max_df in (None, n_full // 2):
        t0 = time.time()
        n = bm25_rank(d_full, q, top_k=10, max_df=max_df).count()
        print(f"max_df={max_df}: rows={n} in {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
