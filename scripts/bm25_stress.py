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

    # multi-query leg (VERDICT r14 task 5): a corpus-sized query set —
    # |queries| = |corpus| + the real battery, far past any sane broadcast;
    # maybe_broadcast's size bound must decline the hint so the qterms
    # join falls back to a shuffle join instead of building a corpus-sized
    # hash table on every executor. Verified on the executed plan, not
    # assumed. The bulk queries use OOV terms: with this synthetic ~31-word
    # vocab EVERY real term is hot, so corpus-sized REAL queries are
    # inherently quadratic in results (Σdf blow-up) no matter the plan —
    # the leg measures the join-strategy fallback, not that degeneracy.
    # bulk queries derive from the LINEITEM scan (the biggest sf table,
    # ~100 MB+ parquet at sf1): maybe_broadcast's plan-size estimate tracks
    # source scan bytes, so a query set rooted in a big table declines the
    # hint — the behavior a real 100 TB query table would see. (Deriving
    # 500k rows from the small documents table keeps the ESTIMATE at the
    # documents scan's few MB and legitimately broadcasts.)
    li = load(spark, sf_dir, "lineitem")
    q_all = (
        li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("qid"),
            F.concat(
                F.lit("zzpadpadpadpad"), F.col("l_orderkey"),
                F.lit(" zqpadpadpadpad"), F.col("l_linenumber"),
            ).alias("qtext"),
        )
        .unionByName(queries(d_full))
    )
    # static-decision audit: maybe_broadcast returns the SAME object when
    # it declines the hint (the runtime plan may still broadcast via AQE's
    # actual-size re-plan — that's adaptive behavior, not a forced hint)
    from carrot_transform_spark.queries import maybe_broadcast

    qterms_big = (
        q_all.select(
            F.col("qid"), F.explode(F.split(F.col("qtext"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("qid", "term")
        .count()
    )
    # the tuned session threshold is 64 MB (the ~48 MB qterms estimate is
    # a legitimate broadcast there); pin the leg to the 10 MB default so
    # the decline path actually executes — what a cluster-sized query set
    # would see at any threshold
    thresh_key = "spark.sql.autoBroadcastJoinThreshold"
    saved = spark.conf.get(thresh_key)
    spark.conf.set(thresh_key, str(10 << 20))
    try:
        declined = maybe_broadcast(qterms_big) is qterms_big
        print(
            f"maybe_broadcast declined forced hint for bulk qterms: {declined}",
            flush=True,
        )
        ranked = bm25_rank(d_full, q_all, top_k=3)
        t0 = time.time()
        n = ranked.count()
        dt = time.time() - t0
        plan = ranked._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(thresh_key, saved)
    # count join strategies for the audit line (AQE may still broadcast
    # sub-threshold sides at runtime; the point is no FORCED broadcast)
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    print(
        f"bulk-queries: queries={q_all.count()} rows={n} in {dt:.1f}s "
        f"(plan: {n_bhj} broadcast / {n_smj} shuffle joins)",
        flush=True,
    )

    # qtf (k3) leg: the Okapi query-term-frequency component
    t0 = time.time()
    n = bm25_rank(d_full, q, top_k=10, k3=8.0).count()
    print(f"k3=8.0: rows={n} in {time.time() - t0:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
