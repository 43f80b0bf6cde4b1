#!/usr/bin/env python
"""Replica-restriction invariant: the sf10-scale correctness gate for the
dedup family, whose DuckDB oracle twins (single-query MinHash/shingle SQL
rebuilds) are infeasible above sf1.

scripts/gen_sf_big.py constructs the scaled corpus so that document token
spaces are DISJOINT across replicas (token t -> t~r for replica r>0) and
replica 0 is byte-identical to the source corpus. Consequences, by
construction, not by approximation:

 - exact duplicates can only exist within a replica (texts are
   replica-unique), so the exact-dedup group rows restricted to replica-0
   canonicals must EQUAL the source-corpus groups row-for-row;
 - MinHash/Jaccard pairs across replicas are impossible (no shared
   shingles -> jaccard 0; LSH band collisions can still propose cross
   candidates, but exact verification rejects them), so the pair set
   restricted to replica-0 ids must EQUAL the source-corpus pairs,
   jaccard values included;
 - SimHash pairs: the Hamming verify is an exact filter, so extra
   replicas add candidate rows but never change which within-replica-0
   pairs survive — same restriction equality (cross-replica pairs, if a
   64-bit near-collision ever produced one, would have an id outside
   replica 0 and be excluded by the restriction).

So `pairs(sf10) ∩ replica0 == pairs(sf0.1)` is an EXACT invariant that
exercises the full operator at 100x scale with the small-scale oracle-
verified result as ground truth — no DuckDB needed at the big scale.

Usage: python scripts/replica_invariant.py [small_dir] [big_dir]
  defaults: /root/testdata/sf0.1 /root/repo/data/sf10
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

OFF = 10_000_000  # gen_sf_big's replica key shift


def _rows(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf10"
    from carrot_transform_spark.session import derive_shuffle_partitions

    spark = (
        SparkSession.builder.master("local[32]")
        .config(
            "spark.sql.shuffle.partitions",
            str(derive_shuffle_partitions(big, floor=32)),
        )
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "16g"))
        .appName("replica-invariant")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from carrot_transform_spark.queries import all_queries

    qs = all_queries()
    checks = [
        (
            "dd_exact_groups",
            lambda df: df.filter(F.col("canonical_doc_id") < OFF),
        ),
        (
            "dd_minhash_lsh_pairs",
            lambda df: df.filter((F.col("doc_a") < OFF) & (F.col("doc_b") < OFF)),
        ),
        (
            "dd_simhash_hamming_pairs",
            lambda df: df.filter((F.col("doc_a") < OFF) & (F.col("doc_b") < OFF)),
        ),
    ]
    # suite-internal entries with the same exact invariant: cross-replica
    # token spaces are disjoint, so cross-DOC duplicate runs and >=0.8-
    # jaccard pairs are all within-replica — restriction equality is exact
    from carrot_transform_spark.queries.dedup import dd_ngram_jaccard_pairs
    from carrot_transform_spark.queries.pipeline_ops import txt_exact_scrub

    class _QD:
        def __init__(self, fn):
            self.spark_fn = fn

    qs = dict(qs)
    qs["dd_ngram_jaccard_pairs"] = _QD(dd_ngram_jaccard_pairs)
    qs["txt_exact_scrub"] = _QD(txt_exact_scrub)
    checks += [
        (
            "dd_ngram_jaccard_pairs",
            lambda df: df.filter((F.col("doc_a") < OFF) & (F.col("doc_b") < OFF)),
        ),
        (
            "txt_exact_scrub",
            lambda df: df.filter(F.col("doc") < OFF),
        ),
    ]
    # Per-user event computations: replicas shift user_id/o_custkey/event_id
    # by the same OFF, so sessions, per-user stats, as-of matches, and band
    # rollups for replica-0 users are computed from byte-identical rows —
    # restriction equality is exact. This gives the multi-million-row event
    # entries (oracle-swept only to sf1; their sf10 collects are too big)
    # an exact sf10 gate at sf0.1-sized collect cost.
    checks += [
        (name, lambda df: df.filter(F.col("user_id") < OFF))
        for name in (
            "ev_sessionize",
            "ev_user_stats",
            "ev_asof_last_order",
            "ev_range_join",
        )
    ]
    failed = []
    for name, restrict in checks:
        fn = qs[name].spark_fn
        t0 = time.time()
        want = _rows(fn(spark, small))
        got = _rows(restrict(fn(spark, big)))
        ok = got == want
        print(
            f"  {name}: {'ok' if ok else 'FAIL'} small={len(want)} "
            f"big∩r0={len(got)} [{time.time() - t0:.1f}s]",
            flush=True,
        )
        if not ok:
            extra = set(got) - set(want)
            missing = set(want) - set(got)
            print(f"    extra={list(extra)[:3]} missing={list(missing)[:3]}")
            failed.append(name)
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
