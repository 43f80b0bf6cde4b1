#!/usr/bin/env python
"""Steady-state index-maintenance stress: N sequential batches through the
persisted MinHash store, as a long-running ingestion would run them.

Usage: python scripts/maintenance_stress.py [n_docs] [n_batches] [compact_every]

Reports per-step wall times (the claim under test: ~flat as the store
grows), steady-state docs/s, and planted-pair recall over the union of
all step outputs (the corpus plants a near-dup of doc id-1 at every
id % 20 == 1, so expected pair counts are exact)."""

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
from scripts.incremental_stress import K, synth_corpus  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    spark = get_spark(app_name="maintenance-stress")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="maint_stress_")
    store = f"{tmp}/mh"
    per = n_docs // n_batches

    corpus = synth_corpus(spark, n_docs).persist()
    corpus.count()

    step_secs: list[float] = []
    found = 0
    for b in range(n_batches):
        lo, hi = b * per, (b + 1) * per
        batch = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        t0 = time.perf_counter()
        if b == 0:
            bands, index = dd.minhash_index_frames(batch, "doc_id", "text")
            dd.save_minhash_index(bands, index, store, unit="s0")
            pairs_n = 0  # first batch bootstraps; pairs counted from step 1 on
            # count batch-internal pairs too, for recall bookkeeping
            reg: list = []
            p0 = dd.minhash_lsh_dedup(batch, "doc_id", "text", threshold=0.5,
                                      persist_registry=reg)
            found += p0.filter(
                (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % K == 0)
            ).count()
            for df in reg:
                df.unpersist()
        else:
            pairs = dd.update_minhash_index(
                store, batch, "doc_id", "text", threshold=0.5, unit=f"s{b}"
            )
            found += pairs.filter(
                (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % K == 0)
            ).count()
            pairs_n = pairs.count()
        if compact_every:
            st = dd.minhash_index_store(spark, store)
            if len(st.units()) >= compact_every:
                st.vacuum(st.compact(st.fresh_unit("c")))
        dt = time.perf_counter() - t0
        step_secs.append(round(dt, 1))
        print(f"# step {b}: {dt:.1f}s pairs={pairs_n}", file=sys.stderr)

    expected = sum(1 for i in range(n_docs) if i % K == 1)
    steady = step_secs[1:]
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "n_batches": n_batches,
                "compact_every": compact_every,
                "batch_docs": per,
                "step_secs": step_secs,
                "steady_docs_per_sec": int(per / (sum(steady) / len(steady))),
                "last_vs_first_steady": round(steady[-1] / steady[0], 2),
                "planted_found": found,
                "planted_expected": expected,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
