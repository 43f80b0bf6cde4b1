"""Streaming sustained-rate bench (VERDICT r9 task 7).

Drives each streaming maintainer — MinHash near-dup index, SimHash index,
exact-dup fingerprint store, per-key HLL distinct sketches, CMS frequency
sketch — for N micro-batches at a fixed batch size through the REAL
Structured Streaming path (parquet file source, maxFilesPerTrigger=1,
availableNow) and reports per-batch durations from the query's own
progress events, steady-state docs/s, a flatness ratio (median of the last
5 batches over the median of batches 3-7 — >1 means steps are getting
slower as state grows), and the on-disk state-size curve recovered from
the per-unit store layout.

Usage: python scripts/streaming_rate_bench.py [n_batches] [docs_per_batch] [compact_every]
compact_every > 0 turns on in-stream store compaction for the three
unit-store families (the flatness lever — without it, unit accumulation
grows multi-unit read planning ~linearly in batch count).
Prints ONE JSON line; a human-readable table goes to stderr.
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.session import get_spark  # noqa: E402
from scripts.incremental_stress import synth_corpus  # noqa: E402


def _du(path: str) -> int:
    p = Path(path)
    if not p.exists():
        return 0
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def _feed_docs(spark, feed: str, n_batches: int, per: int) -> None:
    corpus = synth_corpus(spark, n_batches * per).persist()
    corpus.count()
    for b in range(n_batches):
        (
            corpus.filter((F.col("doc_id") >= b * per) & (F.col("doc_id") < (b + 1) * per))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{feed}/b{b:03d}")
        )
    corpus.unpersist()


def _feed_kv(spark, feed: str, n_batches: int, per: int) -> None:
    for b in range(n_batches):
        (
            spark.range(b * per, (b + 1) * per)
            .select(
                (F.col("id") % 40).cast("string").alias("k"),
                # ~25% repeated values so distincts grow sublinearly
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10) % (per * 3)).alias("u"),
                F.col("id").cast("string").alias("tok"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{feed}/b{b:03d}")
        )


def _run(q, label: str) -> list[dict]:
    q.awaitTermination()
    prog = [
        {"rows": p["numInputRows"], "ms": p["batchDuration"]}
        for p in (json.loads(x.json) if hasattr(x, "json") else x for x in q.recentProgress)
        if p.get("numInputRows", 0) > 0
    ]
    return prog


def bench_family(name: str, start_fn, feed_schema: str, feed: str, store_dirs: list[str], spark) -> dict:
    stream = (
        spark.readStream.format("parquet")
        .schema(feed_schema)
        .option("maxFilesPerTrigger", 1)
        .load(f"{feed}/b*")
    )
    t0 = time.time()
    q = start_fn(stream)
    prog = _run(q, name)
    wall = time.time() - t0
    secs = [p["ms"] / 1000.0 for p in prog]
    rows = [p["rows"] for p in prog]
    n = len(secs)
    steady = statistics.median(secs[-10:]) if n >= 10 else statistics.median(secs)
    steady_rows = statistics.median(rows[-10:]) if n >= 10 else statistics.median(rows)
    early = statistics.median(secs[2:7]) if n >= 7 else steady
    out = {
        "batches": n,
        "steady_docs_s": round(steady_rows / steady, 1) if steady else None,
        "median_batch_s": round(steady, 3),
        "flatness_last5_over_early5": round(statistics.median(secs[-5:]) / early, 2) if early else None,
        "state_bytes": sum(_du(d) for d in store_dirs),
        "wall_s": round(wall, 1),
        "batch_secs": [round(s, 2) for s in secs],
    }
    print(
        f"# {name}: {n} batches, steady {out['steady_docs_s']} docs/s, "
        f"median {out['median_batch_s']}s, flatness {out['flatness_last5_over_early5']}, "
        f"state {out['state_bytes'] / 1e6:.1f} MB",
        file=sys.stderr,
        flush=True,
    )
    return out


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    per_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    ce = compact_every or None
    per_kv = per_docs * 12

    from carrot_transform_spark.streaming.dedup_index import (
        maintain_neardup_index,
        maintain_simhash_index,
    )
    from carrot_transform_spark.streaming.fingerprint_index import (
        maintain_fingerprint_store,
    )
    from carrot_transform_spark.streaming.hll import apply_hll_stream
    from carrot_transform_spark.streaming.sketches import apply_cms_stream

    spark = get_spark(
        app_name="stream-rate-bench",
        # recentProgress defaults to the last 100 updates — keep every batch
        # visible so the flatness baseline (batches 3..7) is never evicted
        extra_conf={
            "spark.sql.streaming.numRecentProgressUpdates": str(n_batches + 10)
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="srate_")

    doc_feed = f"{tmp}/docs"
    _feed_docs(spark, doc_feed, n_batches, per_docs)
    kv_feed = f"{tmp}/kv"
    _feed_kv(spark, kv_feed, n_batches, per_kv)
    doc_schema = "doc_id long, text string"

    results: dict[str, dict] = {}

    results["minhash_neardup"] = bench_family(
        "minhash_neardup",
        lambda s: maintain_neardup_index(
            s, f"{tmp}/mh_store", f"{tmp}/mh_pairs", f"{tmp}/mh_ck", threshold=0.5,
            compact_every=ce,
        ),
        doc_schema,
        doc_feed,
        [f"{tmp}/mh_store", f"{tmp}/mh_pairs"],
        spark,
    )
    results["simhash_index"] = bench_family(
        "simhash_index",
        lambda s: maintain_simhash_index(
            s, f"{tmp}/sh_store", f"{tmp}/sh_pairs", f"{tmp}/sh_ck", compact_every=ce
        ),
        doc_schema,
        doc_feed,
        [f"{tmp}/sh_store", f"{tmp}/sh_pairs"],
        spark,
    )
    results["fingerprint_store"] = bench_family(
        "fingerprint_store",
        lambda s: maintain_fingerprint_store(
            s, f"{tmp}/fp_store", f"{tmp}/fp_dec", f"{tmp}/fp_ck", compact_every=ce
        ),
        doc_schema,
        doc_feed,
        [f"{tmp}/fp_store"],
        spark,
    )
    results["hll_distinct"] = bench_family(
        "hll_distinct",
        lambda s: apply_hll_stream(s, "u", f"{tmp}/hll", f"{tmp}/hll_ck", key_col="k"),
        "k string, u long, tok string",
        kv_feed,
        [f"{tmp}/hll"],
        spark,
    )
    results["cms_heavy_hitters"] = bench_family(
        "cms_heavy_hitters",
        lambda s: apply_cms_stream(s, "tok", f"{tmp}/cms", f"{tmp}/cms_ck"),
        "k string, u long, tok string",
        kv_feed,
        [f"{tmp}/cms"],
        spark,
    )

    print(
        json.dumps(
            {
                "metric": "streaming_sustained_rate",
                "compact_every": compact_every,
                "n_batches": n_batches,
                "docs_per_batch": per_docs,
                "kv_per_batch": per_kv,
                "families": results,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
