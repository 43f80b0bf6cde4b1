#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Reference-window value of the calib_spark probe on an idle host
# (BASELINE.md "Host calibration", round 14): used for normalized_total.
CALIB_SPARK_REF = 0.62

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "ev_hourly_rollup",
    "ev_sessionize",
    "txt_word_freq",
    "dd_minhash_lsh_pairs",
    "sim_topk_bruteforce",
    "omop_observation_events",
    "win_running_order_total",
    "q16_supplier_part_variety",
]


def main() -> None:
    try:
        load_at_start = os.getloadavg()  # before our own JVM contributes
    except OSError:
        load_at_start = (-1.0, -1.0, -1.0)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from carrot_transform_spark.queries import all_queries
    from carrot_transform_spark.session import derive_shuffle_partitions, get_spark

    registry = all_queries()
    spark = get_spark(
        app_name="carrot-bench",
        master=f"local[{cpus}]",
        # scale-aware: 32 at sf<=1, 64 at sf10, 512 at sf100 — no hand tuning
        # (floor=None -> derive uses the machine CPU count for the wildcard)
        shuffle_partitions=derive_shuffle_partitions(
            sf_dir, floor=None if cpus == "*" else int(cpus)
        ),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with a trivial action (not timed)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # Host-drift calibration (VERDICT r13 task 2): identical trees have
    # produced 9.2-15.2 s bench totals across host windows with
    # contended=false — load average misses page-cache and host-speed
    # drift. Two FIXED-WORK probes, independent of the SF data, let
    # cross-round medians be normalized: a CPU+shuffle Spark job
    # (executor-side throughput) and a parse+analyze loop (the driver/
    # py4j/analyzer pipeline, which drifted 3x on the wide-plan compile
    # with zero code change). Median of 3 each; ~2 s total.
    import pyspark.sql.functions as F  # noqa: N812

    def _calib_spark() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 8_000_000, 1, 16)
            .select((F.xxhash64("id") % 997).alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.sum(F.col("k") * F.col("n")))
            .collect()
        )
        return time.perf_counter() - t0

    def _calib_compile() -> float:
        branches = " ".join(
            f"WHEN id % 211 = {i} THEN {i * 7}" for i in range(200)
        )
        t0 = time.perf_counter()
        for rep in range(6):
            df = spark.range(1).select(
                F.expr(f"CASE {branches} ELSE {rep} END").alias("c")
            )
            df.schema  # parse + analyze only; never executed
        return time.perf_counter() - t0

    _calib_spark(), _calib_compile()  # warm both probe paths (not timed)
    calib_spark = round(sorted(_calib_spark() for _ in range(3))[1], 3)
    calib_compile = round(sorted(_calib_compile() for _ in range(3))[1], 3)
    spark.catalog.clearCache()

    # Each query runs REPEATS times (full df.count() materialization each run,
    # cold cache each run) and we report the per-query MEDIAN.  Medians de-noise
    # host contention: a single contended run can otherwise double a query's
    # recorded time while the code is unchanged (observed spread 18s..50s for
    # identical trees).  All raw runs are kept in the JSON tail ("runs") so the
    # medians stay auditable.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    # optional subset (comma-separated names) for targeted scale runs where
    # the full battery would be wall-clock prohibitive (e.g. sf100)
    only = {s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s}
    unknown = only - set(BENCH_QUERIES)
    if unknown:
        # a typo'd subset must not read as a successful (empty) scale run
        sys.exit(f"SPARK_GRAFT_BENCH_ONLY names not in BENCH_QUERIES: {sorted(unknown)}")
    bench_queries = [q for q in BENCH_QUERIES if not only or q in only]
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    t_all = time.perf_counter()
    for name in bench_queries:
        qd = registry[name]
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = qd.spark_fn(spark, sf_dir)
            n = df.count()  # full materialization of the result
            runs.append(round(time.perf_counter() - t0, 3))
            # isolate runs: drop caches a query persisted for its own reuse so
            # every repeat pays the same cold-cache cost as a standalone run
            spark.catalog.clearCache()
        runs_sorted = sorted(runs)
        timings[name] = runs_sorted[len(runs_sorted) // 2]
        all_runs[name] = runs
        print(
            f"# {name}: median={timings[name]:.3f}s runs={runs} rows={n}",
            file=sys.stderr,
        )
    wall = round(time.perf_counter() - t_all, 3)
    total = round(sum(timings.values()), 3)

    # Contention flag (VERDICT r12 task 6): medians-of-3 tolerate one bad
    # run, not sustained load. load1 > own-worker count at START means
    # something else was burning CPU before we contributed; the 15-min
    # tail catches a recently-finished pytest/sweep whose page-cache and
    # scheduler wake still skew timings (BASELINE.md documents 2.5x
    # run-to-run spread under load). Machine-flagged here so a poisoned
    # number is visible in the JSON instead of judge-diagnosed.
    try:
        la1_end, _, la15_end = os.getloadavg()
    except OSError:
        la1_end = la15_end = -1.0
    ncpu = os.cpu_count() or 1
    contended = bool(
        load_at_start[0] > ncpu * 0.25 or la15_end > ncpu * 0.5
    )

    print(
        json.dumps(
            {
                "metric": "bench_total_median_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "repeats": repeats,
                "runs": all_runs,
                "wall_sec": wall,
                "load1_start": round(load_at_start[0], 2),
                "load15_start": round(load_at_start[2], 2),
                "load1_end": round(la1_end, 2),
                "load15_end": round(la15_end, 2),
                "contended": contended,
                # fixed-work host-speed probes (see BASELINE.md "Host
                # calibration"): divide a round's total by the probe ratio
                # vs the reference window before comparing across rounds
                "calib_spark_sec": calib_spark,
                "calib_compile_sec": calib_compile,
                # host-normalized total (VERDICT r14 task 6): the round-
                # over-round comparison should use THIS, not raw total —
                # r13->r14 drifted +2.5 s with zero bench-path code change.
                # Scale = reference-window probe / this window's probe
                # (BASELINE.md "Host calibration": calib_spark_ref=0.62 s).
                "calib_spark_ref_sec": CALIB_SPARK_REF,
                "normalized_total": (
                    round(total * (CALIB_SPARK_REF / calib_spark), 3)
                    if calib_spark > 0
                    else total
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
