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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from carrot_transform_spark.queries import all_queries
    from carrot_transform_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="carrot-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers with a trivial action (not timed)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in BENCH_QUERIES:
        qd = registry[name]
        t0 = time.perf_counter()
        df = qd.spark_fn(spark, sf_dir)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
        # isolate queries: drop caches a query persisted for its own reuse
        spark.catalog.clearCache()
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "bench_total_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
