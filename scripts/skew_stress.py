#!/usr/bin/env python
"""Skew-join stress at sf10 scale (VERDICT r11 task 6): one 20%-hot key.

Usage: python scripts/skew_stress.py [n_orders] [n_customers] [hot_frac] [n_salts]

Builds an orders-like fact (default 15M rows, the sf10 orders count) where
ONE customer key owns `hot_frac` of all rows (the null-ish user / default
category shape), plus a 1.5M-row customer dim, then drives
operators/skewjoin.salted_join — the engine shape behind the
join_salted_orders registry entry.

Self-validating, two assertions:

1. RESULT INVARIANCE — the salted join must agree with the plain join
   exactly: row count, joined-value checksum (xxhash64 xor-fold over the
   joined columns). Salting must never change join semantics.

2. TASK-WORK BALANCE — per-shuffle-task join-input volume, with
   (key, salt) groups mapped to tasks by Spark's own
   pmod(murmur3(keys), numPartitions) rule (F.hash = Murmur3). The
   salted layout must keep max-over-median < 2x; the plain layout's
   ratio is printed alongside as the counterfactual (the hot key alone
   makes it >> 10x at 20% skew).

Prints one JSON line; exit 1 on any failed invariant.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.skewjoin import salted_join  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
    n_cust = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
    n_salts = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    hot_key = 7  # arbitrary customer

    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # the whole point is the SHUFFLE layout: disable broadcast so the dim
    # actually shuffles (at real scale the dim side is too big to ship),
    # and disable AQE skew handling so the operator's salting is what's
    # being measured, not the runtime's
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

    hot_n = int(n_orders * hot_frac)
    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.when(F.col("id") < hot_n, F.lit(hot_key))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_cust)))
        .cast("long")
        .alias("o_custkey"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000)) / 100.0).alias(
            "o_totalprice"
        ),
    )
    customer = spark.range(n_cust).select(
        F.col("id").alias("o_custkey"),
        F.concat(F.lit("seg"), F.pmod(F.col("id"), F.lit(5))).alias("c_segment"),
    )

    def join_digest(df):
        # xor-fold (order-insensitive, overflow-free under ANSI mode)
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "bit_xor(xxhash64(o_orderkey, o_custkey, c_segment, o_totalprice))"
            ).alias("chk"),
        ).first()

    t0 = time.perf_counter()
    salted = join_digest(
        salted_join(orders, customer, on="o_custkey", salt_key="o_orderkey",
                    n_salts=n_salts)
    )
    t_salted = time.perf_counter() - t0

    t0 = time.perf_counter()
    plain = join_digest(orders.join(customer, "o_custkey"))
    t_plain = time.perf_counter() - t0

    invariant_ok = (salted["n"], salted["chk"]) == (plain["n"], plain["chk"])

    # --- task-work balance: shuffle-input rows per reduce task ----------
    def task_ratio(groups, *keys):
        per_task = (
            groups.withColumn("task", F.pmod(F.hash(*keys), F.lit(n_shuffle)))
            .groupBy("task")
            .agg(F.sum("w").alias("w"))
        )
        s = per_task.agg(
            F.expr("percentile_approx(w, 0.5)").alias("med"), F.max("w").alias("mx")
        ).first()
        return float(s["mx"]) / max(float(s["med"]), 1.0)

    salt = F.pmod(F.xxhash64(F.col("o_orderkey").cast("string")), F.lit(n_salts))
    salted_groups = (
        orders.withColumn("__salt", salt.cast("int"))
        .groupBy("o_custkey", "__salt")
        .agg((F.count(F.lit(1)) + F.lit(1)).alias("w"))  # +1 replicated dim row
    )
    ratio_salted = task_ratio(salted_groups, "o_custkey", "__salt")
    plain_groups = orders.groupBy("o_custkey").agg(
        (F.count(F.lit(1)) + F.lit(1)).alias("w")
    )
    ratio_plain = task_ratio(plain_groups, "o_custkey")

    balanced = ratio_salted < 2.0
    print(
        json.dumps(
            {
                "n_orders": n_orders,
                "n_customers": n_cust,
                "hot_rows": hot_n,
                "n_salts": n_salts,
                "rows_joined": int(plain["n"]),
                "invariant_ok": bool(invariant_ok),
                "salted_sec": round(t_salted, 1),
                "plain_sec": round(t_plain, 1),
                "task_work_max_over_median_salted": round(ratio_salted, 2),
                "task_work_max_over_median_plain": round(ratio_plain, 2),
                "balanced": bool(balanced),
            }
        ),
        flush=True,
    )
    return 0 if (invariant_ok and balanced) else 1


if __name__ == "__main__":
    sys.exit(main())
