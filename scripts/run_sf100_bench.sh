#!/bin/bash
# sf100 bench legs (run on an idle box, AFTER all correctness work).
set -u
cd /root/repo
OUT=/root/repo/data/sf100_runs
mkdir -p "$OUT"
echo "=== bench A: headline scalers, repeats=3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
SPARK_GRAFT_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_ONLY=q1_pricing_summary,q3_shipping_priority,q9_product_profit,q18_large_volume_customer,win_running_order_total,ev_sessionize,dd_minhash_lsh_pairs,txt_word_freq \
python bench.py >"$OUT/bench_a_idle.json" 2>"$OUT/bench_a_idle.log"
echo "bench A exit $?"
echo "=== bench B: omop ETL (200M output rows), repeats=1 ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
SPARK_GRAFT_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_REPEATS=1 \
SPARK_GRAFT_BENCH_ONLY=omop_observation_events \
python bench.py >"$OUT/bench_b_idle.json" 2>"$OUT/bench_b_idle.log"
echo "bench B exit $?"
echo "BENCH LEGS DONE"
