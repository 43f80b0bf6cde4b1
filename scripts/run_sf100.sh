#!/bin/bash
# sf100 targeted scale proof (VERDICT r9 task 2): headline-scaler bench,
# replica-restriction invariant, bounded-output oracle subset.
# Data: /root/repo/data/sf100 (gen_sf_big factor 1000 -> 600M lineitem, 16 GB).
set -u
cd /root/repo
OUT=/root/repo/data/sf100_runs
mkdir -p "$OUT"

echo "=== bench A: headline scalers, repeats=3 ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
SPARK_GRAFT_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_ONLY=q1_pricing_summary,q3_shipping_priority,q9_product_profit,q18_large_volume_customer,win_running_order_total,ev_sessionize,dd_minhash_lsh_pairs,txt_word_freq \
python bench.py >"$OUT/bench_a.json" 2>"$OUT/bench_a.log"
echo "bench A exit $?"

echo "=== bench B: omop ETL (200M output rows), repeats=1 ==="
SPARK_GRAFT_SF_DIR=/root/repo/data/sf100 \
SPARK_GRAFT_DRIVER_MEM=48g \
SPARK_GRAFT_BENCH_REPEATS=1 \
SPARK_GRAFT_BENCH_ONLY=omop_observation_events \
python bench.py >"$OUT/bench_b.json" 2>"$OUT/bench_b.log"
echo "bench B exit $?"

echo "=== replica-restriction invariant sf0.1 vs sf100 ==="
SWEEP_DRIVER_MEM=48g \
python scripts/replica_invariant.py /root/testdata/sf0.1 /root/repo/data/sf100 \
  >"$OUT/invariant.log" 2>&1
echo "invariant exit $?"

echo "=== bounded-output oracle subset at sf100 ==="
SWEEP_CPUS=32 SWEEP_DRIVER_MEM=48g \
SWEEP_ONLY=q1_pricing_summary,q4_order_priority,q5_local_supplier_volume,q6_forecast_revenue,q7_nation_volume,q8_market_share,q9_product_profit,q12_shipmode_classes,q13_customer_distribution,q14_promo_revenue_share,q17_small_quantity_revenue,q19_discounted_revenue,q22_global_sales_opportunity,ev_hourly_rollup,sketch_approx_distinct \
python scripts/verify_sweep.py /root/repo/data/sf100 >"$OUT/oracle.log" 2>&1
echo "oracle exit $?"

echo "ALL DONE"
