#!/bin/bash
# sf100 correctness legs only (invariant + oracle subset) — bench legs run
# separately on an idle box (BASELINE.md contention protocol).
set -u
cd /root/repo
OUT=/root/repo/data/sf100_runs
mkdir -p "$OUT"
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
echo "CORRECTNESS LEGS DONE"
