"""Scale stress for the round-6 layout/sampling/diagnostics operators.

Generates 10M synthetic rows in-executor (spark.range — no driver data)
and measures: zorder_repartition (quantize + interleave + range exchange),
weighted_sample (narrow filter), cap_per_group (keyed window), and
skew_profile over a deliberately hot-keyed frame. Prints one timing line
per operator; every action is a full count/collect materialization.

Usage: python scripts/layout_stress.py [n_rows]   (default 10_000_000)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.diagnostics import skew_profile  # noqa: E402
from carrot_transform_spark.operators.layout import zorder_repartition  # noqa: E402
from carrot_transform_spark.operators.sampling import (  # noqa: E402
    cap_per_group,
    weighted_sample,
)
from carrot_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="layout-stress", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(0, n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).alias("y"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)) + 1).cast("int").alias("w"),
        F.concat(F.lit("g"), F.pmod("id", F.lit(5_000)).cast("string")).alias("g"),
    )

    t0 = time.perf_counter()
    out = zorder_repartition(base, ["x", "y"], num_partitions=64, bits=10)
    assert out.count() == n
    t_z = time.perf_counter() - t0
    print(f"zorder_repartition: {n} rows -> 64 range partitions in {t_z:.1f}s "
          f"({n / t_z / 1e6:.1f}M rows/s)")

    t0 = time.perf_counter()
    kept = weighted_sample(base, "w", "id").filter("sampled = 1").count()
    t_w = time.perf_counter() - t0
    print(f"weighted_sample: {n} rows, kept {kept} ({kept / n:.3f}; expect ~0.505) "
          f"in {t_w:.1f}s ({n / t_w / 1e6:.1f}M rows/s)")

    t0 = time.perf_counter()
    capped = cap_per_group(base, "g", "id", cap=1_000).filter("kept = 1").count()
    t_c = time.perf_counter() - t0
    print(f"cap_per_group: {n} rows / 5000 groups capped at 1000 -> {capped} kept "
          f"in {t_c:.1f}s ({n / t_c / 1e6:.1f}M rows/s)")
    assert capped == 5_000 * 1_000

    # hot key: ~20% of all rows on one key, rest uniform over 1M keys
    skewed = base.select(
        F.when(F.pmod("id", F.lit(5)) == 0, F.lit(42))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)))
        .alias("k")
    )
    t0 = time.perf_counter()
    prof = skew_profile(skewed, "k", top_k=5).collect()
    t_s = time.perf_counter() - t0
    hot = prof[0]
    print(f"skew_profile: {n} rows, hot key {hot['key']} n={hot['n_rows']} "
          f"ppm={hot['ppm']} salts_hint={hot['salts_hint']} in {t_s:.1f}s")
    assert hot["key"] == 42 and hot["ppm"] > 190_000

    spark.stop()


if __name__ == "__main__":
    main()
