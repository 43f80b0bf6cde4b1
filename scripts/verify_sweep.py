"""Full /verify sweep: driver-contract smoke + sf0.01 oracle parity for every
registered query, replicating what the round driver does (plain default
SparkSession incl. ANSI mode, DuckDB value-hash compare).

Usage: python scripts/verify_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from tests.oracle_compare import compare_query, duck_connect  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # bigger scale factors need more than the 1g default driver heap (the
    # compare collects full result sets for hashing) — tune via env
    import os

    cpus = os.environ.get("SWEEP_CPUS", "8")
    from carrot_transform_spark.session import derive_shuffle_partitions

    shuffle = os.environ.get("SWEEP_SHUFFLE") or str(
        derive_shuffle_partitions(sf_dir, floor=int(cpus))
    )
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "2g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows", flush=True)
    assert len(rows) > 0, "entry() returned 0 rows"

    qs, osql = mod.queries(), mod.oracle_sql()
    missing = set(osql) - set(qs)
    assert not missing, f"oracle keys not in queries(): {missing}"
    print(f"{len(qs)} queries, {len(osql)} with oracles", flush=True)

    # Subset controls for big scale factors where some DuckDB oracle twins
    # are infeasible (the dedup/pipe suites rebuild MinHash/shingle indexes
    # in single-query SQL) or the compare's full-result collect is too large
    # (multi-million-row outputs): SWEEP_ONLY / SWEEP_SKIP are
    # comma-separated entry names.
    only = {s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s}
    skip = {s for s in os.environ.get("SWEEP_SKIP", "").split(",") if s}

    con = duck_connect(sf_dir)
    failed = []
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            print(f"  {name}: skipped by SWEEP_ONLY/SWEEP_SKIP", flush=True)
            continue
        if name not in osql:
            n = fn(spark, sf_dir).count()
            print(f"  {name}: rows-only, {n} rows", flush=True)
            continue
        t0 = time.time()
        r = compare_query(spark, con, name, fn, osql[name], sf_dir)
        status = "ok" if r.ok else f"FAIL ({r.detail})"
        print(
            f"  {name}: {status} spark={r.spark_rows} oracle={r.oracle_rows}"
            f" [{time.time() - t0:.1f}s]",
            flush=True,
        )
        if not r.ok:
            failed.append(name)

    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
