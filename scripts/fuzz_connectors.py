"""Connector fuzz marathon (VERDICT r9 task 4): >=50 seeds through the
CSV-source, TSV-sink, and Derby-JDBC differential legs of
tests/test_connector_fuzz.py.

Usage: python scripts/fuzz_connectors.py [n_seeds] [start]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from carrot_transform_spark.session import get_spark
    from tests.test_connector_fuzz import (
        _pgwire_up,
        run_csv_source_seed,
        run_jdbc_seed,
        run_jsonl_seed,
        run_pgwire_seed,
        run_tsv_sink_seed,
    )

    spark = get_spark(app_name="conn-fuzz", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    legs = [
        ("csv", run_csv_source_seed),
        ("tsv", run_tsv_sink_seed),
        ("jdbc", run_jdbc_seed),
        ("jsonl", run_jsonl_seed),
    ]
    if _pgwire_up():
        legs.append(("pgwire", run_pgwire_seed))
    else:
        print("pgwire leg SKIPPED (no live Postgres)", flush=True)
    failures: list[str] = []
    t0 = time.time()
    for seed in range(start, start + n):
        for leg, fn in legs:
            d = Path(tempfile.mkdtemp(prefix=f"cf{leg}{seed}_"))
            try:
                fn(spark, d, seed)
            except AssertionError as e:
                failures.append(f"{leg}:{seed}")
                print(f"{leg} seed {seed}: FAIL\n{str(e)[:1500]}", flush=True)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        print(f"seed {seed}: ok x{len(legs)} [{time.time() - t0:.0f}s]", flush=True)
    total = n * len(legs)
    print(f"{total - len(failures)}/{total} leg-seeds green in {time.time() - t0:.0f}s")
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
