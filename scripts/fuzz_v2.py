"""v2-dialect differential fuzz marathon (VERDICT r9 task 1).

Runs N seeds of the native v2 generator (tests/test_v2_reference_parity.py
_gen_v2_case) through BOTH the reference's launch_v2 (in-process, shimmed)
and this engine, asserting record AND summary parity per seed.

Usage: python scripts/fuzz_v2.py [n_seeds] [start]
"""

from __future__ import annotations

import logging
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from carrot_transform_spark.session import get_spark
    from tests.test_v2_reference_parity import run_v2_fuzz_seed

    spark = get_spark(app_name="v2-fuzz", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    logging.disable(logging.WARNING)  # the reference logs per bad date

    failures: list[int] = []
    t0 = time.time()
    for seed in range(start, start + n):
        d = Path(tempfile.mkdtemp(prefix=f"v2fuzz{seed}_"))
        try:
            run_v2_fuzz_seed(spark, d, seed)
            print(f"seed {seed}: ok [{time.time() - t0:.0f}s]", flush=True)
        except AssertionError as e:
            failures.append(seed)
            print(f"seed {seed}: FAIL\n{str(e)[:2000]}", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"{n - len(failures)}/{n} seeds green in {time.time() - t0:.0f}s")
    if failures:
        print(f"FAILED seeds: {failures}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
