"""Cross-dialect differential fuzz marathon (VERDICT r12 task 5): N seeds
of the v1<->v2 intersection generator through the 4-way check
(tests/test_xdialect_fuzz.run_xdialect_seed).

Usage: python scripts/fuzz_xdialect.py [n_seeds] [start]
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
    from tests.test_xdialect_fuzz import run_xdialect_seed

    spark = get_spark(app_name="xdialect-fuzz", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    logging.disable(logging.WARNING)  # the reference logs per bad date

    failures: list[int] = []
    t0 = time.time()
    for seed in range(start, start + n):
        d = Path(tempfile.mkdtemp(prefix=f"xd{seed}_"))
        try:
            run_xdialect_seed(spark, d, seed)
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
