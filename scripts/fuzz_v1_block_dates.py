"""v1 NON-person per-block date fuzz marathon: N seeds of
tests/test_differential_fuzz._gen_case_block_dates (heterogeneous
per-block date columns, two-source condition start/end, date-less and
dropped blocks) through both engines.
Usage: python scripts/fuzz_v1_block_dates.py [n] [start]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    import pytest  # noqa: F401 — the test module imports fine standalone

    from carrot_transform_spark.session import get_spark
    from tests import test_differential_fuzz as tdf

    spark = get_spark(app_name="v1bd-fuzz", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    logging.disable(logging.WARNING)

    failures: list[int] = []
    t0 = time.time()
    for seed in range(start, start + n):
        d = Path(tempfile.mkdtemp(prefix=f"v1bd{seed}_"))
        try:
            tdf.test_differential_block_dates(spark, d, seed)
        except AssertionError as e:
            failures.append(seed)
            print(f"seed {seed}: FAIL\n{str(e)[:1500]}", flush=True)
        else:
            print(f"seed {seed}: ok [{time.time() - t0:.0f}s]", flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(f"{n - len(failures)}/{n} green in {time.time() - t0:.0f}s")
    if failures:
        print(f"FAILED seeds: {failures}")
        return 1
    print("ALL GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
