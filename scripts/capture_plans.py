"""Capture .explain('formatted') for bench queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
e.g.   python scripts/capture_plans.py r15 before
Writes plans/<tag>/<query>_<suffix>.txt. Driver-side only (no jobs run
except those a query builder itself triggers, e.g. eager caches).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from carrot_transform_spark.session import derive_shuffle_partitions, get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    from bench import BENCH_QUERIES
    from carrot_transform_spark.queries import all_queries

    if not names:
        names = BENCH_QUERIES
    registry = all_queries()
    spark = get_spark(
        app_name="capture-plans",
        master="local[8]",
        shuffle_partitions=derive_shuffle_partitions(sf_dir, floor=32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].spark_fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        n_exch = plan.count("Exchange")
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
            if j in plan
        ]
        print(f"{name}: exchanges={n_exch} joins={joins} -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
