"""Profile the wide-plan compile (VERDICT r12 task 5): where do the extra
~48 s go when tests/test_wide_plan_budget.py runs in-suite (59 s) vs idle
(11 s)?

Sweeps the compile thread count and optionally pre-loads the JVM with
suite-like analysis garbage, printing per-phase wall times.

Usage: python scripts/profile_wide_plan.py [--dirty] [threads ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402


def _rules_v1(n_blocks: int, n_fields: int = 20, n_values: int = 4) -> dict:
    """The SAME 50-block x 20-field x 4-value shape as the v2 budget
    corpus, written through the legacy V1 dialect (one rule per
    (file, field, value) block; the loader's shape-aware fold merges each
    file's per-value blocks back into one multi-value ConceptMapping, so
    the compiler sees the identical wide shape with dialect='v1')."""
    cdm_obs = {}
    for b in range(n_blocks):
        fname = f"src_{b:02d}.csv"
        for j in range(n_fields):
            for v in range(n_values):
                cdm_obs[f"r{b}_{j}_{v}"] = {
                    "person_id": {"source_table": fname, "source_field": "user"},
                    "observation_datetime": {
                        "source_table": fname,
                        "source_field": "when",
                    },
                    "observation_source_value": {
                        "source_table": fname,
                        "source_field": f"f{j}",
                    },
                    "observation_concept_id": {
                        "source_table": fname,
                        "source_field": f"f{j}",
                        "term_mapping": {f"v{v}": 100000 + b * 100 + j * 10 + v},
                    },
                }
    return {"metadata": {"dataset": "wideplanv1"}, "cdm": {"observation": cdm_obs}}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    dirty = "--dirty" in args
    use_v1 = "--v1" in args
    threads = [int(a) for a in args if a.isdigit()] or [16, 8, 4, 1]

    from carrot_transform_spark.session import get_spark
    from tests.test_wide_plan_budget import _MemSource, _rules
    from carrot_transform_spark.atpath import DEFAULT_CONFIG, DEFAULT_DDL
    from carrot_transform_spark.omop.ddl import load_schemas
    from carrot_transform_spark.plans.compiler import CarrotPlanner
    from carrot_transform_spark.rules.loader import parse_rules

    spark = get_spark(app_name="wideplan-prof", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    if dirty:
        # suite-like JVM state: hundreds of analyzed plans, some cached
        # relations, catalog entries, GC pressure
        t0 = time.perf_counter()
        for i in range(60):
            df = (
                spark.range(50_000)
                .select(
                    "id",
                    (F.col("id") % 97).alias("k"),
                    F.concat(F.lit("x"), F.col("id")).alias("s"),
                )
                .groupBy("k")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("s"))
            )
            df.createOrReplaceTempView(f"dirty_{i}")
            if i % 7 == 0:
                df.persist().count()
        print(f"dirty warmup {time.perf_counter() - t0:.1f}s", flush=True)

    omop = load_schemas(DEFAULT_DDL, DEFAULT_CONFIG)
    rules = parse_rules(_rules_v1(50) if use_v1 else _rules(), omop)
    print(f"dialect={rules.dialect}", flush=True)
    src = _MemSource(spark)
    src.read("warm")

    import carrot_transform_spark.plans.compiler as comp

    for n in threads:
        orig = comp.CarrotPlanner  # noqa: F841
        # monkey-patch the pool width via env-style knob: easiest is to
        # temporarily shrink via ThreadPoolExecutor patching
        import concurrent.futures as cf

        real_tpe = cf.ThreadPoolExecutor

        class TPE(real_tpe):  # noqa: D401
            def __init__(self, max_workers=None, *a, **k):
                super().__init__(min(n, max_workers or n), *a, **k)

        cf.ThreadPoolExecutor = TPE
        comp_tpe = getattr(comp, "ThreadPoolExecutor", None)
        try:
            planner = CarrotPlanner(spark, rules, omop, person_table="src_00.csv")
            t0 = time.perf_counter()
            cand = planner.target_candidates(src, "observation", None)
            build_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            cand.schema
            analyze_s = time.perf_counter() - t1
            print(
                f"threads={n}: build {build_s:.1f}s analyze {analyze_s:.1f}s",
                flush=True,
            )
            planner.release()
        finally:
            cf.ThreadPoolExecutor = real_tpe
            if comp_tpe is not None:
                comp.ThreadPoolExecutor = comp_tpe


if __name__ == "__main__":
    main()
