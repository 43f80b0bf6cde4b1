"""The deferred metric flush must run exactly ONE action per source file
(all (file, target) counters combined into a single aggregation) plus one
action for all person-reject counts — not one per (file, target) pair.

Pinned by counting DataFrame.collect() calls inside flush_metrics() on the
reference demo corpus, whose rules map several targets out of the same
source files. (Raw Spark job counts are NOT a stable probe: AQE
materializes each shuffle stage as its own job, so one action legitimately
spawns several jobs — the per-pair fan-out we're guarding against is the
number of driver-side actions.)
"""

from __future__ import annotations

from pathlib import Path

import pyspark.sql.classic.dataframe as dataframe_mod

from carrot_transform_spark.omop.ddl import load_schemas
from carrot_transform_spark.pipeline import DEFAULT_CONFIG, DEFAULT_DDL
from carrot_transform_spark.plans.compiler import CarrotPlanner, RejectStats
from carrot_transform_spark.rules.loader import load_rules
from carrot_transform_spark.sources.registry import make_source

EXAMPLES = Path("/root/reference/carrottransform/examples/test")


def test_metric_flush_is_one_action_per_file(spark, monkeypatch):
    omop = load_schemas(DEFAULT_DDL, DEFAULT_CONFIG)
    rules = load_rules(EXAMPLES / "rules" / "rules_14June2021.json", omop)
    source = make_source(spark, str(EXAMPLES / "inputs"))
    planner = CarrotPlanner(spark, rules, omop, person_table="Demographics")
    stats = RejectStats()

    person_map = planner.person_map(source).cache()
    targets = [t for t in rules.targets() if omop.has_table(t)]
    n_pairs = 0
    for target in targets:
        df = planner.target_records(source, target, person_map, stats)
        df.count()  # materialize the data path; metric jobs stay deferred
        n_pairs += 1

    n_files = len({k[0] for k in planner._pending_aggs})
    assert planner._pending_rejects, "reject counts should be deferred too"
    # the demo rules fan several targets out of the same files — the fold
    # has to actually merge something for this test to mean anything
    total_entries = sum(len(v) for v in planner._pending_aggs.values())
    assert total_entries > n_files

    calls: list[int] = []
    orig = dataframe_mod.DataFrame.collect

    def counting_collect(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(dataframe_mod.DataFrame, "collect", counting_collect)
    planner.flush_metrics()
    monkeypatch.undo()

    # one combined agg action per source file + one union action for ALL
    # (file, target) person-reject counts
    assert len(calls) == n_files + 1, (
        f"{len(calls)} actions for {n_files} files (+1 reject union); "
        f"{n_pairs} (file,target) pairs was the old per-pair count"
    )

    # the deferral must not change what lands in the stats (the demo
    # corpus has zero person rejects, so invalid_person staying empty IS
    # the correct outcome of the reject-union action)
    assert stats.input_rows and stats.invalid_source
    assert not planner._pending_aggs and not planner._pending_rejects
    planner.release()
    person_map.unpersist()
