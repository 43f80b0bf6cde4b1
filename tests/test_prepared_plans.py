"""Prepared logical-plan reuse for side-effect-free registry queries.

r15 optimization: queries whose builders have no caches and no eager
actions reuse their built logical plan across invocations in one session
(queries/__init__._PREPARED_PLANS) — the py4j DataFrame construction is
paid once, execution is untouched. The contract tested here:

1. a repeat invocation returns a FRESH wrapper (new QueryExecution), so
   no execution state (finalized AQE plans, materialized shuffle stages)
   can carry over between bench repeats;
2. results are identical across invocations, including after an external
   spark.catalog.clearCache();
3. prepared queries are genuinely cache-free — their physical plans
   contain no InMemoryTableScan, so with a fresh QueryExecution per call
   every execution recomputes from the parquet inputs.
"""

from __future__ import annotations

import pytest

from carrot_transform_spark.queries import REGISTRY, all_queries

PREPARED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customer",
    "ev_hourly_rollup",
    "ev_sessionize",
    "txt_word_freq",
    "sim_topk_bruteforce",
    "win_running_order_total",
    "q16_supplier_part_variety",
]


def test_prepared_covers_expected_queries():
    all_queries()
    for name in PREPARED:
        assert name in REGISTRY, name


@pytest.mark.parametrize("name", ["q5_local_supplier_volume", "ev_sessionize"])
def test_fresh_wrapper_and_stable_results(spark, sf_dir, name):
    qd = all_queries()[name]
    df1 = qd.spark_fn(spark, sf_dir)
    rows1 = sorted(map(tuple, df1.collect()))
    df2 = qd.spark_fn(spark, sf_dir)
    # fresh wrapper, fresh QueryExecution — never the same executed object
    assert df2 is not df1
    assert df2._jdf.queryExecution() != df1._jdf.queryExecution()
    assert sorted(map(tuple, df2.collect())) == rows1
    # bench-style isolation between repeats must not change results
    spark.catalog.clearCache()
    df3 = qd.spark_fn(spark, sf_dir)
    assert sorted(map(tuple, df3.collect())) == rows1


def test_prepared_queries_are_cache_free(spark, sf_dir):
    reg = all_queries()
    for name in PREPARED:
        df = reg[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" not in plan, (
            f"{name} is marked prepared but its plan reads a cache — "
            "prepared reuse is only safe for cache-free builders"
        )


def test_fresh_rewrap_hook_present(spark):
    """_fresh_rewrap rides the private Dataset.ofRows hook; every call site
    falls back to a silent rebuild when it breaks, which would erase the
    prepared-plan optimization (~0.5 s/query) without any test failing.
    Assert the hook itself works on the CURRENT Spark so a version bump
    surfaces as a loud failure, not a quiet regression."""
    from carrot_transform_spark.queries import _fresh_rewrap

    df = spark.range(5).selectExpr("id", "id * 2 AS d")
    rewrapped = _fresh_rewrap(df)  # must NOT raise (fallbacks would mask it)
    assert rewrapped._jdf.queryExecution() != df._jdf.queryExecution()
    assert sorted(map(tuple, rewrapped.collect())) == sorted(map(tuple, df.collect()))


def test_release_query_caches_guarded_in_suite_threads():
    """A suite sub-check builder that releases the query caches would
    unpersist sibling builders' live caches mid-build; the guard makes
    that a loud AssertionError instead of a racy recompute."""
    from carrot_transform_spark import queries as q

    q._IN_SUITE_BUILD.active = True
    try:
        with pytest.raises(AssertionError, match="suite sub-check"):
            q.release_query_caches()
    finally:
        q._IN_SUITE_BUILD.active = False
    q.release_query_caches()  # outside a suite build: normal no-op release
