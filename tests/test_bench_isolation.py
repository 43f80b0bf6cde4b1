"""bench.py repeat isolation vs memoized shared caches.

bench.py calls spark.catalog.clearCache() between repeats so every run is
cold. The OMOP pipeline queries memoize a persisted person map plus built
plans across invocations (queries/omop_pipeline.py _MEMO/_PLAN_MEMO); if
those memos were executed unchanged after an external clearCache, repeats
would run plan nodes that are still MARKED persisted but hold no data —
every consumer then recomputes the full lineage, and repartitionByRange's
sampling pass re-executes the uncached child ~3x (measured 10s -> 44s per
repeat on the sf1 observation stream).

The r15 contract: _invalidate_if_cache_cleared detects the cleared cache
via the JVM CacheManager (the only honest source: DataFrame.is_cached
still reports the stale mark in Spark 4) and RE-REGISTERS the persists
(person map + every planner._persisted frame), while every invocation
returns a FRESH DataFrame wrapper over the memoized logical plan (new
QueryExecution -> fresh cache lookup, zero execution-state reuse). Each
repeat therefore pays the one-shot standalone cold cost — data always
recomputed — and only the driver-side plan construction is reused.
"""

from __future__ import annotations

from carrot_transform_spark.queries import all_queries, omop_pipeline


def _lookup_defined(spark, df) -> bool:
    return (
        spark._jsparkSession.sharedState()
        .cacheManager()
        .lookupCachedData(df._jdf)
        .isDefined()
    )


def test_clear_cache_reregisters_omop_memo(spark, sf_dir):
    qd = all_queries()["omop_observation_events"]

    df1 = qd.spark_fn(spark, sf_dir)
    n1 = df1.count()
    key = (id(spark), sf_dir)
    assert key in omop_pipeline._MEMO
    pm1 = omop_pipeline._MEMO[key][2]
    assert _lookup_defined(spark, pm1)

    # second invocation reuses the memoized LOGICAL plan but must hand back
    # a fresh wrapper (new QueryExecution): no execution state — finalized
    # AQE plans, materialized shuffle stages — can leak between repeats
    df2 = qd.spark_fn(spark, sf_dir)
    assert df2 is not df1
    assert df2._jdf.queryExecution() != df1._jdf.queryExecution()
    assert df2.count() == n1

    # external cache clear (what bench.py does between repeats) must leave
    # the next invocation with a LIVE person-map cache registration again —
    # stale persist marks with no backing data are the 10s->44s pathology
    spark.catalog.clearCache()
    assert not _lookup_defined(spark, pm1)
    df3 = qd.spark_fn(spark, sf_dir)
    pm3 = omop_pipeline._MEMO[key][2]
    assert _lookup_defined(spark, pm3)
    assert df3.count() == n1
