"""with_dense_ids: the r16 zero-shuffle bucket path must produce exactly
the ids of the generic path (dense 1..N in order-cols order), fall back
when the bucket promise is false, and add no exchange when the input is
already hash-partitioned by the bucket column."""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators.ids import with_dense_ids


def _mk(spark, n=997, buckets=16):
    # bucket = deterministic range bucket of key; hash-clustered by bucket
    # (row order within partitions is whatever the shuffle produced)
    return (
        spark.range(0, n)
        .select(F.col("id").alias("k"))
        .withColumn("b", F.floor(F.col("k") * buckets / n).cast("long"))
        .repartition(8, "b")
    )


def test_bucket_path_matches_generic(spark):
    df = _mk(spark)
    got = with_dense_ids(df, ["k"], "id", offset=7, small_threshold=0, bucket_col="b")
    rows = {r["k"]: r["id"] for r in got.collect()}
    assert rows == {k: 7 + k + 1 for k in range(997)}
    # plan shape: ids come from the bucket path (broadcast starts join, no
    # range exchange of the payload, no SinglePartition window)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert "SinglePartition" not in plan


def test_bucket_path_repeat_invocations_stable(spark):
    df = _mk(spark, n=500)
    a = with_dense_ids(df, ["k"], "id", small_threshold=0, bucket_col="b")
    b = with_dense_ids(df, ["k"], "id", small_threshold=0, bucket_col="b")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bucket_overlap_falls_back_to_generic(spark):
    # bucket column NOT aligned with the order: ranges overlap -> the
    # runtime check must reject the fast path and the generic path must
    # still hand out correct dense ids
    df = (
        spark.range(0, 400)
        .select(F.col("id").alias("k"))
        .withColumn("b", (F.col("k") % 4).cast("long"))  # interleaved!
        .repartition(4, "b")
    )
    got = with_dense_ids(df, ["k"], "id", small_threshold=0, bucket_col="b")
    rows = {r["k"]: r["id"] for r in got.collect()}
    assert rows == {k: k + 1 for k in range(400)}


def test_bucket_path_multi_order_cols(spark):
    # composite order key (the compiler's FILEIDX/LINE/FIELDIDX/COMBO shape)
    df = (
        spark.range(0, 300)
        .select(
            (F.col("id") / 3).cast("long").alias("line"),
            (F.col("id") % 3).cast("int").alias("sub"),
        )
        .withColumn("b", F.floor(F.col("line") / 10).cast("long"))
        .repartition(8, "b")
    )
    got = with_dense_ids(df, ["line", "sub"], "id", small_threshold=0, bucket_col="b")
    rows = {(r["line"], r["sub"]): r["id"] for r in got.collect()}
    assert rows == {(i // 3, i % 3): i + 1 for i in range(300)}
