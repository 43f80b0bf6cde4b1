"""skew_profile (operators/diagnostics.py): heavy-key detection, exact
integer shares, and the salts_hint -> salted_join feedback loop."""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators.diagnostics import skew_profile


def _skewed(spark):
    # key 7 carries 1000 rows; 100 uniform keys carry 10 each
    rows = [(7, i) for i in range(1000)] + [
        (100 + k, i) for k in range(100) for i in range(10)
    ]
    return spark.createDataFrame(rows, "k int, v int")


def test_skew_profile_finds_hot_key(spark):
    prof = skew_profile(_skewed(spark), "k", top_k=5).collect()
    assert [r["rank"] for r in prof] == [1, 2, 3, 4, 5]
    hot = prof[0]
    assert hot["key"] == 7 and hot["n_rows"] == 1000
    # exact integer share: 1000 * 1e6 div 2000 = 500_000 ppm
    assert hot["ppm"] == 500_000
    # 101 keys, avg ~19.8 rows -> the hot key needs ceil(1000*101/2000) = 51 shards
    assert hot["salts_hint"] == 51
    # uniform keys: rate 10/2000 = 5000 ppm, hint ceil(10*101/2000) = 1
    assert prof[1]["ppm"] == 5_000 and prof[1]["salts_hint"] == 1
    # ties broken by key asc -> ranks 2..5 are the smallest uniform keys
    assert [r["key"] for r in prof[1:]] == [100, 101, 102, 103]


def test_skew_profile_hint_drives_salted_join(spark):
    from carrot_transform_spark.operators.skewjoin import salted_join

    big = _skewed(spark)
    small = spark.createDataFrame(
        [(7, "hot"), (100, "a"), (150, "b")], "k int, name string"
    )
    hint = skew_profile(big, "k", top_k=1).collect()[0]["salts_hint"]
    assert hint > 1
    salted = salted_join(big, small, "k", "v", n_salts=int(hint)).orderBy("k", "v")
    plain = big.join(small, "k").orderBy("k", "v")
    assert [tuple(r) for r in salted.select("k", "v", "name").collect()] == [
        tuple(r) for r in plain.select("k", "v", "name").collect()
    ]


def test_skew_profile_partition_invariant(spark):
    df = _skewed(spark)
    one = [tuple(r) for r in skew_profile(df.coalesce(1), "k", top_k=8).collect()]
    many = [tuple(r) for r in skew_profile(df.repartition(16, "v"), "k", top_k=8).collect()]
    assert one == many


def test_skew_profile_uniform_hints_are_one(spark):
    rows = [(k, i) for k in range(50) for i in range(20)]
    df = spark.createDataFrame(rows, "k int, v int")
    prof = skew_profile(df, "k", top_k=50).collect()
    assert all(r["salts_hint"] == 1 for r in prof)
    assert all(r["ppm"] == 20_000 for r in prof)  # 20/1000 exactly


def test_cap_per_group_deterministic_and_capped(spark):
    from carrot_transform_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = cap_per_group(df, "g", "id", cap=20)
    per_g = out.filter("kept = 1").groupBy("g").count().collect()
    assert all(r["count"] == 20 for r in per_g)  # every group has >20 rows
    assert out.count() == 300  # flag, not filter: nothing dropped
    # deterministic + partition invariant
    a = {(r["id"], r["kept"]) for r in out.collect()}
    b = {
        (r["id"], r["kept"])
        for r in cap_per_group(df.repartition(16, "id"), "g", "id", cap=20).collect()
    }
    assert a == b


def test_cap_per_group_small_groups_untouched(spark):
    from carrot_transform_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, g string")
    out = cap_per_group(df, "g", "id", cap=5).collect()
    assert all(r["kept"] == 1 for r in out)


def test_cap_per_group_rejects_bad_cap(spark):
    import pytest as _pytest

    from carrot_transform_spark.operators.sampling import cap_per_group

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with _pytest.raises(ValueError):
        cap_per_group(df, "g", "id", cap=0)
