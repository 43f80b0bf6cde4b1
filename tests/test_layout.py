"""Z-order layout (operators/layout.py) and weighted sampling
(operators/sampling.weighted_sample): key correctness vs a pure-Python
reference, multi-dimensional clustering locality, and real parquet
file-skipping evidence from footer min/max stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.operators.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_repartition,
)
from carrot_transform_spark.operators.sampling import DENOM, weighted_sample


def _interleave(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_zorder_key_matches_python(spark):
    rows = [(x, y) for x in (0, 1, 5, 63, 255) for y in (0, 2, 17, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _interleave([x, y], 8), (x, y)


def test_zorder_key_sql_twin_matches(spark):
    import duckdb

    rows = [(x, y) for x in (0, 3, 44, 200) for y in (7, 65, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    s = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    con = duckdb.connect()
    expr = zorder_key_sql(["x", "y"], bits=8)
    for x, y in rows:
        (zv,) = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y) t"
        ).fetchone()
        assert zv == s[(x, y)], (x, y)


def test_zorder_key_rejects_overflow_and_empty():
    with pytest.raises(ValueError):
        zorder_key([], bits=8)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)  # 64 bits > signed range


def _partition_boxes(df):
    return (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
        .collect()
    )


def test_zorder_locality_beats_roundrobin(spark):
    # 64x64 grid; z-order into 16 partitions -> each partition's bounding
    # box should cover a small quadrant, while round-robin boxes span the
    # full range. Locality is what turns into file skipping at scale.
    grid = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x int, y int")

    zdf = zorder_repartition(df, ["x", "y"], num_partitions=16, bits=6)
    assert zdf.count() == 4096  # nothing lost
    z_boxes = _partition_boxes(zdf.drop("__z"))
    z_area = sum(
        (r["max(x)"] - r["min(x)"] + 1) * (r["max(y)"] - r["min(y)"] + 1)
        for r in z_boxes
    ) / len(z_boxes)

    rr_boxes = _partition_boxes(df.repartition(16))
    rr_area = sum(
        (r["max(x)"] - r["min(x)"] + 1) * (r["max(y)"] - r["min(y)"] + 1)
        for r in rr_boxes
    ) / len(rr_boxes)

    # perfect 16-way z-split of a 64x64 grid gives 16x16 quadrants (area
    # 256); allow generous slack for range-partitioner boundaries. Round
    # robin boxes are ~the full 4096.
    assert z_area <= 1024, z_boxes
    assert rr_area >= 2048, rr_boxes
    assert z_area * 2 < rr_area


def _files_hit(path: str, col_lo_hi: dict[str, tuple[int, int]]) -> int:
    hit = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        overlaps = True
        for col, (lo, hi) in col_lo_hi.items():
            ci = schema_names.index(col)
            cmin = min(
                md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups)
            )
            cmax = max(
                md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups)
            )
            if cmax < lo or cmin > hi:
                overlaps = False
                break
        hit += overlaps
    return hit


def test_zorder_parquet_file_skipping(spark, tmp_path):
    grid = [(x, y, x * 64 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(grid, "x int, y int, payload int")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_repartition(df, ["x", "y"], num_partitions=16, bits=6).drop("__z").write.parquet(zpath)
    df.repartition(16).write.parquet(rpath)

    box = {"x": (10, 17), "y": (40, 47)}  # selective 2-dim predicate
    z_hit, r_hit = _files_hit(zpath, box), _files_hit(rpath, box)
    # every round-robin file spans the full range -> all 16 hit; the
    # z-ordered layout confines the box to a few neighbouring key ranges
    assert r_hit == 16
    assert z_hit <= 4, (z_hit, r_hit)


def test_weighted_sample_deterministic_and_proportional(spark):
    rows = [(i, (i % 10) + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, w int")
    out = weighted_sample(df, "w", "id").cache()
    # deterministic: re-running yields the identical flag set
    a = {(r["id"], r["sampled"]) for r in out.collect()}
    b = {
        (r["id"], r["sampled"])
        for r in weighted_sample(df, "w", "id").collect()
    }
    assert a == b
    # max-weight rows are always kept (threshold == DENOM)
    kept_max = out.filter("w = 10").agg(F.min("sampled")).collect()[0][0]
    assert kept_max == 1
    # keep rate ~ w / max_w per weight class (md5 is uniform; 500 rows/class)
    rates = {
        r["w"]: r["rate"]
        for r in out.groupBy("w").agg(F.avg("sampled").alias("rate")).collect()
    }
    for w, rate in rates.items():
        assert abs(rate - w / 10) < 0.08, (w, rate)
    out.unpersist()


def test_weighted_sample_partition_invariant(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w int")
    one = {
        (r["id"], r["sampled"])
        for r in weighted_sample(df.coalesce(1), "w", "id").collect()
    }
    many = {
        (r["id"], r["sampled"])
        for r in weighted_sample(df.repartition(16, "w"), "w", "id").collect()
    }
    assert one == many
    assert DENOM == 10_000  # threshold contract baked into the oracle SQL


def test_write_sized_controls_file_count(spark, tmp_path):
    """write_sized collapses an over-partitioned frame to few healthy
    files, and splits when the target is tiny."""
    from carrot_transform_spark.operators.layout import write_sized

    df = spark.range(200_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("payload")
    ).repartition(64)

    n1 = write_sized(df, str(tmp_path / "big"), target_mb=512)
    files1 = list((tmp_path / "big").glob("part-*.parquet"))
    assert n1 == 1 and len(files1) == 1  # ~MBs of data, one healthy file

    n2 = write_sized(df, str(tmp_path / "small"), target_mb=1)
    files2 = list((tmp_path / "small").glob("part-*.parquet"))
    assert n2 > 1 and len(files2) == n2
    assert spark.read.parquet(str(tmp_path / "small")).count() == 200_000


def test_write_sized_samples_beyond_leading_rows(spark, tmp_path):
    """The row-size estimate must come from a spread sample: a frame whose
    first rows are tiny but whose tail rows are wide would be undersized by
    a first-N probe (fewer, oversized files)."""
    from carrot_transform_spark.operators.layout import write_sized

    wide = F.repeat(F.lit("x"), 2000)
    df = (
        spark.range(50_000)
        .select(
            F.col("id"),
            F.when(F.col("id") < 2_000, F.lit("s")).otherwise(wide).alias("payload"),
        )
        .sort("id")  # leading split = the skinny rows
    )
    n = write_sized(df, str(tmp_path / "skew"), target_mb=1, sample_rows=500)
    # honest estimate: ~96 MB in-memory/3 ≈ dozens of 1 MB files; a
    # first-2000-rows probe estimates ~60 bytes/row and writes ~1 file
    assert n >= 10, f"sample saw only the skinny leading rows: {n} file(s)"
    assert spark.read.parquet(str(tmp_path / "skew")).count() == 50_000
