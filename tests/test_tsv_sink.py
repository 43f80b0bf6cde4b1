"""TSV sink behaviors: the trailing-empty-column "shorten" quirk
(reference outputs.py:62-83) and header/append handling."""

from __future__ import annotations

from carrot_transform_spark.sinks.tsv import TsvDirSink


def test_write_rows_shorten(tmp_path):
    sink = TsvDirSink(tmp_path)
    sink.write_rows("t", ["a", "b", ""], [["1", "2", "x"], ["3", "4", "y"]])
    text = (tmp_path / "t.tsv").read_text()
    assert text == "a\tb\n1\t2\n3\t4\n"


def test_write_rows_no_shorten(tmp_path):
    sink = TsvDirSink(tmp_path)
    sink.write_rows("t", ["a", "b"], [["1", "2"]])
    assert (tmp_path / "t.tsv").read_text() == "a\tb\n1\t2\n"


def test_write_df_shorten(spark, tmp_path):
    df = spark.createDataFrame([("1", "2", "x")], ["a", "b", "c"])
    sink = TsvDirSink(tmp_path)
    sink.write("t", df, ["a", "b", ""])
    assert (tmp_path / "t.tsv").read_text() == "a\tb\n1\t2\n"


def test_person_ids_streamed(spark, tmp_path):
    """person_ids goes through the sink (no driver-side collect) and is
    byte-identical to the old write_rows output."""
    from carrot_transform_spark.pipeline import run_transform

    demo = "/root/reference/carrottransform/examples/test/inputs"
    rules = "/root/reference/carrottransform/examples/test/rules/rules_14June2021.json"
    res = run_transform(
        spark,
        rules_file=rules,
        inputs=demo,
        output_dir=str(tmp_path),
        person_table="Demographics",
    )
    text = (tmp_path / "person_ids.tsv").read_text().splitlines()
    assert text[0] == "SOURCE_SUBJECT\tTARGET_SUBJECT"
    assert len(text) == res.person_map.count() + 1
    ids = [int(line.split("\t")[1]) for line in text[1:]]
    assert ids == list(range(1, len(ids) + 1))


def test_single_mode_size_guard_refuses(spark, tmp_path):
    """single mode must refuse plans whose estimated input exceeds the cap:
    it streams through the driver and exists only for small parity runs."""
    import pytest

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS a")
    sink = TsvDirSink(tmp_path, mode="single", single_size_cap=10)
    with pytest.raises(ValueError, match="single mode"):
        sink.write("t", df, ["a"])
    # nothing half-written
    assert not (tmp_path / "t.tsv").exists()


def test_single_mode_size_guard_allows_small(spark, tmp_path):
    df = spark.createDataFrame([("1",), ("2",)], ["a"])
    sink = TsvDirSink(tmp_path, mode="single")  # default 1 GiB cap
    sink.write("t", df, ["a"])
    assert (tmp_path / "t.tsv").read_text() == "a\n1\n2\n"


def test_single_mode_size_guard_disabled(spark, tmp_path):
    df = spark.range(5).selectExpr("CAST(id AS STRING) AS a")
    sink = TsvDirSink(tmp_path, mode="single", single_size_cap=None)
    sink.write("t", df, ["a"])
    assert (tmp_path / "t.tsv").read_text().startswith("a\n")


def test_plan_input_bytes_uses_leaf_stats(spark, tmp_path):
    """The estimate sums LEAF scan sizes, so a join of two small file scans
    stays small (Catalyst's join-level estimate multiplies and would trip
    the cap), and RDD-backed leaves with sentinel stats are skipped."""
    from carrot_transform_spark.sinks.tsv import _plan_input_bytes

    spark.createDataFrame([(i, "x" * 10) for i in range(50)], ["k", "v"]).write.parquet(
        str(tmp_path / "a")
    )
    spark.createDataFrame([(i, "y" * 10) for i in range(50)], ["k", "w"]).write.parquet(
        str(tmp_path / "b")
    )
    a = spark.read.parquet(str(tmp_path / "a"))
    b = spark.read.parquet(str(tmp_path / "b"))
    est = _plan_input_bytes(a.join(b, "k"))
    assert est is not None and 0 < est < 1 << 20

    # RDD-backed leaves report the Long.MaxValue sentinel and must not
    # poison the sum
    rdd_df = spark.createDataFrame([(1, "x")], ["k", "v"])
    est2 = _plan_input_bytes(rdd_df)
    assert est2 is not None and est2 < 1 << 62
