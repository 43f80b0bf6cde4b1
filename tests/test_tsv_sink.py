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
