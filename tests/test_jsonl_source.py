"""JsonlDirSource: newline-delimited JSON into the stringly data plane."""

from __future__ import annotations

import json

import pytest

from carrot_transform_spark.sources.registry import (
    LINE_COL,
    JsonlDirSource,
    make_source,
)


@pytest.fixture()
def jdir(tmp_path):
    rows = [
        {"id": 1, "name": "ada", "score": 1.5, "tags": ["a", "b"]},
        {"id": 2, "name": "bob", "score": 2, "tags": []},
        {"id": 3, "name": None, "score": None, "tags": None},
    ]
    with open(tmp_path / "people.jsonl", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return tmp_path


def test_reads_strings_and_preserves_literals(spark, jdir):
    src = JsonlDirSource(spark, jdir)
    df = src.read("people")
    assert all(t == "string" for c, t in df.dtypes if c != LINE_COL)
    got = {r["id"]: r for r in df.collect()}
    # primitivesAsString keeps the literal tokens: no 2 -> 2.0 reformatting
    assert got["1"]["score"] == "1.5"
    assert got["2"]["score"] == "2"
    assert got["3"]["name"] is None
    # nested values arrive as JSON text
    assert got["1"]["tags"] == '["a","b"]'


def test_dispatch_and_line_order(spark, jdir):
    src = make_source(spark, f"jsonl:{jdir}")
    assert isinstance(src, JsonlDirSource)
    df = src.read("people.jsonl")
    rows = sorted(df.collect(), key=lambda r: r[LINE_COL])
    assert [r["id"] for r in rows] == ["1", "2", "3"]
    assert src.scan_splits("people") == 1


def test_jsonl_sink_round_trip(spark, tmp_path):
    """jsonl: sink writes newline-delimited JSON the jsonl: source reads
    back row-for-row."""
    from carrot_transform_spark.sinks.tsv import JsonlDirSink, make_sink

    sink = make_sink(spark, f"jsonl:{tmp_path}")
    assert isinstance(sink, JsonlDirSink)
    df = spark.createDataFrame(
        [("1", "ada"), ("2", None)], ["id", "name"]
    )
    sink.write("out", df, ["id", "name"])
    back = spark.read.json(str(tmp_path / "out.jsonl"))
    got = sorted((r["id"], r["name"]) for r in back.collect())
    assert got == [("1", "ada"), ("2", None)]


def test_explicit_schema_skips_inference(spark, jdir):
    src = JsonlDirSource(spark, jdir, schema="id string, name string")
    df = src.read("people")
    assert set(df.columns) == {"id", "name", LINE_COL}
    assert df.count() == 3


def test_jsonl_sink_write_rows_interface(spark, tmp_path):
    """write_rows must take (name, header, rows, spark=None) like every
    other sink — pipeline.py passes spark by keyword for the summary
    write — and honor the trailing-empty-header shorten quirk."""
    from carrot_transform_spark.sinks.tsv import make_sink

    sink = make_sink(spark, f"jsonl:{tmp_path}")
    sink.write_rows("summary", ["a", "b", ""], [["1", "2", ""]], spark=spark)
    back = spark.read.json(str(tmp_path / "summary.jsonl"))
    assert set(back.columns) == {"a", "b"}
    assert back.count() == 1


def test_carrot_etl_through_jsonl_sink(spark, tmp_path):
    """The reference demo pipeline runs end-to-end with a jsonl: output —
    every target table plus the summary lands as newline-delimited JSON
    with the same row counts the TSV golden run produces."""
    from pathlib import Path

    from carrot_transform_spark.pipeline import run_transform

    demo = Path("/root/reference/carrottransform/examples/test")
    run_transform(
        spark,
        rules_file=demo / "rules" / "rules_14June2021.json",
        inputs=demo / "inputs",
        output_dir=f"jsonl:{tmp_path}",
        person_table="Demographics",
    )
    person = spark.read.json(str(tmp_path / "person.jsonl"))
    assert person.count() == 1000
    summary = spark.read.json(str(tmp_path / "summary_mapstream.jsonl"))
    assert summary.count() > 0
