"""JDBC round-trip: CSV fixture -> embedded Derby -> JDBC source -> pipeline
-> golden diff. Exercises the S2 (JDBC scan) and K2 (JDBC sink) connectors
end-to-end against a real database on the Spark classpath (the reference's
integration matrix runs the same corpus through SQLite/Postgres/Trino,
tests/test_integration.py:105-186)."""

from __future__ import annotations

from pathlib import Path

import pytest

from carrot_transform_spark.sinks.tsv import JdbcSink
from carrot_transform_spark.sources.registry import LINE_COL, CsvDirSource, JdbcSource, make_source
from tests.carrot_compare import compare_table

DATA = Path("/root/reference/tests/test_data/observe_smoking")


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "ct_db"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    csv = CsvDirSource(spark, DATA)
    sink = JdbcSink(url, props)
    for f in DATA.glob("*.csv"):
        name = f.stem.lower()
        df = csv.read(f.name).drop(LINE_COL)
        sink.write(name, df, df.columns)
    return url, props


def test_jdbc_sink_then_scan(spark, derby_url):
    url, props = derby_url
    src = JdbcSource(spark, url, props)
    df = src.read("demos.csv")  # extension stripped, identifier lowered
    csv = CsvDirSource(spark, DATA).read("demos.csv")
    assert sorted(df.columns) == sorted(csv.columns)
    assert df.count() == csv.count()
    got = {tuple(r) for r in df.drop(LINE_COL).collect()}
    want = {tuple(r) for r in csv.drop(LINE_COL).collect()}
    assert got == want


def test_jdbc_pipeline_matches_golden(spark, derby_url, tmp_path):
    from carrot_transform_spark.pipeline import run_transform

    url, props = derby_url
    run_transform(
        spark,
        rules_file=DATA / "mapping.json",
        inputs=JdbcSource(spark, url, props),
        output_dir=tmp_path,
        person_table="demos",
    )
    problems = []
    for table in ("person", "observation"):
        problems += compare_table(
            table,
            tmp_path / f"{table}.tsv",
            DATA / f"{table}.tsv",
            tmp_path / "person_ids.tsv",
            DATA / "person_ids.tsv",
        )
    assert not problems, "\n".join(problems)


def test_make_source_jdbc_dispatch(spark):
    src = make_source(spark, "jdbc:derby:memory:disp;create=true")
    assert isinstance(src, JdbcSource)


def test_numpartitions_derives_parallel_scan(spark, tmp_path):
    """numPartitions without partitionColumn must yield a genuinely
    parallel read: the source derives the partition column (numeric,
    *id*-preferred) and MIN/MAX bounds from the table itself, with row
    parity against the single-stream read."""
    db = tmp_path / "pderby"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    src_df = spark.range(0, 1000).selectExpr(
        "id AS row_id", "CAST(id % 7 AS STRING) AS val"
    )
    src_df.write.format("jdbc").option("url", url).option("dbtable", "nums").options(
        **props
    ).save()

    single = JdbcSource(spark, url, props).read("nums")
    par_src = JdbcSource(spark, url, {**props, "numPartitions": "4"})
    par = par_src.read("nums")
    assert par.rdd.getNumPartitions() == 4
    assert par_src.scan_splits("nums") == 4
    a = {tuple(r) for r in single.drop(LINE_COL).collect()}
    b = {tuple(r) for r in par.drop(LINE_COL).collect()}
    assert a == b and len(a) == 1000


def test_numpartitions_falls_back_without_numeric_column(spark, tmp_path):
    db = tmp_path / "tderby"
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.iapi.jdbc.AutoloadedDriver"}
    spark.createDataFrame([("a", "x"), ("b", "y")], "k string, v string").write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "strs").options(**props).save()
    par = JdbcSource(spark, url, {**props, "numPartitions": "4"}).read("strs")
    assert par.rdd.getNumPartitions() == 1  # honest single stream
    assert par.count() == 2
