"""Round-3 advice closures: SQL-literal escaping in oracle twins, loud
failure on lost simhash metadata, and query-cache release bookkeeping."""

import duckdb
import pytest

import carrot_transform_spark.operators.dedup as dd
from carrot_transform_spark.functions import sql_str
from carrot_transform_spark.operators.funnel import funnel_steps_sql
from carrot_transform_spark.operators.sampling import hash_split_sql, sample_threshold_sql
from carrot_transform_spark.queries import _QUERY_CACHES, qpersist, release_query_caches


def test_sql_str_doubles_quotes():
    assert sql_str("it's") == "'it''s'"
    assert sql_str("plain") == "'plain'"
    assert sql_str("a''b") == "'a''''b'"


def test_funnel_sql_survives_quoted_step_name():
    # a step name containing a single quote must neither break the query
    # nor inject: the generated SQL runs and labels the step verbatim
    sql = funnel_steps_sql(
        "(SELECT 1 AS u, 'sign''up' AS t, 10 AS ts)", "u", "t", "ts", ["sign'up"]
    )
    rows = duckdb.sql(sql).fetchall()
    assert rows == [(1, "sign'up", 1)]


def test_hash_split_sql_survives_quoted_names():
    expr = hash_split_sql("id", {"tr'ain": 0.5, "te'st": 0.5}, salt="sa'lt")
    rows = duckdb.sql(f"SELECT {expr} FROM (SELECT 1 AS id)").fetchall()
    assert rows[0][0] in ("tr'ain", "te'st")
    # single-split degenerate path quotes too
    assert duckdb.sql(
        f"SELECT {hash_split_sql('id', {chr(39): 1.0})} FROM (SELECT 1 AS id)"
    ).fetchall() == [("'",)]


def test_sample_threshold_sql_survives_quoted_stratum():
    expr = sample_threshold_sql("lang", {"e'n": 0.25})
    rows = duckdb.sql(f"SELECT {expr} FROM (SELECT 'e''n' AS lang)").fetchall()
    assert rows == [(2500,)]


def test_hamming_pairs_raises_on_lost_metadata(spark):
    # a frame that looks signature-shaped but lacks the simhash_bits
    # metadata must fail loudly, not silently assume 64 bits (the wrong
    # guess degenerates blocking into one O(n^2) bucket)
    bare = spark.createDataFrame([(1, 0, 5), (2, 0, 7)], "id long, sim_hi long, sim_lo long")
    with pytest.raises(ValueError, match="simhash_bits"):
        dd.hamming_pairs(bare)
    # explicit width bypasses the metadata requirement
    assert dd.hamming_pairs(bare, bits=64, prefix_bits=16).count() >= 0


def test_qpersist_release_unpersists(spark):
    df = qpersist(spark.range(10), eager=True)
    assert df.storageLevel.useMemory
    assert df in _QUERY_CACHES
    release_query_caches()
    assert not _QUERY_CACHES
    assert not df.storageLevel.useMemory
    assert df.count() == 10  # unpersisted frame recomputes fine
