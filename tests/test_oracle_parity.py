"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a local pre-flight for the driver's CORRECTNESS gate (which runs at
sf0.01); queries without an oracle are smoke-run for schema stability and
rows >= 0.
"""

from __future__ import annotations

import pytest

from carrot_transform_spark.queries import all_queries
from tests.oracle_compare import compare_query, duck_connect

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qd = QUERIES[name]
    if qd.oracle is None:
        df = qd.spark_fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.columns) > 0
        return
    res = compare_query(spark, duck, name, qd.spark_fn, qd.oracle, sf_dir)
    assert res.ok, (
        f"{name}: rows {res.spark_rows} vs {res.oracle_rows}; "
        f"cols {res.spark_cols} vs {res.oracle_cols}; "
        f"hash {res.spark_hash[:12]} vs {res.oracle_hash[:12]}\n{res.detail}"
    )
