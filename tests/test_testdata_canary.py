"""Testdata drift canary.

The driver regenerates /root/testdata between rounds and has changed
physical encodings before (events.ts: TIMESTAMP(NANOS) -> timestamp[us]),
which silently broke every consumer at once. This pins the DRIVER-VISIBLE
shape — what load() hands to queries — so any regeneration that would
break query analysis fails here first, as one pointed diff instead of 11
opaque oracle errors.

If this test goes red after a testdata refresh: compare the new dtypes,
extend _TEMPORAL_COLS / _load_normalized in queries/__init__.py if a new
encoding appeared, and update EXPECTED to the new contract in the same
commit.
"""

import pytest

from carrot_transform_spark.queries import load

SF = "/root/testdata/sf0.001"

# table -> {column: dtype-as-seen-through-load()}
EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double", "l_returnflag": "string",
        "l_linestatus": "string", "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


@pytest.mark.parametrize("table", list(EXPECTED))
def test_driver_visible_schema(spark, table):
    got = dict(load(spark, SF, table).dtypes)
    assert got == EXPECTED[table], (
        f"testdata schema drifted for {table!r}: {got} != {EXPECTED[table]} — "
        "see module docstring for the update procedure"
    )
