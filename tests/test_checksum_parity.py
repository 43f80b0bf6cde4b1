"""Property test for the checksum-suite render parity: for any values, the
Spark render and the DuckDB render must produce identical bytes — this is
the invariant every suite entry's sig_sum rests on."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from carrot_transform_spark.queries import checksum_df, checksum_sql

# doubles restricted to values that survive a DECIMAL(27,6) cast exactly the
# same way in both engines: pre-rounded to <= 4 decimal places, magnitude
# within the decimal's range — which is what every suite column provides
# (all suite "f" columns are ROUND(x, <=4) outputs). Magnitude goes to 1e11
# (ulp <= 1e-4, so the 4dp decimal IS the double's shortest repr): round 9
# found DuckDB's direct double->DECIMAL(27,6) cast goes through x*1e6 in
# floating point and corrupts the microdigits above ~9e9 — the strategy's
# old 1e8 cap sat entirely below the divergence zone. A second class draws
# exact halves up to ~4.5e15 (representable at any of these magnitudes),
# covering the aggregate-sum scale where sf10 diverged.
_rounded_doubles = st.one_of(
    st.integers(min_value=-(10**15), max_value=10**15).map(lambda i: i / 10**4),
    st.integers(min_value=-(9 * 10**15), max_value=9 * 10**15).map(lambda i: i / 2),
)


@st.composite
def _rows(draw):
    n = draw(st.integers(min_value=0, max_value=8))
    return [
        (
            draw(st.integers(min_value=-(2**62), max_value=2**62)),
            draw(
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), blacklist_characters="\x1f'\\\x00"
                    ),
                    max_size=20,
                )
            ),
            draw(_rounded_doubles),
        )
        for _ in range(n)
    ]


@settings(max_examples=25, deadline=None)
@given(_rows())
def test_checksum_render_parity(spark, rows):
    cols = [("i_val", "i"), ("s_val", "s"), ("f_val", "f")]
    sdf = spark.createDataFrame(rows or [], "i_val long, s_val string, f_val double")
    got = checksum_df(sdf, cols, "prop").collect()[0]

    con = duckdb.connect()
    if rows:
        values = ", ".join(
            "({}, '{}', {!r})".format(i, s.replace("'", "''"), f) for i, s, f in rows
        )
        inner = f"SELECT * FROM (VALUES {values}) AS t(i_val, s_val, f_val)"
    else:
        inner = "SELECT CAST(NULL AS BIGINT) i_val, CAST(NULL AS VARCHAR) s_val, CAST(NULL AS DOUBLE) f_val WHERE 1=0"
    want = con.execute(checksum_sql(inner, cols, "prop")).fetchone()
    con.close()

    assert (got["check_name"], got["n_rows"], got["sig_sum"]) == want


def test_checksum_large_double_regression(spark):
    """The exact sf10 witnesses: engine-equal doubles >9e9 whose DuckDB
    direct decimal cast rendered ...000064/...999936/...500096 while Spark
    rendered the clean 6dp form (sql_ops_suite agg_cube_orders mismatch,
    round 9). Pinned so the render path can never regress to the raw cast."""
    cols = [("f_val", "f")]
    vals = [
        (753511015307.0,),
        (747231469342.5,),
        (747892739445.0,),
        (1242495051091.0,),
        (1262037470858.5,),
    ]
    sdf = spark.createDataFrame(vals, "f_val double")
    got = checksum_df(sdf, cols, "big").collect()[0]
    con = duckdb.connect()
    inner = "SELECT * FROM (VALUES {}) AS t(f_val)".format(
        ", ".join(f"(CAST({v!r} AS DOUBLE))" for (v,) in vals)
    )
    want = con.execute(checksum_sql(inner, cols, "big")).fetchone()
    con.close()
    assert (got["check_name"], got["n_rows"], got["sig_sum"]) == want


def test_checksum_null_handling(spark):
    cols = [("i_val", "i"), ("s_val", "s")]
    sdf = spark.createDataFrame([(None, "x"), (1, None)], "i_val long, s_val string")
    got = checksum_df(sdf, cols, "nulls").collect()[0]
    con = duckdb.connect()
    inner = (
        "SELECT * FROM (VALUES (CAST(NULL AS BIGINT), 'x'), (1, CAST(NULL AS VARCHAR)))"
        " AS t(i_val, s_val)"
    )
    want = con.execute(checksum_sql(inner, cols, "nulls")).fetchone()
    con.close()
    assert (got["check_name"], got["n_rows"], got["sig_sum"]) == want
