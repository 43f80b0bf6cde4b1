"""Property-based tests: the Column-expression date functions must agree
with an independent Python model of the reference's documented semantics
(date_helpers.py:31-83 permissive regex; date_helpers.py:9-28 strict
strptime) across generated inputs, including calendar-invalid shapes and
trailing garbage that the permissive parser deliberately accepts.
"""

from __future__ import annotations

import datetime
import re

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from carrot_transform_spark.functions.dates import (
    normalise_to8601,
    strict_date,
    strict_date_ok,
)

# -- independent model of the permissive normaliser ------------------------

_ISO = re.compile(r"(\d{4})[-/](\d{2})[-/](\d{2})")
_REV = re.compile(r"(\d{2})[-/](\d{2})[-/](\d{4})")
_TIME = re.compile(r"(\d{2}):(\d{2})(:(\d{2})(\.\d{6})?)?")


def model_normalise(item: str) -> str | None:
    both = item.split(" ")
    m = _ISO.match(both[0])
    if m:
        y, mo, d = m.group(1), m.group(2), m.group(3)
    else:
        m = _REV.match(both[0])
        if not m:
            return None
        d, mo, y = m.group(1), m.group(2), m.group(3)
    value = f"{int(y):04d}-{int(mo):02d}-{int(d):02d} "
    # the reference parses the time token ONLY for exactly-two-element
    # splits (date_helpers.py:57 'if 2 == len(both)'); a third token
    # forfeits the time entirely
    if len(both) == 2:
        t = _TIME.match(both[1])
        if t and t.group(1) is not None:
            sec = t.group(4) if t.group(4) is not None else "0"
            value += f"{int(t.group(1)):02d}:{int(t.group(2)):02d}:{int(sec):02d}"
    if ":" not in value:
        value += "00:00:00"
    return value


def model_strict(item: str) -> datetime.date | None:
    for fmt in ("%Y-%m-%d", "%d-%m-%Y", "%d/%m/%Y"):
        try:
            return datetime.datetime.strptime(item, fmt).date()
        except ValueError:
            continue
    return None


# -- generators ------------------------------------------------------------

date_like = st.one_of(
    # well-formed dates in the three accepted orders, either separator
    st.tuples(
        st.integers(1, 9999), st.integers(1, 12), st.integers(1, 28),
        st.sampled_from(["-", "/"]), st.booleans(),
    ).map(
        lambda t: f"{t[0]:04d}{t[3]}{t[1]:02d}{t[3]}{t[2]:02d}"
        if t[4]
        else f"{t[2]:02d}{t[3]}{t[1]:02d}{t[3]}{t[0]:04d}"
    ),
    # calendar-invalid digit shapes (the permissive parser accepts these)
    st.tuples(st.integers(0, 9999), st.integers(0, 99), st.integers(0, 99)).map(
        lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}"
    ),
    # garbage
    st.text(alphabet="0123456789-/: .ab", min_size=0, max_size=24),
)

time_like = st.one_of(
    st.just(""),
    st.tuples(st.integers(0, 99), st.integers(0, 99)).map(lambda t: f" {t[0]:02d}:{t[1]:02d}"),
    st.tuples(st.integers(0, 99), st.integers(0, 99), st.integers(0, 99)).map(
        lambda t: f" {t[0]:02d}:{t[1]:02d}:{t[2]:02d}"
    ),
    st.tuples(st.integers(0, 23), st.integers(0, 59), st.integers(0, 59), st.integers(0, 999999)).map(
        lambda t: f" {t[0]:02d}:{t[1]:02d}:{t[2]:02d}.{t[3]:06d}"
    ),
    st.just(" garbage"),
)


@pytest.fixture(scope="module")
def run_exprs(spark):
    def run(values: list[str]) -> list[tuple[str | None, datetime.date | None]]:
        df = spark.createDataFrame([(v,) for v in values], "raw string")
        rows = (
            df.select(
                normalise_to8601(F.col("raw")).alias("n"),
                strict_date(F.col("raw")).alias("s"),
                strict_date_ok(F.col("raw")).alias("ok"),
            )
            .collect()
        )
        return [(r["n"], r["s"], r["ok"]) for r in rows]

    return run


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(date_like, time_like), min_size=1, max_size=40))
def test_normalise_matches_model(run_exprs, pairs):
    values = [d + t for d, t in pairs]
    got = run_exprs(values)
    for v, (norm, strict, ok) in zip(values, got):
        assert norm == model_normalise(v), f"normalise({v!r}): {norm!r} != model"


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(date_like, min_size=1, max_size=40))
def test_strict_matches_model(run_exprs, values):
    got = run_exprs(values)
    for v, (_norm, strict, ok) in zip(values, got):
        expect = model_strict(v)
        assert strict == expect, f"strict({v!r}): {strict!r} != {expect!r}"
        # the single-eval boolean twin: ok == (strict is not None), never NULL
        assert ok == (expect is not None), f"strict_ok({v!r}): {ok!r}"


def test_normalise_fast_path_shapes_exact(run_exprs):
    """Deterministic pin of the r16 canonical fast paths against the model
    (hypothesis usually hits these shapes, but never guarantees it)."""
    values = [
        "2020-05-06 10:11:22",   # canonical datetime -> identity
        "2020-05-06",            # canonical date -> + ' 00:00:00'
        "0002-00-99 23:59:59",   # calendar-invalid but shape-canonical
        "2020-5-6 10:11:22",     # NOT canonical (unpadded) -> permissive path
        "06/05/2020 10:11:22",   # reversed with slashes -> permissive path
        "2020-05-06 10:11:22.123456",  # micros -> permissive path
        "2020-05-06 10:11",      # no seconds -> permissive path
        "2020-05-06  10:11:22",  # three tokens -> time forfeited
        "06-05-2020",            # reversed canonical -> fast rearrange
        "06/05/2020",            # reversed canonical, slashes
        "06-05/2020",            # MIXED separators -> permissive path
        "2020-05-06 10:11:22.985529",  # trimmed-fraction datetime -> fast
        "2020-05-06 10:11:22.9",       # 1-digit fraction -> fast
        "2020-05/06",            # MIXED-separator ISO -> translate arm
        "2020-05-06trailing",    # prefix match, trailing garbage dropped
        "06-05-2020 10:11",      # reversed WITH time token
        "a 10:11:22",            # time token but no date -> NULL
        "2020-05-06 ",           # exactly-two-token with EMPTY time token
        "garbage",
        "",
    ]
    got = run_exprs(values)
    for v, (norm, _s, _ok) in zip(values, got):
        assert norm == model_normalise(v), f"normalise({v!r}): {norm!r} != model"
