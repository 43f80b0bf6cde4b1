"""UnitStore: versioned _SUCCESS-gated multi-dataset parquet commits."""

from __future__ import annotations

import os

import pytest

from carrot_transform_spark.operators.unitstore import UnitStore


def _df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], ["x"])


def test_commit_load_units(spark, tmp_path):
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    assert st.units() == []
    st.commit("u1", {"a": _df(spark, [1, 2]), "b": _df(spark, [10])})
    st.commit("u2", {"a": _df(spark, [3]), "b": _df(spark, [20, 30])})
    assert st.units() == ["u1", "u2"]
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2, 3]
    assert sorted(r.x for r in st.load("b", ["u2"]).collect()) == [20, 30]


def test_uncommitted_unit_invisible(spark, tmp_path):
    """A unit whose marker dataset lacks _SUCCESS (crash between datasets)
    must not be listed or read."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    st.commit("u1", {"a": _df(spark, [1]), "b": _df(spark, [2])})
    # simulate a crash: marker dir exists but _SUCCESS is gone
    st.commit("u2", {"a": _df(spark, [9]), "b": _df(spark, [9])})
    os.remove(tmp_path / "s" / "a" / "u-u2" / "_SUCCESS")
    assert st.units() == ["u1"]
    assert [r.x for r in st.load("a").collect()] == [1]


def test_replay_overwrites(spark, tmp_path):
    st = UnitStore(spark, str(tmp_path / "s"), ("a",))
    st.commit("u1", {"a": _df(spark, [1, 2, 3])})
    st.commit("u1", {"a": _df(spark, [1, 2, 3])})  # replay: same rows, no dup
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2, 3]


def test_validation(spark, tmp_path):
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    with pytest.raises(ValueError):
        st.commit("u1", {"a": _df(spark, [1])})  # missing dataset
    with pytest.raises(ValueError):
        st.load("nope")
    with pytest.raises(FileNotFoundError):
        st.load("a")
