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
    """A unit whose _COMMIT file is missing (crash before the commit point)
    must not be listed or read."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    st.commit("u1", {"a": _df(spark, [1]), "b": _df(spark, [2])})
    # simulate a crash: data dirs fully written but _COMMIT never landed
    st.commit("u2", {"a": _df(spark, [9]), "b": _df(spark, [9])})
    os.remove(tmp_path / "s" / "a" / "u-u2" / "_COMMIT")
    assert st.units() == ["u1"]
    assert [r.x for r in st.load("a").collect()] == [1]


def test_compact_atomic_and_vacuum(spark, tmp_path):
    """compact() folds live units into one; inputs vanish from listings the
    moment it commits; vacuum reclaims dirs and refuses live units."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    st.commit("u1", {"a": _df(spark, [1]), "b": _df(spark, [5])})
    st.commit("u2", {"a": _df(spark, [2, 3]), "b": _df(spark, [6])})
    replaced = st.compact("c1")
    assert replaced == ["u1", "u2"]
    assert st.units() == ["c1"]
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2, 3]
    assert sorted(r.x for r in st.load("b").collect()) == [5, 6]
    # a later unit coexists with the compacted one
    st.commit("u3", {"a": _df(spark, [4]), "b": _df(spark, [7])})
    assert st.units() == ["c1", "u3"]
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        st.vacuum(["c1"])  # live
    st.vacuum(replaced)
    assert not (tmp_path / "s" / "a" / "u-u1").exists()
    assert st.units() == ["c1", "u3"]


def test_applied_survives_compaction(spark, tmp_path):
    """applied() — the streaming replay guard — must stay true for units a
    compactor retired: a liveness check would let a replay recompute
    against a store containing the batch's own data and then die
    re-committing the retired name."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a",))
    st.commit("s0", {"a": _df(spark, [1])})
    st.commit("s1", {"a": _df(spark, [2])})
    st.compact("c0")
    assert "s1" not in st.units()
    assert st.applied("s1") and st.applied("s0") and st.applied("c0")
    assert not st.applied("s2")
    # crash-uncommitted unit is NOT applied
    st.commit("s3", {"a": _df(spark, [3])})
    os.remove(tmp_path / "s" / "a" / "u-s3" / "_COMMIT")
    assert not st.applied("s3")


def test_retirement_is_transitive_across_vacuumed_compactors(spark, tmp_path):
    """Chained compactions with vacuum in between must keep ALL ancestor
    unit names retired: vacuuming c0 deletes c0's _COMPACTS, so c1 must
    have carried s0 forward — otherwise applied('s0') forgets, a replay
    passes the guard, and the retired-name commit refusal stops firing."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a",))
    st.commit("s0", {"a": _df(spark, [1])})
    st.vacuum(st.compact("c0"))  # c0 retires s0; s0's dirs reclaimed
    st.commit("s1", {"a": _df(spark, [2])})
    st.vacuum(st.compact("c1"))  # c1 retires c0+s1 AND must carry s0
    assert st.applied("s0"), "grandchild retirement lost after vacuum"
    assert st.applied("c0") and st.applied("s1")
    with pytest.raises(ValueError):
        st.commit("s0", {"a": _df(spark, [9])})  # retired forever
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2]


def test_compact_crash_leaves_inputs_live(spark, tmp_path):
    """If the compacting unit never commits, the inputs stay visible —
    readers never see a half-compacted store."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a",))
    st.commit("u1", {"a": _df(spark, [1])})
    st.commit("u2", {"a": _df(spark, [2])})
    st.compact("c1")
    os.remove(tmp_path / "s" / "a" / "u-c1" / "_COMMIT")
    assert st.units() == ["u1", "u2"]
    assert sorted(r.x for r in st.load("a").collect()) == [1, 2]


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


def test_recommit_crash_mid_rewrite_leaves_unit_invisible(spark, tmp_path):
    """Offline RE-commit of an already-committed unit must retract _COMMIT
    before touching any dataset dir: a crash mid-rewrite (here: after the
    secondary dataset is half-overwritten, before the marker dataset) must
    leave the unit invisible, and the next replay must converge."""
    st = UnitStore(spark, str(tmp_path / "s"), ("a", "b"))
    st.commit("u1", {"a": _df(spark, [1]), "b": _df(spark, [2])})
    assert st.units() == ["u1"]

    # fault injection: kill the rewrite after dataset "b" (written first)
    # but before dataset "a" (the marker dataset, written last)
    real_parquet = type(_df(spark, [0]).write).parquet
    calls = []

    def dying_parquet(self, path, **kw):
        calls.append(path)
        if path.endswith("/a/u-u1"):
            raise RuntimeError("injected crash before marker dataset")
        return real_parquet(self, path, **kw)

    type(_df(spark, [0]).write).parquet = dying_parquet
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            st.commit("u1", {"a": _df(spark, [10]), "b": _df(spark, [20])})
    finally:
        type(_df(spark, [0]).write).parquet = real_parquet

    # the old _COMMIT must be gone: the half-rewritten unit is invisible
    assert st.units() == []
    assert not st.applied("u1")
    with pytest.raises(FileNotFoundError):
        st.load("b")

    # replay converges: full re-commit lands the new content atomically
    st.commit("u1", {"a": _df(spark, [10]), "b": _df(spark, [20])})
    assert st.units() == ["u1"]
    assert [r.x for r in st.load("a").collect()] == [10]
    assert [r.x for r in st.load("b").collect()] == [20]
