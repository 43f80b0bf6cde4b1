"""Property test: a UnitStore tracks a model dict through ANY sequence of
commit / replay-commit / compact / vacuum operations.

Invariant after every step: units() equals the model's live units and
load() returns exactly the union of their rows — no sequence of
maintenance operations can double, drop, or resurrect rows.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from carrot_transform_spark.operators.unitstore import UnitStore

# op encoding: ("commit", unit_idx, payload) | ("replay", ) | ("compact",) | ("vacuum",)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("commit"), st.integers(0, 5), st.integers(0, 99)),
        st.just(("replay",)),
        st.just(("compact",)),
        st.just(("vacuum",)),
    ),
    min_size=1,
    max_size=8,
)


@pytest.fixture(scope="module")
def store_root(tmp_path_factory):
    return tmp_path_factory.mktemp("unitstore_prop")


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_OPS, data=st.data())
def test_store_matches_model(spark, store_root, ops, data):
    import uuid

    path = str(store_root / uuid.uuid4().hex)
    st_obj = UnitStore(spark, path, ("a",))
    model: dict[str, list[int]] = {}  # live units -> rows
    pending_vacuum: list[str] = []
    last_commit: tuple[str, list[int]] | None = None
    n_compacts = 0

    def df(rows):
        return spark.createDataFrame([(r,) for r in rows], "x int")

    for op in ops:
        if op[0] == "commit":
            unit = f"u{op[1]}"
            if st_obj.applied(unit):
                continue  # protocol: applied units are never re-committed
            rows = [op[2], op[2] + 100]
            st_obj.commit(unit, {"a": df(rows)})
            model[unit] = rows
            last_commit = (unit, rows)
        elif op[0] == "replay" and last_commit is not None:
            unit, rows = last_commit
            if not st_obj.applied(unit):
                continue
            if unit in st_obj.units():  # replay only overwrites live units
                st_obj.commit(unit, {"a": df(rows)})
        elif op[0] == "compact" and len(model) >= 2:
            cunit = f"c{n_compacts}"
            n_compacts += 1
            replaced = st_obj.compact(cunit)
            assert sorted(replaced) == sorted(model)
            merged = sorted(r for rows in model.values() for r in rows)
            model.clear()
            model[cunit] = merged
            pending_vacuum.extend(replaced)
        elif op[0] == "vacuum" and pending_vacuum:
            st_obj.vacuum(pending_vacuum)
            pending_vacuum.clear()

        assert st_obj.units() == sorted(model)
        if model:
            got = sorted(r.x for r in st_obj.load("a").collect())
            want = sorted(r for rows in model.values() for r in rows)
            assert got == want
