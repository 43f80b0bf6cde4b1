"""Registry layout invariants: the driver's CORRECTNESS report is a bounded
window over registration order, so the layout is load-bearing — these tests
fail loudly if an edit silently pushes a query out of the window."""

from __future__ import annotations

from carrot_transform_spark.queries import all_queries

MAX_ENTRIES = 50  # observed driver window size (CORRECTNESS_r01 held exactly 50)


def test_registry_fits_driver_window():
    qs = all_queries()
    assert len(qs) <= MAX_ENTRIES, (
        f"{len(qs)} registered entries exceed the driver's {MAX_ENTRIES}-entry "
        "CORRECTNESS window — fold the extras into a checksum suite"
    )


def test_tpch_registers_first():
    names = list(all_queries())
    assert names[0] == "q1_pricing_summary"
    tpch = [n for n in names if n.startswith("q") and n[1].isdigit()]
    assert len(tpch) == 22, f"expected all 22 TPC-H shapes, got {len(tpch)}"


def test_no_oracle_entries_register_last():
    qs = all_queries()
    names = list(qs)
    without = [n for n in names if qs[n].oracle is None]
    assert names[-len(without):] == without, (
        "rows-only (no-oracle) entries must register last so a shrunken "
        f"driver window drops them first: {without}"
    )


def test_every_oracle_column_layout():
    """Spot structural guarantees the driver compare relies on: oracle SQL
    exists for everything except the declared rows-only entries."""
    qs = all_queries()
    rows_only = {n for n, q in qs.items() if q.oracle is None}
    assert rows_only == {"mm_pipeline", "sketch_approx_distinct"}
