"""End-to-end golden parity on the reference's bundled 1000-person demo.

The committed goldens in examples/test/output were produced with the legacy
v1 rules file rules_14June2021.json (see reference tests/test_datetime.py).
We run the Spark pipeline on the same inputs+rules and diff every output
table with the reference's own order-insensitive comparison (sort rows,
strip auto-number ids, unmap person ids).

The v2.json rules are a richer mapping (adds person race) with no committed
goldens — covered by behavioural tests in test_carrot_semantics.py.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.carrot_compare import compare_table, person_unmap, read_tsv

EXAMPLES = Path("/root/reference/carrottransform/examples/test")
GOLDEN = EXAMPLES / "output"
TABLES = ["person", "observation", "measurement", "condition_occurrence"]


@pytest.fixture(scope="module")
def run_output(spark, tmp_path_factory):
    from carrot_transform_spark.pipeline import run_transform

    out = tmp_path_factory.mktemp("carrot_out_golden")
    run_transform(
        spark,
        rules_file=EXAMPLES / "rules" / "rules_14June2021.json",
        inputs=EXAMPLES / "inputs",
        output_dir=out,
        person_table="Demographics",
    )
    return out


@pytest.mark.parametrize("table", TABLES)
def test_golden_table(run_output, table):
    problems = compare_table(
        table,
        run_output / f"{table}.tsv",
        GOLDEN / f"{table}.tsv",
        run_output / "person_ids.tsv",
        GOLDEN / "person_ids.tsv",
    )
    assert not problems, "\n".join(problems)


def test_person_ids_dense(run_output):
    header, rows = read_tsv(run_output / "person_ids.tsv")
    assert header == ["SOURCE_SUBJECT", "TARGET_SUBJECT"]
    ids = sorted(int(r[1]) for r in rows)
    assert ids == list(range(1, len(ids) + 1))
    gold = person_unmap(GOLDEN / "person_ids.tsv")
    assert {r[0] for r in rows} == set(gold.values())


def test_summary_mapstream(run_output):
    """Summary rollup parity: same keys and counts as the golden summary."""
    h1, r1 = read_tsv(run_output / "summary_mapstream.tsv")
    h2, r2 = read_tsv(GOLDEN / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    missing = {k: v for k, v in gold.items() if ours.get(k) != v}
    extra = {k: v for k, v in ours.items() if k not in gold}
    assert not missing, f"missing/mismatched summary rows: {dict(list(missing.items())[:8])}"
    assert not extra, f"unexpected summary rows: {dict(list(extra.items())[:8])}"
