"""Golden parity across the reference's unit-fixture corpus.

Each fixture dir under /root/reference/tests/test_data holds input CSVs, a
(v1) rules JSON, and expected output TSVs produced by the reference engine.
We run the Spark pipeline on each and apply the order-insensitive diff,
including the person_ids density check and the summary rollup.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.carrot_compare import compare_table, read_tsv

DATA = Path("/root/reference/tests/test_data")

# fixture dir -> (rules file, person table, [output tables][, golden subdir])
FIXTURES = {
    "observe_smoking": ("mapping.json", "demos", ["person", "observation"]),
    # BOM-prefixed header + rows with blank birthdate (rejected persons)
    "only_m": ("v1-rules.json", "patients", ["person", "condition_occurrence"], "v1-out"),
    "duplications": (
        "transform-rules.json",
        "src_PERSON",
        ["person", "observation", "measurement"],
    ),
    "floats": ("rules.json", "src_PERSON", ["person", "measurement"]),
    "measure_weight_height": ("mapping.json", "persons", ["person", "measurement"]),
    "condition": (
        "mapping.json",
        "persons",
        ["person", "observation", "condition_occurrence"],
    ),
    "mapping_person": ("multi_mapping.json", "demos", ["person", "observation"]),
}


@pytest.fixture(scope="module", params=sorted(FIXTURES))
def fixture_run(request, spark, tmp_path_factory):
    from carrot_transform_spark.pipeline import run_transform

    name = request.param
    spec = FIXTURES[name]
    rules_file, person, tables = spec[0], spec[1], spec[2]
    golden = DATA / name / spec[3] if len(spec) > 3 else DATA / name
    out = tmp_path_factory.mktemp(f"fx_{name}")
    run_transform(
        spark,
        rules_file=DATA / name / rules_file,
        inputs=DATA / name,
        output_dir=out,
        person_table=person,
    )
    return name, out, tables, golden


def test_fixture_tables(fixture_run):
    name, out, tables, golden = fixture_run
    problems = []
    for table in tables:
        problems += compare_table(
            table,
            out / f"{table}.tsv",
            golden / f"{table}.tsv",
            out / "person_ids.tsv",
            golden / "person_ids.tsv",
        )
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_fixture_summary(fixture_run):
    name, out, _tables, golden = fixture_run
    golden_summary = golden / "summary_mapstream.tsv"
    if not golden_summary.exists():
        pytest.skip("no golden summary")
    h1, r1 = read_tsv(out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(golden_summary)
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    mismatched = {k: (gold[k], ours.get(k)) for k in gold if ours.get(k) != gold[k]}
    extra = {k: v for k, v in ours.items() if k not in gold}
    assert not mismatched, f"{name} summary mismatches: {dict(list(mismatched.items())[:8])}"
    assert not extra, f"{name} extra summary rows: {dict(list(extra.items())[:8])}"
