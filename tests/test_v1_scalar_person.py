"""v1 person SCALAR term mapping — pinned divergence fix (round 10).

The reference's process_rules appends a scalar term as 'dest~term' to the
field's plain LIST (mappingrules.py:412-418) and core.py applies list-kind
entries with NO valid-value check, so the literal lands even on a BLANK
cell; plain copies of a never-dict field apply per row too. We used to
route person scalars through the wildcard gate (valid cells only).

The corpus also re-pins two interacting quirks on the same rules:
  - the plain gender_source_value on the dict-mapped sex field rides only
    the dict's LAST value ('F') — stale-inputvalue attach — so M rows get
    an EMPTY gender_source_value;
  - a person row whose FIRST data column is blank emits nothing (the v1
    person build gate + run.py's person break).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

from tests.carrot_compare import compare_table, read_tsv
from tests.ref_runner import run_reference_mapstream

RULES = {
    "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": "sc"},
    "cdm": {
        "person": {
            "r1": {
                "person_id": {"source_table": "demo.csv", "source_field": "pid"},
                "birth_datetime": {"source_table": "demo.csv", "source_field": "dob"},
                "gender_concept_id": {
                    "source_table": "demo.csv",
                    "source_field": "sex",
                    "term_mapping": {"M": 8507, "F": 8532},
                },
                "gender_source_value": {"source_table": "demo.csv", "source_field": "sex"},
                "race_concept_id": {
                    "source_table": "demo.csv",
                    "source_field": "eth",
                    "term_mapping": 8527,
                },
                "race_source_value": {"source_table": "demo.csv", "source_field": "eth"},
            }
        }
    },
}

CSV = "pid,sex,dob,eth\np1,M,1990-01-02,\np2,,1991-02-03,e0\np3,F,1992-03-04,zz\n"


def test_v1_scalar_person_unconditional(spark, tmp_path):
    from carrot_transform_spark.pipeline import run_transform

    inputs = tmp_path / "inputs"
    inputs.mkdir()
    (inputs / "demo.csv").write_text(CSV)
    rules_file = tmp_path / "rules.json"
    rules_file.write_text(json.dumps(RULES, indent=1))

    ref_out = tmp_path / "ref"
    ref_out.mkdir()
    logging.disable(logging.WARNING)
    try:
        run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    finally:
        logging.disable(logging.NOTSET)

    our_out = tmp_path / "ours"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = compare_table(
        "person",
        our_out / "person.tsv",
        ref_out / "person.tsv",
        our_out / "person_ids.tsv",
        ref_out / "person_ids.tsv",
    )
    assert not problems, "\n".join(problems)

    # pin the quirky cells directly so this never silently relaxes:
    # blank-eth row still gets the scalar 8527; M row has EMPTY
    # gender_source_value (plain rides the dict's LAST value only);
    # blank-sex row emits nothing (first-datacol gate)
    hdr, rows = read_tsv(our_out / "person.tsv")
    col = {c: i for i, c in enumerate(hdr)}
    by_gci = {r[col["gender_concept_id"]]: r for r in rows}
    assert len(rows) == 2
    m_row, f_row = by_gci["8507"], by_gci["8532"]
    assert m_row[col["race_concept_id"]] == "8527"  # blank eth, term anyway
    assert m_row[col["gender_source_value"]] == ""
    assert f_row[col["gender_source_value"]] == "F"
    assert f_row[col["race_source_value"]] == "zz"
