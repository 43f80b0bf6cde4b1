"""Probe which rules shapes the reference's v1 (mapstream) and v2
(launch_v2) engines compute IDENTICALLY — the admissible set for the
cross-dialect differential fuzz (VERDICT r12 task 5).

For each candidate shape: build a v1 rules file + its mechanical v2
re-expression (tests/test_v2_reference_parity._v1_rules_to_v2), run BOTH
reference engines on the same inputs, diff the output tables
order-insensitively with person-id unmapping. Shapes that coincide go
into the paired generator; shapes that diverge are REAL dialect
differences to exclude (and document).

Usage: python scripts/probe_xdialect.py [shape ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.carrot_compare import compare_table, read_tsv  # noqa: E402
from tests.ref_runner import run_reference_mapstream  # noqa: E402
from tests.test_v2_reference_parity import _run_reference_v2, _v1_rules_to_v2  # noqa: E402


def _src(field, table="demo.csv", mapping=None):
    si = {"source_table": table, "source_field": field}
    if mapping is not None:
        si["term_mapping"] = mapping
    return si


def base_case(d: Path, shape: str) -> tuple[Path, Path]:
    inputs = d / "inputs"
    inputs.mkdir()
    person_rows = [
        ("p001", "M", "1990-01-02"),
        ("p002", "F", "1955-12-31"),
        ("p003", "M", "02/03/1991"),
        ("p004", "X", "1993-05-06 07:08:09"),
        ("p005", "F", "2001-06-07"),
    ]
    if shape == "dup_persons":
        person_rows.append(("p002", "M", "1990-01-02"))
    (inputs / "demo.csv").write_text(
        "pid,sex,dob\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )
    obs_rows = [
        ("p001", "1990-01-02", "v0", "1.5"),
        ("p002", "1991-02-03", "v1", "2.5"),
        ("p003", "garbage", "v2", "3.5"),
        ("p004", "2001-06-07", "v9", "4.5"),
        ("ghost", "2001-06-07", "v0", "5.5"),
        ("p005", "1993-05-06 07:08:09", "v1", ""),
    ]
    (inputs / "obs.csv").write_text(
        "pid,when,code,val\n" + "\n".join(",".join(r) for r in obs_rows) + "\n"
    )

    person_block = {
        "person_id": _src("pid"),
        "birth_datetime": _src("dob"),
        "gender_concept_id": _src("sex", mapping={"M": 8507, "F": 8532, "X": 9999}),
        "gender_source_value": _src("sex"),
    }
    obs_block = {
        "person_id": _src("pid", "obs.csv"),
        "observation_datetime": _src("when", "obs.csv"),
        "observation_concept_id": _src("code", "obs.csv",
                                       mapping={"v0": 9000, "v1": 9001, "v2": 9002}),
        "observation_source_value": _src("code", "obs.csv"),
    }
    if shape.startswith("i_"):
        # candidate INTERSECTION shapes: no person plain copies, standard
        # tables limited to scalar / single-value dict term maps
        del person_block["gender_source_value"]
        obs_block["observation_concept_id"]["term_mapping"] = {"v0": 9000}
    rules = {
        "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"probe_{shape}"},
        "cdm": {"person": {"all": person_block}, "observation": {"o1": obs_block}},
    }

    if shape == "value_as_number_crossfield":
        obs_block["value_as_number"] = _src("val", "obs.csv")
    elif shape == "partial_dict":
        obs_block["observation_concept_id"]["term_mapping"] = {"v0": 9000}
    elif shape == "scalar_map":
        obs_block["observation_concept_id"]["term_mapping"] = 9100
    elif shape == "two_person_rulesets":
        rules["cdm"]["person"] = {
            "male": {
                "person_id": _src("pid"),
                "birth_datetime": _src("dob"),
                "gender_concept_id": _src("sex", mapping={"M": 8507}),
                "gender_source_value": _src("sex"),
            },
            "female": {
                "person_id": _src("pid"),
                "birth_datetime": _src("dob"),
                "gender_concept_id": _src("sex", mapping={"F": 8532}),
                "gender_source_value": _src("sex"),
            },
        }
    elif shape == "multi_dest_dates":
        rules["cdm"]["condition_occurrence"] = {
            "c1": {
                "person_id": _src("pid", "obs.csv"),
                "condition_start_datetime": _src("when", "obs.csv"),
                "condition_end_datetime": _src("when", "obs.csv"),
                "condition_concept_id": _src("code", "obs.csv", mapping={"v1": 254761}),
                "condition_source_value": _src("code", "obs.csv"),
            }
        }
    elif shape == "date_only_dest":
        rules["cdm"]["condition_occurrence"] = {
            "c1": {
                "person_id": _src("pid", "obs.csv"),
                "condition_start_datetime": _src("when", "obs.csv"),
                "condition_start_date": _src("when", "obs.csv"),
                "condition_concept_id": _src("code", "obs.csv", mapping={"v1": 254761}),
            }
        }
    elif shape == "case_flip":
        obs_block["person_id"]["source_field"] = "PID"
        obs_block["observation_concept_id"]["source_field"] = "CODE"
    elif shape == "two_obs_blocks":
        rules["cdm"]["observation"]["o2"] = {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping=9300),
            "observation_source_value": _src("code", "obs.csv"),
        }
    elif shape == "demo_sourced_obs":
        rules["cdm"]["observation"]["o2"] = {
            "person_id": _src("pid"),
            "observation_datetime": _src("dob"),
            "observation_concept_id": _src("sex", mapping={"X": 9200}),
            "observation_source_value": _src("sex"),
        }
    elif shape == "source_concept_pair":
        obs_block["observation_source_concept_id"] = _src(
            "code", "obs.csv", mapping={"v0": 9000, "v1": 9001, "v2": 9002}
        )
    elif shape == "i_scalar":
        obs_block["observation_concept_id"]["term_mapping"] = 9100
    elif shape == "i_two_single_dicts":
        rules["cdm"]["observation"]["o2"] = {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping={"v1": 9001}),
            "observation_source_value": _src("code", "obs.csv"),
        }
    elif shape == "i_source_concept_pair":
        obs_block["observation_source_concept_id"] = _src(
            "code", "obs.csv", mapping={"v0": 9000}
        )
    elif shape == "i_no_source_value":
        del obs_block["observation_source_value"]
    elif shape == "i_condition_single_date":
        rules["cdm"]["condition_occurrence"] = {
            "c1": {
                "person_id": _src("pid", "obs.csv"),
                "condition_start_datetime": _src("when", "obs.csv"),
                "condition_concept_id": _src("code", "obs.csv", mapping={"v1": 254761}),
                "condition_source_value": _src("code", "obs.csv"),
            }
        }
    elif shape == "i_demo_obs":
        rules["cdm"]["observation"]["o2"] = {
            "person_id": _src("pid"),
            "observation_datetime": _src("dob"),
            "observation_concept_id": _src("sex", mapping={"X": 9200}),
            "observation_source_value": _src("sex"),
        }
    elif shape == "i_case_flip":
        obs_block["person_id"]["source_field"] = "PID"
        obs_block["observation_concept_id"]["source_field"] = "CODE"
        obs_block["observation_source_value"]["source_field"] = "CODE"
    elif shape == "i_person_scalar":
        person_block["gender_concept_id"]["term_mapping"] = 8507
    elif shape == "i_person_single_dict":
        person_block["gender_concept_id"]["term_mapping"] = {"M": 8507}
    elif shape == "i_value_as_string_same_field":
        obs_block["value_as_string"] = _src("code", "obs.csv")
    elif shape == "i_dup_value_blocks":
        rules["cdm"]["observation"]["o2"] = {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping={"v0": 9003}),
            "observation_source_value": _src("code", "obs.csv"),
        }
    elif shape == "i_empty_value_dict":
        obs_block["observation_concept_id"]["term_mapping"] = {"": 9009}
    elif shape == "i_unmatched_value_dict":
        obs_block["observation_concept_id"]["term_mapping"] = {"zz": 9008}

    rules_file = d / "rules_v1.json"
    rules_file.write_text(json.dumps(rules, indent=1))
    return rules_file, inputs


TABLES = ["person", "observation", "condition_occurrence"]

SHAPES = [
    "base", "dup_persons", "value_as_number_crossfield", "partial_dict",
    "scalar_map", "two_person_rulesets", "multi_dest_dates", "date_only_dest",
    "case_flip", "two_obs_blocks", "demo_sourced_obs", "source_concept_pair",
    "i_base", "i_scalar", "i_two_single_dicts", "i_source_concept_pair",
    "i_no_source_value", "i_condition_single_date", "i_demo_obs",
    "i_case_flip", "i_person_scalar", "i_person_single_dict",
    "i_value_as_string_same_field",
]


def probe(shape: str) -> str:
    d = Path(tempfile.mkdtemp(prefix=f"xd_{shape}_"))
    try:
        rules_v1, inputs = base_case(d, shape)
        rules_v2 = d / "rules_v2.json"
        rules_v2.write_text(
            json.dumps(_v1_rules_to_v2(json.loads(rules_v1.read_text())), indent=1)
        )
        o1, o2 = d / "out_v1", d / "out_v2"
        o1.mkdir(), o2.mkdir()
        run_reference_mapstream(rules_v1, inputs, o1, "demo")
        _run_reference_v2(rules_v2, inputs, o2, "demo")
        problems = []
        for t in TABLES:
            e1, e2 = (o1 / f"{t}.tsv").exists(), (o2 / f"{t}.tsv").exists()
            if e1 != e2:
                problems.append(f"{t}: emitted v1={e1} v2={e2}")
                continue
            if not e1:
                continue
            problems += compare_table(
                t, o2 / f"{t}.tsv", o1 / f"{t}.tsv",
                o2 / "person_ids.tsv", o1 / "person_ids.tsv",
            )
        if problems:
            return f"DIVERGES ({len(problems)}): " + " | ".join(problems[:4])
        return "coincide"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    shapes = sys.argv[1:] or SHAPES
    for s in shapes:
        try:
            r = probe(s)
        except Exception as e:  # noqa: BLE001
            r = f"ERROR: {type(e).__name__}: {str(e)[:300]}"
        print(f"{s:32s} {r}", flush=True)


if __name__ == "__main__":
    main()
