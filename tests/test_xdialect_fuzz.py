"""Cross-dialect (v1 <-> v2) differential fuzz — VERDICT r12 task 5.

Generates rules confined to the PROBED v1/v2 semantic intersection and
asserts FOUR-way agreement per seed: our v1 == reference mapstream,
our v2 == reference launch_v2, and our v1 == our v2 — catching IR-level
asymmetries the per-dialect marathons can't see (each dialect could be
self-consistently wrong).

The admissible set was established empirically with
scripts/probe_xdialect.py (every shape run through BOTH reference
engines; "coincide" = order-insensitive table equality with person-id
unmapping). Real dialect differences EXCLUDED from the generator, each
probe-confirmed:

- multi-entry dict term maps on standard tables: v1 keys the whole
  block under the LAST dict value (reference mappingrules.py:392-401 —
  term_value_key is overwritten per value), so only rows matching that
  value emit; v2 matches every value. Single-value dicts and scalars
  coincide (scalar -> v1 plain_key / v2 '*' wildcard).
- person plain-copy dests (gender_source_value): v1 leaves them blank,
  v2 fills them.
- partial person dicts: v1 emits unmatched persons with concept 0,
  v2 drops them — full-coverage dicts and scalars coincide.
- duplicate person rows: v1 bucket model vs v2 first-wins.
- multi-dest date mappings (start+end): v1's final-entry companion
  quirk leaves condition_start_date blank; v2 fills both — single
  datetime dests coincide.
- cross-field plain copies (value_as_number from another field): the
  v2 standard builder's emit asymmetry drops them.

Confirmed coinciding (all generated here): scalar maps, single-value
dicts (incl. empty-string and unmatched values), same-field
source_value / value_as_string copies, source_concept_id pairs,
multiple blocks (distinct or DUPLICATE values — v1 key collision
appends, v2 concept lists zip), demographics-sourced fan-out blocks,
case-flipped field names, ghost persons, invalid dates, condition
tables with a single datetime dest.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest

from tests.carrot_compare import compare_table
from tests.ref_runner import run_reference_mapstream
from tests.test_v2_reference_parity import _run_reference_v2, _v1_rules_to_v2

_SEXES = ["M", "F", "X", ""]
_DATES = [
    "1990-01-02", "1955-12-31", "02/03/1991", "1993-05-06 07:08:09",
    "2001-06-07", "garbage", "", "31/11/2000", "2001-02-30", "1990-1-2",
]
_CODES = ["v0", "v1", "v2", "v3", "zz", ""]
_VALS = ["1", "2.5", "-3", "", "17.25", "x"]
_TABLES = ["person", "observation", "condition_occurrence"]


def _src(field, table="demo.csv", mapping=None):
    si = {"source_table": table, "source_field": field}
    if mapping is not None:
        si["term_mapping"] = mapping
    return si


def _gen_xcase(seed: int, d: Path) -> tuple[Path, Path]:
    """One intersection-shape case: returns (v1_rules_file, inputs_dir);
    the v2 twin is the mechanical _v1_rules_to_v2 conversion."""
    rng = random.Random(77_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()

    pids = [f"p{i:03d}" for i in range(rng.randint(5, 20))]
    person_rows = [
        (p, rng.choice(_SEXES), rng.choice(_DATES)) for p in pids
    ]  # UNIQUE pids only: dup-person semantics differ by dialect
    (inputs / "demo.csv").write_text(
        "pid,sex,dob\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )
    obs_rows = [
        (
            rng.choice(pids + ["ghost1", "ghost2"]),
            rng.choice(_DATES),
            rng.choice(_CODES),
            rng.choice(_VALS),
        )
        for _ in range(rng.randint(8, 40))
    ]
    (inputs / "obs.csv").write_text(
        "pid,when,code,val\n" + "\n".join(",".join(r) for r in obs_rows) + "\n"
    )

    # person: full-coverage dict (every sex value mapped) or scalar
    if rng.random() < 0.3:
        gmap = 8000 + rng.randint(0, 99)
    else:
        gmap = {s: 8500 + i * 7 + rng.randint(0, 3) for i, s in enumerate(_SEXES)}
    rules = {
        "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"x{seed}"},
        "cdm": {
            "person": {
                "all": {
                    "person_id": _src("pid"),
                    "birth_datetime": _src("dob"),
                    "gender_concept_id": _src("sex", mapping=gmap),
                }
            },
            "observation": {},
        },
    }

    # The v2 format holds ONE mapping per (target, source table), so the
    # v1->v2 conversion MERGES all of a target's blocks: mixed scalar+dict
    # kinds trigger v2's exact-beats-wildcard where v1 emits both, and
    # differing same-field copy sets get unioned onto every concept
    # (seeds 6/13/18 of the first marathon, all three probe-confirmed real
    # dialect differences). Intersection constraint: per (target, source),
    # ONE term-map kind and ONE copy set, uniform across blocks.
    scalar_kind = rng.random() < 0.4
    with_sv = rng.random() < 0.7
    with_scp = rng.random() < 0.4
    with_vas = rng.random() < 0.3

    def obs_block(i: int) -> dict:
        flip = rng.random() < 0.2
        code_f = "CODE" if flip else "code"
        if scalar_kind:
            tm = 9100 + i * 10
        else:
            tm = {rng.choice(_CODES): 9000 + i * 10}  # single-value dict
        b = {
            "person_id": _src("PID" if flip else "pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src(code_f, "obs.csv", mapping=tm),
        }
        if with_sv:
            b["observation_source_value"] = _src(code_f, "obs.csv")
        if with_scp:
            b["observation_source_concept_id"] = _src(code_f, "obs.csv", mapping=tm)
        if with_vas:
            b["value_as_string"] = _src(code_f, "obs.csv")
        return b

    for i in range(rng.randint(1, 3)):
        rules["cdm"]["observation"][f"o{i}"] = obs_block(i)
    if rng.random() < 0.4:  # demographics-sourced fan-out
        rules["cdm"]["observation"]["odemo"] = {
            "person_id": _src("pid"),
            "observation_datetime": _src("dob"),
            "observation_concept_id": _src(
                "sex", mapping={rng.choice(_SEXES): 9200}
            ),
            "observation_source_value": _src("sex"),
        }
    if rng.random() < 0.5:  # condition with a SINGLE datetime dest
        tm = {rng.choice(_CODES): 254000 + rng.randint(0, 99)}
        rules["cdm"]["condition_occurrence"] = {
            "c0": {
                "person_id": _src("pid", "obs.csv"),
                "condition_start_datetime": _src("when", "obs.csv"),
                "condition_concept_id": _src("code", "obs.csv", mapping=tm),
                "condition_source_value": _src("code", "obs.csv"),
            }
        }

    rules_file = d / "rules_v1.json"
    rules_file.write_text(json.dumps(rules, indent=1))
    return rules_file, inputs


def _compare_dirs(tag: str, ours: Path, golden: Path) -> list[str]:
    problems = []
    for t in _TABLES:
        e1, e2 = (ours / f"{t}.tsv").exists(), (golden / f"{t}.tsv").exists()
        if e1 != e2:
            problems.append(f"[{tag}] {t}: emitted ours={e1} golden={e2}")
            continue
        if not e1:
            continue
        problems += [
            f"[{tag}] {p}"
            for p in compare_table(
                t, ours / f"{t}.tsv", golden / f"{t}.tsv",
                ours / "person_ids.tsv", golden / "person_ids.tsv",
            )
        ]
    return problems


def run_xdialect_seed(spark, tmp_path: Path, seed: int) -> None:
    """One 4-way seed: our-v1==ref-v1, our-v2==ref-v2, our-v1==our-v2."""
    from carrot_transform_spark.pipeline import run_transform

    rules_v1, inputs = _gen_xcase(seed, tmp_path)
    rules_v2 = tmp_path / "rules_v2.json"
    rules_v2.write_text(
        json.dumps(_v1_rules_to_v2(json.loads(rules_v1.read_text())), indent=1)
    )

    ref1, ref2 = tmp_path / "ref_v1", tmp_path / "ref_v2"
    ref1.mkdir(), ref2.mkdir()
    run_reference_mapstream(rules_v1, inputs, ref1, "demo")
    _run_reference_v2(rules_v2, inputs, ref2, "demo")

    our1, our2 = tmp_path / "our_v1", tmp_path / "our_v2"
    run_transform(spark, rules_file=rules_v1, inputs=inputs, output_dir=our1,
                  person_table="demo")
    run_transform(spark, rules_file=rules_v2, inputs=inputs, output_dir=our2,
                  person_table="demo")

    problems = (
        _compare_dirs("ours-v1 vs ref-v1", our1, ref1)
        + _compare_dirs("ours-v2 vs ref-v2", our2, ref2)
        + _compare_dirs("ours-v1 vs ours-v2 (cross-dialect)", our1, our2)
    )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])


@pytest.mark.parametrize("seed", range(6))
def test_xdialect_seed(spark, tmp_path, seed):
    run_xdialect_seed(spark, tmp_path, seed)
