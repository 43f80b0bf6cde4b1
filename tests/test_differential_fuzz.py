"""Differential fuzz: random rules + CSVs through the REFERENCE engine
(imported in-process via tests/ref_runner.py; reproduces its own goldens
byte-for-byte under the shims) and through this engine, outputs diffed with
the reference's own order-insensitive comparison. The 7 golden corpora pin
real-world shapes; the fuzz adds adversarial ones — duplicate persons,
missing person references, unmapped/blank terms, scalar AND dict term maps,
the date-format zoo (valid, dd/mm/yyyy, datetime-bearing, garbage, blank,
out-of-range), numeric values — under fresh random combinations per seed.

Every case is deterministic in its seed: a failure reproduces exactly.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pytest

from tests.carrot_compare import compare_table
from tests.ref_runner import run_reference_mapstream

_DATES = [
    "1990-01-02",
    "1955-12-31",
    "02/03/1991",
    "31/01/1987",
    "1993-05-06 07:08:09",
    "2001-06-07",
    "garbage",
    "",
    "31/11/2000",  # invalid day for month
    "2001-02-30",  # invalid
    "1990-1-2",
    "1993-05-06 07:08:09 tz",  # 3 tokens: time is FORFEITED (2==len split)
]
_SEXES = ["M", "F", "X", ""]
_CODES = ["v0", "v1", "v2", "v3", "zz", ""]
_VALS = ["1", "2.5", "-3", "", "17.25", "x"]


def _src(field, table="demo.csv", mapping=None):
    d = {"source_table": table, "source_field": field}
    if mapping is not None:
        d["term_mapping"] = mapping
    return d


def _gen_case(seed: int, d: Path) -> tuple[Path, Path]:
    rng = random.Random(seed)
    inputs = d / "inputs"
    inputs.mkdir()

    n_person = rng.randint(6, 25)
    pids = [f"p{i:03d}" for i in range(n_person)]
    person_rows = []
    for p in pids:
        person_rows.append((p, rng.choice(_SEXES), rng.choice(_DATES)))
    # duplicate person rows (first-wins dedup) and an id colliding later
    for _ in range(rng.randint(0, 4)):
        p = rng.choice(pids)
        person_rows.append((p, rng.choice(_SEXES), rng.choice(_DATES)))
    (inputs / "demo.csv").write_text(
        "pid,sex,dob\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )

    obs_rows = []
    for i in range(rng.randint(10, 60)):
        pid = rng.choice(pids + ["ghost1", "ghost2"])  # missing-person refs
        obs_rows.append(
            (pid, rng.choice(_DATES), rng.choice(_CODES), rng.choice(_VALS))
        )
    (inputs / "obs.csv").write_text(
        "pid,when,code,val\n" + "\n".join(",".join(r) for r in obs_rows) + "\n"
    )

    # rules: person (two gender rule-sets), observation (scalar + dict term
    # maps, value_as_number, a demographics-sourced block), condition.
    # Odd seeds add a SECOND scalar block on the same trigger field with a
    # different companion shape — two records per row for that field, which
    # exercises the non-mergeable multi-block path (synthetic CM keys).
    code_map = {c: 9000 + i for i, c in enumerate(["v0", "v1", "v2"])}
    rules = {
        "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"fuzz{seed}"},
        "cdm": {
            "person": {
                "male": {
                    "person_id": _src("pid"),
                    "birth_datetime": _src("dob"),
                    "gender_concept_id": _src("sex", mapping={"M": 8507}),
                    "gender_source_concept_id": _src("sex", mapping={"M": 8507}),
                    "gender_source_value": _src("sex"),
                },
                "female": {
                    "person_id": _src("pid"),
                    "birth_datetime": _src("dob"),
                    "gender_concept_id": _src("sex", mapping={"F": 8532}),
                    "gender_source_concept_id": _src("sex", mapping={"F": 8532}),
                    "gender_source_value": _src("sex"),
                },
            },
            "observation": {
                "obs_scalar": {
                    "person_id": _src("pid", "obs.csv"),
                    "observation_datetime": _src("when", "obs.csv"),
                    "observation_concept_id": _src("code", "obs.csv", mapping=9100),
                    "observation_source_concept_id": _src(
                        "code", "obs.csv", mapping=9100
                    ),
                    "observation_source_value": _src("code", "obs.csv"),
                    "value_as_number": _src("val", "obs.csv"),
                },
                "obs_dict": {
                    "person_id": _src("pid", "obs.csv"),
                    "observation_datetime": _src("when", "obs.csv"),
                    "observation_concept_id": _src("code", "obs.csv", mapping=code_map),
                    "observation_source_concept_id": _src(
                        "code", "obs.csv", mapping=code_map
                    ),
                    "observation_source_value": _src("code", "obs.csv"),
                },
                "obs_demo": {
                    "person_id": _src("pid"),
                    "observation_datetime": _src("dob"),
                    "observation_concept_id": _src("sex", mapping={"X": 9200}),
                    "observation_source_concept_id": _src("sex", mapping={"X": 9200}),
                    "observation_source_value": _src("sex"),
                },
            },
            "condition_occurrence": {
                "cond_0": {
                    "person_id": _src("pid", "obs.csv"),
                    "condition_start_datetime": _src("when", "obs.csv"),
                    "condition_end_datetime": _src("when", "obs.csv"),
                    "condition_concept_id": _src(
                        "code", "obs.csv", mapping={"v1": 254761, "v3": 254762}
                    ),
                    "condition_source_concept_id": _src(
                        "code", "obs.csv", mapping={"v1": 254761, "v3": 254762}
                    ),
                    "condition_source_value": _src("code", "obs.csv"),
                },
            },
        },
    }
    if seed % 3 == 0:
        # overlapping person rule-set: maps "M" AGAIN to a different concept
        # — the reference merges person blocks field-wise and the record
        # write makes the LATER entry win (v1 per-row person semantics:
        # overwrite, not combination explosion)
        rules["cdm"]["person"]["male_again"] = {
            "person_id": _src("pid"),
            "birth_datetime": _src("dob"),
            "gender_concept_id": _src("sex", mapping={"M": 8599}),
            "gender_source_concept_id": _src("sex", mapping={"M": 8599}),
            "gender_source_value": _src("sex"),
        }
    if seed % 2 == 1:
        rules["cdm"]["observation"]["obs_scalar2"] = {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping=9300),
            "observation_source_value": _src("code", "obs.csv"),
            "value_as_string": _src("val", "obs.csv"),
        }
    rules_file = d / "rules.json"
    rules_file.write_text(json.dumps(rules, indent=1))
    return rules_file, inputs


_TABLES = ["person", "observation", "condition_occurrence"]


def _gen_case_hetero_dates(seed: int, d: Path) -> tuple[Path, Path]:
    """v1 rules where DIFFERENT TARGETS read different date columns of the
    same file. The reference normalises and row-gates on ONE main datetime
    column — for v1 the LAST datetime-dest source field in (target, block)
    iteration order (mappingrules.py:237-262) — and every other target's
    date dests receive the RAW cell (run.py:230-235 mutates only the main
    column in place). Target order is shuffled per seed so the main column
    flips between 'when' and 'when2'."""
    rng = random.Random(555_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(5, 15))]
    person_rows = [(p, rng.choice(_SEXES), rng.choice(_DATES)) for p in pids]
    (inputs / "demo.csv").write_text(
        "pid,sex,dob\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )
    obs_rows = [
        (
            rng.choice(pids + ["ghost1"]),
            rng.choice(_DATES),
            rng.choice(_DATES),
            rng.choice(_CODES),
            rng.choice(_VALS),
        )
        for _ in range(rng.randint(10, 40))
    ]
    (inputs / "obs.csv").write_text(
        "pid,when,when2,code,val\n" + "\n".join(",".join(r) for r in obs_rows) + "\n"
    )

    observation = {
        "obs_0": {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src("when", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping={"v0": 9000, "v1": 9001}),
            "observation_source_concept_id": _src(
                "code", "obs.csv", mapping={"v0": 9000, "v1": 9001}
            ),
            "observation_source_value": _src("code", "obs.csv"),
            "value_as_number": _src("val", "obs.csv"),
        }
    }
    condition = {
        "cond_0": {
            "person_id": _src("pid", "obs.csv"),
            "condition_start_datetime": _src("when2", "obs.csv"),
            "condition_end_datetime": _src("when2", "obs.csv"),
            "condition_concept_id": _src("code", "obs.csv", mapping={"v1": 254761, "v2": 254762}),
            "condition_source_concept_id": _src(
                "code", "obs.csv", mapping={"v1": 254761, "v2": 254762}
            ),
            "condition_source_value": _src("code", "obs.csv"),
        }
    }
    cdm = {
        "person": {
            "p_rules": {
                "person_id": _src("pid"),
                "birth_datetime": _src("dob"),
                "gender_concept_id": _src("sex", mapping={"M": 8507, "F": 8532}),
                "gender_source_concept_id": _src("sex", mapping={"M": 8507, "F": 8532}),
                "gender_source_value": _src("sex"),
            }
        }
    }
    others = [("observation", observation), ("condition_occurrence", condition)]
    rng.shuffle(others)  # flips which target is LAST -> which column is main
    for name, block in others:
        cdm[name] = block

    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"hd{seed}"},
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


def _gen_case_person_ruleset_redef(seed: int, d: Path) -> tuple[Path, Path]:
    """v1 person rules where a LATER rule-set redefines a source field an
    EARLIER rule-set already mapped. The reference's person merge
    (mappingrules.py:331-341) dict.update()s only when the existing entry is
    a dict; a list-kind entry is wholesale-REPLACED ('just set it'), so the
    earlier rule-set's plain dests and scalar terms are dropped. Shapes:
    list->list replace, list->dict replace, dict->dict value-level merge
    (control) with an independent list->scalar-term replace on a second
    field. (dict->list is unrunnable in the reference — dict.update over
    >2-char strings raises ValueError — so it is never generated.)"""
    rng = random.Random(777_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(6, 18))]
    eths = ["e0", "e1", "zz", ""]
    person_rows = [
        (p, rng.choice(_SEXES), rng.choice(eths), rng.choice(_DATES)) for p in pids
    ]
    for _ in range(rng.randint(0, 3)):  # duplicate persons
        p = rng.choice(pids)
        person_rows.append((p, rng.choice(_SEXES), rng.choice(eths), rng.choice(_DATES)))
    (inputs / "demo.csv").write_text(
        "pid,sex,eth,dob\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )

    base = {"person_id": _src("pid"), "birth_datetime": _src("dob")}
    shape = seed % 5
    if shape == 3:
        # scalar bucket WITHOUT a date mapping, created FIRST so its key
        # field is the first datacol: its record skips core.py's date
        # handling entirely — written even when the dict bucket's record is
        # strict-date-rejected — with blank birth fields
        alpha = {
            "person_id": _src("pid"),
            "gender_concept_id": _src("sex", mapping=8507),
        }
        beta = dict(
            base,
            gender_concept_id=_src("sex", mapping={"M": 8507, "F": 8532}),
            gender_source_value=_src("sex"),
        )
    elif shape == 4:
        # scalar bucket WITHOUT a person-id mapping: its record carries a
        # blank person id, fails the person lookup, and counts
        # invalid_person_ids — while the dict bucket's record is written
        alpha = {
            "birth_datetime": _src("dob"),
            "race_concept_id": _src("eth", mapping=38003599),
        }
        beta = dict(
            base,
            gender_concept_id=_src("sex", mapping={"M": 8507, "F": 8532}),
        )
    elif shape == 0:
        # list -> list: beta's single plain dest replaces alpha's plain AND
        # scalar term on 'sex'
        alpha = dict(
            base,
            gender_source_value=_src("sex"),
            gender_concept_id=_src("sex", mapping=8507),
        )
        beta = dict(base, person_source_value=_src("sex"))
    elif shape == 1:
        # list -> dict: beta's dict term map replaces alpha's plains/lits
        alpha = dict(
            base,
            gender_source_value=_src("sex"),
            gender_source_concept_id=_src("sex", mapping=8599),
        )
        beta = dict(
            base,
            gender_concept_id=_src("sex", mapping={"M": 8507, "F": 8532}),
            gender_source_concept_id=_src("sex", mapping={"M": 8507, "F": 8532}),
        )
    else:
        # dict -> dict control on 'sex' (value-level merge must KEEP working)
        # + list -> scalar-term replace on 'eth'
        alpha = dict(
            base,
            gender_concept_id=_src("sex", mapping={"M": 8507}),
            gender_source_value=_src("sex"),
            race_source_value=_src("eth"),
        )
        beta = dict(
            base,
            gender_concept_id=_src("sex", mapping={"F": 8532, "M": 8599}),
            race_concept_id=_src("eth", mapping=38003599),
        )
    cdm = {"person": {"alpha": alpha, "beta": beta}}
    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"rr{seed}"},
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


def _gen_case_person_soup(seed: int, d: Path) -> tuple[Path, Path]:
    """Randomized multi-rule-set v1 person rules: 2-5 rule-sets over three
    term fields, each drawing per-field kinds (dict / scalar / plain /
    absent) and per-rule-set pid/dob presence, exercising every bucket
    interaction the fixed shapes pin individually. Two reference-crash
    shapes are avoided (they cannot run there): a plain rule on a field
    dict-mapped earlier in the SAME rule-set (stale-inputvalue KeyError
    unless values align), and a list-kind redefinition of a field already
    dict-kind in the SAME bucket (dict.update(list) ValueError)."""
    rng = random.Random(888_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(6, 20))]
    fields = {
        "sex": ["M", "F", "X", ""],
        "eth": ["e0", "e1", "zz", ""],
        "smk": ["s0", "s1", ""],
    }
    person_rows = [
        (
            p,
            rng.choice(fields["sex"]),
            rng.choice(fields["eth"]),
            rng.choice(fields["smk"]),
            rng.choice(_DATES),
        )
        for p in pids
    ]
    for _ in range(rng.randint(0, 3)):
        p = rng.choice(pids)
        person_rows.append(
            (
                p,
                rng.choice(fields["sex"]),
                rng.choice(fields["eth"]),
                rng.choice(fields["smk"]),
                rng.choice(_DATES),
            )
        )
    # second id and date columns: rule-sets may draw person_id/date sources
    # from either (lookup = raw last-wins incl. dropped; main datetime =
    # outdata scan last-wins; records/gates = per-bucket)
    person_rows = [
        r[:1]
        + (rng.choice([r[0], f"q{i:03d}", ""]),)
        + r[1:]
        + (rng.choice(_DATES),)
        for i, r in enumerate(person_rows)
    ]
    (inputs / "demo.csv").write_text(
        "pid,pid2,sex,eth,smk,dob,dob2\n"
        + "\n".join(",".join(r) for r in person_rows)
        + "\n"
    )

    dest_pool = [
        "gender_concept_id",
        "gender_source_concept_id",
        "race_concept_id",
        "race_source_concept_id",
        "ethnicity_concept_id",
        "location_id",
        "provider_id",
        "care_site_id",
    ]
    plain_pool = [
        "gender_source_value",
        "race_source_value",
        "ethnicity_source_value",
        "person_source_value",
    ]
    # per-bucket simulated field kinds, to avoid the cross-rule-set
    # dict.update(list) reference crash: bucket key -> {field: kind}
    bucket_kinds: dict[object, dict[str, str]] = {}
    cdm_person: dict[str, dict] = {}
    next_term = [9500]

    def draw_ruleset(i: int) -> dict | None:
        rs: dict[str, dict] = {}
        if rng.random() < 0.85:
            rs["person_id"] = _src("pid" if rng.random() < 0.75 else "pid2")
        if rng.random() < 0.85:
            rs["birth_datetime"] = _src("dob" if rng.random() < 0.75 else "dob2")
        chosen_fields = rng.sample(list(fields), rng.randint(1, 3))
        kinds = {}
        for f in chosen_fields:
            kinds[f] = rng.choice(["dict", "scalar", "plain"])
        has_dict = "dict" in kinds.values()
        has_scalar = "scalar" in kinds.values()
        if has_dict:
            bkey = None
        elif has_scalar:
            bkey = [f for f in chosen_fields if kinds[f] == "scalar"][-1]
        else:
            bkey = "dropped"
        if bkey != "dropped":
            sim = bucket_kinds.setdefault(bkey, {})
            for f, k in list(kinds.items()):
                prior = sim.get(f)
                if prior == "dict" and k != "dict":
                    kinds[f] = "dict"  # avoid dict.update(list) crash
            for f, k in kinds.items():
                sim[f] = "dict" if (k == "dict" or sim.get(f) == "dict") else "list"
        # emit rules: plains first (stale-attach shapes avoided), then
        # scalars, then dicts
        order = sorted(kinds, key=lambda f: {"plain": 0, "scalar": 1, "dict": 2}[kinds[f]])
        used_dests: set[str] = set(rs)
        for f in order:
            k = kinds[f]
            if k == "plain":
                cands = [p for p in plain_pool if p not in used_dests]
                if not cands:
                    continue
                dst = rng.choice(cands)
                used_dests.add(dst)
                rs[dst] = _src(f)
            elif k == "scalar":
                cands = [p for p in dest_pool if p not in used_dests]
                if not cands:
                    continue
                dst = rng.choice(cands)
                used_dests.add(dst)
                next_term[0] += 1
                rs[dst] = _src(f, mapping=next_term[0])
            else:
                vals = rng.sample(
                    [v for v in fields[f] if v], rng.randint(1, len(fields[f]) - 1)
                )
                if rng.random() < 0.2:
                    # ''-keyed dict entry: bare-equality person matching
                    # means blank cells DO match it (core.py:80)
                    vals.append("")
                n_dests = rng.randint(1, 2)
                cands = [p for p in dest_pool if p not in used_dests]
                for dst in rng.sample(cands, min(n_dests, len(cands))):
                    used_dests.add(dst)
                    next_term[0] += 1
                    rs[dst] = _src(f, mapping={v: next_term[0] + j for j, v in enumerate(vals)})
        return rs

    n_sets = rng.randint(2, 5)
    for i in range(n_sets):
        cdm_person[f"rs{i}"] = draw_ruleset(i)
    # guarantee at least one SURVIVING rule-set with pid+dob+a dict term so
    # the case is runnable (person lookup + main datetime need a source)
    cdm_person["rs_anchor"] = {
        "person_id": _src("pid"),
        "birth_datetime": _src("dob"),
        "gender_concept_id": _src("sex", mapping={"M": 8507, "F": 8532}),
    }
    # anchor merges into the dict bucket LAST; mark its fields dict-kind
    sim = bucket_kinds.setdefault(None, {})
    sim["sex"] = "dict"

    # (person rules sourced from a second file are NOT generated: both
    # engines reject them at validation — reference run.py:101 'Person
    # properties ... can only come from the person file', mirrored in
    # rules/validation.py — so the shape is unrunnable by design)
    cdm = {
        "person": cdm_person,
        "observation": {
            "obs_demo": {
                "person_id": _src("pid"),
                "observation_datetime": _src("dob"),
                "observation_concept_id": _src("smk", mapping={"s0": 9600, "s1": 9601}),
                "observation_source_concept_id": _src("smk", mapping={"s0": 9600, "s1": 9601}),
                "observation_source_value": _src("smk"),
            }
        },
    }
    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"soup{seed}"},
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


@pytest.mark.parametrize("seed", list(range(8)) + [422])
def test_differential_person_soup(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_person_soup(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = []
    for table in ("person", "observation"):
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


@pytest.mark.parametrize("seed", range(10))
def test_differential_person_ruleset_redef(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_person_ruleset_redef(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
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
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


@pytest.mark.parametrize("seed", range(6))
def test_differential_hetero_dates(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_hetero_dates(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = []
    for table in _TABLES:
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


@pytest.mark.parametrize("seed", range(6))
def test_differential_case(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")

    our_out = tmp_path / "our_out"
    run_transform(
        spark,
        rules_file=rules_file,
        inputs=inputs,
        output_dir=our_out,
        person_table="demo",
    )

    problems = []
    for table in _TABLES:
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    # the metric rollup must agree too — blank/invalid-date/person-reject
    # counters under adversarial inputs (round 9 caught two counter classes
    # here: companion datacols' blank counts and the ungated v1 person
    # component-date count)
    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {k: (gold.get(k), ours.get(k)) for k in set(gold) | set(ours) if gold.get(k) != ours.get(k)}
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


@pytest.mark.parametrize("seed", range(3))
def test_differential_use_input_person_ids(spark, tmp_path, seed):
    """--use-input-person-ids Y: person ids pass through un-renumbered
    (person_helpers.read_person_ids:141-149) — the whole W2 surface with
    the anonymisation join made an identity map."""
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo", use_input_person_ids=True)
    our_out = tmp_path / "our_out"
    run_transform(
        spark,
        rules_file=rules_file,
        inputs=inputs,
        output_dir=our_out,
        person_table="demo",
        use_input_person_ids=True,
    )
    problems = []
    for table in _TABLES:
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "person_ids.tsv")
    h2, r2 = read_tsv(ref_out / "person_ids.tsv")
    assert h1 == h2 and sorted(map(tuple, r1)) == sorted(map(tuple, r2))


@pytest.mark.parametrize("seed", range(3))
def test_differential_last_used_ids(spark, tmp_path, seed):
    """--last-used-ids-file: auto-number ids continue from per-table
    offsets (person_helpers.load_last_used_ids stores last+1 as the next
    id). Compared EXACTLY — ids are part of the byte surface here, so the
    diff sorts raw rows instead of unmapping through person_ids."""
    from carrot_transform_spark.cli import _load_last_used_ids
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case(seed, tmp_path)
    offsets = tmp_path / "last_used.tsv"
    offsets.write_text("observation\t5000\ncondition_occurrence\t770\n")
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(
        rules_file, inputs, ref_out, "demo", last_used_ids_file=offsets
    )
    our_out = tmp_path / "our_out"
    run_transform(
        spark,
        rules_file=rules_file,
        inputs=inputs,
        output_dir=our_out,
        person_table="demo",
        last_used_ids=_load_last_used_ids(str(offsets)),
    )
    from tests.carrot_compare import read_tsv

    for table in _TABLES:
        h1, r1 = read_tsv(our_out / f"{table}.tsv")
        h2, r2 = read_tsv(ref_out / f"{table}.tsv")
        assert h1 == h2, table
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r2)), (
            f"seed={seed} {table}: id-bearing rows diverge"
        )


def _gen_case_pid_sources(seed: int, d: Path) -> tuple[Path, Path]:
    """v1 person rules where person_id comes from DIFFERENT source columns:
    the LOOKUP side scans the raw rules last-wins — a term-less (dropped)
    rule-set still steers which column read_person_ids keys the person map
    on (_get_person_source_field_info_v1) — while each bucket's records
    write person_id from the bucket's own last-inserted pid field."""
    rng = random.Random(999_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(6, 14))]
    alt = [f"q{i:03d}" for i in range(len(pids))]
    rows = []
    for i, p in enumerate(pids):
        # pid2 overlaps pid's value space on some rows, is blank on others
        p2 = rng.choice([alt[i], rng.choice(pids), ""])
        rows.append((p, p2, rng.choice(_SEXES), rng.choice(_DATES)))
    (inputs / "demo.csv").write_text(
        "pid,pid2,sex,dob\n" + "\n".join(",".join(r) for r in rows) + "\n"
    )

    base = {"person_id": _src("pid"), "birth_datetime": _src("dob")}
    if seed % 2 == 0:
        # shape A: the pid2 rule-set is term-less -> DROPPED from the
        # record build, but last-wins for the lookup sources
        cdm_person = {
            "rs0": dict(
                base, gender_concept_id=_src("sex", mapping={"M": 8507, "F": 8532})
            ),
            "rs_dropped": {
                "person_id": _src("pid2"),
                "birth_datetime": _src("dob"),
                "gender_source_value": _src("sex"),
            },
        }
    else:
        # shape B: two KEPT rule-sets in different buckets with different
        # pid sources — the dict bucket's record carries pid, the scalar
        # bucket's record carries pid2; lookup keys on pid2 (raw last-wins)
        cdm_person = {
            "rs0": dict(
                base, gender_concept_id=_src("sex", mapping={"M": 8507, "F": 8532})
            ),
            "rs1": {
                "person_id": _src("pid2"),
                "birth_datetime": _src("dob"),
                "gender_source_concept_id": _src("sex", mapping=8599),
            },
        }
    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"pid{seed}"},
                "cdm": {"person": cdm_person},
            },
            indent=1,
        )
    )
    return rules_file, inputs


@pytest.mark.parametrize("seed", range(6))
def test_differential_pid_sources(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_pid_sources(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    from tests.carrot_compare import read_tsv

    # person ids are part of the surface here — compare BOTH files exactly
    for table in ("person_ids", "person"):
        h1, r1 = read_tsv(our_out / f"{table}.tsv")
        h2, r2 = read_tsv(ref_out / f"{table}.tsv")
        assert h1 == h2, table
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r2)), (
            f"seed={seed} {table} diverges:\nours={sorted(map(tuple, r1))[:6]}\n"
            f"gold={sorted(map(tuple, r2))[:6]}"
        )

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


def _gen_case_date_sources(seed: int, d: Path) -> tuple[Path, Path]:
    """v1 person rules where buckets read DIFFERENT date columns: the file's
    MAIN datetime column is the LAST date source in outdata scan order
    (buckets/blocks in creation order, dropped rule-sets excluded); each
    bucket's record writes dates from ITS OWN last date field — normalised
    in place when that is the main column, RAW otherwise — and each record
    is strict-gated on its own source. The lookup dob comes from the
    raw-rules scan (dropped rule-sets included)."""
    rng = random.Random(444_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(6, 14))]
    rows = [
        (p, rng.choice(_SEXES), rng.choice(_DATES), rng.choice(_DATES))
        for p in pids
    ]
    (inputs / "demo.csv").write_text(
        "pid,sex,dob1,dob2\n" + "\n".join(",".join(r) for r in rows) + "\n"
    )

    def rs(date_field, kind, concept_dest="gender_concept_id"):
        out = {"person_id": _src("pid")}
        if date_field:
            out["birth_datetime"] = _src(date_field)
        if kind == "dict":
            out[concept_dest] = _src("sex", mapping={"M": 8507, "F": 8532})
        elif kind == "scalar":
            out[concept_dest] = _src("sex", mapping=8599)
        else:  # termless -> dropped
            out["gender_source_value"] = _src("sex")
        return out

    shape = seed % 4
    if shape == 0:
        # dict bucket on dob1, scalar bucket on dob2 -> main = dob2; the
        # dict record carries RAW dob1 + its own strict gate
        cdm_person = {
            "rs0": rs("dob1", "dict"),
            "rs1": rs("dob2", "scalar", "gender_source_concept_id"),
        }
    elif shape == 1:
        # reversed creation order -> main = dob1; scalar record RAW dob2
        cdm_person = {
            "rs0": rs("dob2", "scalar", "gender_source_concept_id"),
            "rs1": rs("dob1", "dict"),
        }
    elif shape == 2:
        # two rule-sets in the SAME dict bucket: record date = the LAST
        # inserted date field (dob2), which is also the main column
        cdm_person = {
            "rs0": rs("dob1", "dict"),
            "rs1": rs("dob2", "dict", "gender_source_concept_id"),
        }
    else:
        # dropped rule-set steers the LOOKUP dob to dob2 while main/record
        # dates stay dob1
        cdm_person = {
            "rs0": rs("dob1", "dict"),
            "rs_dropped": rs("dob2", "none"),
        }
    cdm = {"person": cdm_person}
    if seed % 2 == 1:
        # a LATER target reading dob2 takes over the main column
        # (cross-target last-wins) on top of the bucket shapes
        cdm["observation"] = {
            "obs0": {
                "person_id": _src("pid"),
                "observation_datetime": _src("dob2"),
                "observation_concept_id": _src("sex", mapping={"X": 9200}),
                "observation_source_value": _src("sex"),
            }
        }
    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"ds{seed}"},
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


@pytest.mark.parametrize("seed", range(8))
def test_differential_date_sources(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_date_sources(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    from tests.carrot_compare import read_tsv

    for table in ("person_ids", "person", "observation"):
        if not (ref_out / f"{table}.tsv").exists():
            continue
        h1, r1 = read_tsv(our_out / f"{table}.tsv")
        h2, r2 = read_tsv(ref_out / f"{table}.tsv")
        assert h1 == h2, table
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r2)), (
            f"seed={seed} {table} diverges:\nours={sorted(map(tuple, r1))[:6]}\n"
            f"gold={sorted(map(tuple, r2))[:6]}"
        )

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"


def _gen_case_block_dates(seed: int, d: Path) -> tuple[Path, Path]:
    """v1 NON-person blocks with heterogeneous date shapes inside one
    target: each block writes ONLY its own (source, dest) date pairs —
    from its own columns, normalised in place only for the file's main
    datetime column — with derived artifacts on each source field's last
    date dest; date-less blocks write no dates at all; a term-less block
    is dropped from the main-datetime scan."""
    rng = random.Random(333_000 + seed)
    inputs = d / "inputs"
    inputs.mkdir()
    pids = [f"p{i:03d}" for i in range(rng.randint(5, 12))]
    (inputs / "demo.csv").write_text(
        "pid,sex,dob\n"
        + "\n".join(f"{p},{rng.choice(_SEXES)},{rng.choice(_DATES)}" for p in pids)
        + "\n"
    )
    obs_rows = [
        (
            rng.choice(pids + ["ghost1"]),
            rng.choice(_DATES),
            rng.choice(_DATES),
            rng.choice(_DATES),
            rng.choice(_CODES),
        )
        for _ in range(rng.randint(8, 30))
    ]
    (inputs / "obs.csv").write_text(
        "pid,when1,when2,when3,code\n"
        + "\n".join(",".join(r) for r in obs_rows)
        + "\n"
    )

    whens = ["when1", "when2", "when3"]
    observation = {}
    # 2-3 observation blocks, each with its own date column (or none),
    # each triggering on distinct code values so records are attributable
    vals = ["v0", "v1", "v2", "v3"]
    rng.shuffle(vals)
    n_blocks = rng.randint(2, 3)
    for i in range(n_blocks):
        w = rng.choice(whens + [None])
        if i == n_blocks - 1 and not any(
            "observation_datetime" in b for b in observation.values()
        ):
            # at least one dated block per file, or the reference itself
            # crashes (datetime_source='' -> inputcolmap KeyError): the
            # all-date-less file is an unrunnable shape, not a semantic
            w = rng.choice(whens)
        blk = {
            "person_id": _src("pid", "obs.csv"),
            "observation_concept_id": _src("code", "obs.csv", mapping={vals[i]: 9000 + i}),
            "observation_source_value": _src("code", "obs.csv"),
        }
        if w is not None:
            mix = rng.random()
            if mix < 0.25:
                # plain dest on the date field BEFORE the date rule: the
                # field's final entry stays the date dest -> twin KEPT
                blk["value_as_number"] = _src(w, "obs.csv")
                blk["observation_datetime"] = _src(w, "obs.csv")
            elif mix < 0.5:
                # plain dest AFTER the date rule: final entry is non-date
                # -> the derived twin is SKIPPED for this field
                blk["observation_datetime"] = _src(w, "obs.csv")
                blk["value_as_string"] = _src(w, "obs.csv")
            else:
                blk["observation_datetime"] = _src(w, "obs.csv")
        observation[f"blk{i}"] = blk
    cdm = {
        "person": {
            "p": {
                "person_id": {"source_table": "demo.csv", "source_field": "pid"},
                "birth_datetime": {"source_table": "demo.csv", "source_field": "dob"},
                "gender_concept_id": {
                    "source_table": "demo.csv",
                    "source_field": "sex",
                    "term_mapping": {"M": 8507, "F": 8532},
                },
            }
        },
        "observation": observation,
    }
    if seed % 2 == 1:
        # a condition block whose start/end read DIFFERENT columns — the
        # linked *_date twin attaches per source field's last date dest
        w1, w2 = rng.sample(whens, 2)
        cdm["condition_occurrence"] = {
            "c0": {
                "person_id": _src("pid", "obs.csv"),
                "condition_start_datetime": _src(w1, "obs.csv"),
                "condition_end_datetime": _src(w2, "obs.csv"),
                "condition_concept_id": _src("code", "obs.csv", mapping={vals[3]: 254761}),
                "condition_source_value": _src("code", "obs.csv"),
            }
        }
    if seed % 3 == 0:
        # term-less block: dropped from outdata, so its date column must
        # NOT win the main-datetime scan
        cdm["observation"]["blk_dropped"] = {
            "person_id": _src("pid", "obs.csv"),
            "observation_datetime": _src(rng.choice(whens), "obs.csv"),
            "observation_source_value": _src("code", "obs.csv"),
        }
    rules_file = d / "rules.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": f"bd{seed}"},
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


@pytest.mark.parametrize("seed", range(8))
def test_differential_block_dates(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_case_block_dates(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    run_reference_mapstream(rules_file, inputs, ref_out, "demo")
    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = []
    for table in _TABLES:
        if not (ref_out / f"{table}.tsv").exists():
            continue
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])

    from tests.carrot_compare import read_tsv

    h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
    h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
    assert h1 == h2
    ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
    gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
    bad = {
        k: (gold.get(k), ours.get(k))
        for k in set(gold) | set(ours)
        if gold.get(k) != ours.get(k)
    }
    assert not bad, f"seed={seed} summary rows diverge: {dict(list(bad.items())[:8])}"
