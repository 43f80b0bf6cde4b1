"""V2-dialect parity against the REFERENCE ENGINE ITSELF.

The repo's golden tests pin the v1 mapstream against committed goldens, but
the reference ships NO goldens for its v2 path (launch_v2 / run_v2
orchestrator). With the reference runnable in-process (tests/ref_runner.py
shims), the v2 goldens are generated live: run the reference's launch_v2 on
the bundled demo corpus and diff our engine's v2 output with the
reference's own order-insensitive comparison.

Plus a seeded v2 fuzz: the same adversarial corpus generator as the v1
differential fuzz, with the rules emitted in the v2 format (one mapping per
(target, source), multi-value concept maps, original_value, multi-dest
dates) — exercising the v2 semantics (clamped-zip combos, person dedup,
any-non-blank original values) that v1 blocks cannot express.
"""

from __future__ import annotations

import json
import random
import sys
from pathlib import Path

import pytest

import tests.ref_runner as rr
from tests.carrot_compare import compare_table
from tests.test_differential_fuzz import _gen_case

EXAMPLES = Path("/root/reference/carrottransform/examples/test")


def _run_reference_v2(rules_file, inputs_dir, out_dir, person: str) -> None:
    for p in (rr._REF, rr._SHIMS):
        if p not in sys.path:
            sys.path.append(p)
    from click.testing import CliRunner

    from carrottransform.cli.subcommands.run import launch_v2

    result = CliRunner().invoke(
        launch_v2,
        [
            "--rules-file", str(rules_file),
            "--inputs", str(inputs_dir),
            "--output", str(out_dir),
            "--person", person,
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, f"reference launch_v2 failed:\n{result.output}"


def test_v2_demo_corpus_parity(spark, tmp_path):
    from carrot_transform_spark.pipeline import run_transform

    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    _run_reference_v2(EXAMPLES / "rules" / "v2.json", EXAMPLES / "inputs", ref_out, "Demographics")

    our_out = tmp_path / "our_out"
    run_transform(
        spark,
        rules_file=EXAMPLES / "rules" / "v2.json",
        inputs=EXAMPLES / "inputs",
        output_dir=our_out,
        person_table="Demographics",
    )
    problems = []
    for table in ("person", "observation", "measurement", "condition_occurrence"):
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, "\n".join(problems[:20])

    # the v2 metric rollup agrees row-for-row too (48 rows on this corpus)
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
    assert not bad, f"v2 summary rows diverge: {dict(list(bad.items())[:8])}"


def _v1_rules_to_v2(rules: dict) -> dict:
    """Re-express the fuzz generator's v1 rules in the v2 format. v2 holds
    ONE mapping per (target, source), so blocks merge: concept maps union
    per (field, value), plain copies become original_value, and the date /
    person-id fields dedupe. This intentionally does NOT reproduce v1 block
    semantics — it produces a valid v2 mapping whose truth is whatever the
    reference's v2 orchestrator computes on it."""
    out = {"metadata": dict(rules["metadata"]), "cdm": {}}
    for target, blocks in rules["cdm"].items():
        per_src: dict[str, dict] = {}
        for block in blocks.values():
            for dest, si in block.items():
                src = si["source_table"]
                m = per_src.setdefault(
                    src, {"person_id_mapping": None, "date_mapping": None, "concept_mappings": {}}
                )
                field = si["source_field"]
                term = si.get("term_mapping")
                if dest == "person_id" and term is None:
                    m["person_id_mapping"] = {"source_field": field, "dest_field": dest}
                elif term is None and (dest.endswith("_datetime") or dest.endswith("_date")):
                    dm = m["date_mapping"] or {"source_field": field, "dest_field": []}
                    if dest not in dm["dest_field"]:
                        dm["dest_field"].append(dest)
                    m["date_mapping"] = dm
                elif term is None:
                    cm = m["concept_mappings"].setdefault(field, {})
                    ov = cm.setdefault("original_value", [])
                    if dest not in ov:
                        ov.append(dest)
                else:
                    cm = m["concept_mappings"].setdefault(field, {})
                    tmap = term if isinstance(term, dict) else {"*": term}
                    for value, concept in tmap.items():
                        vm = cm.setdefault(str(value), {})
                        ids = vm.setdefault(dest, [])
                        if int(concept) not in ids:
                            ids.append(int(concept))
        out["cdm"][target] = {
            s: {k: v for k, v in m.items() if v is not None} | {"concept_mappings": m["concept_mappings"]}
            for s, m in per_src.items()
        }
        # v2 mappings need all three keys present for dialect detection
        for m in out["cdm"][target].values():
            m.setdefault("person_id_mapping", {"source_field": "pid", "dest_field": "person_id"})
            m.setdefault("date_mapping", {"source_field": "dob", "dest_field": []})
    return out


_V2_DATES = [
    "1990-01-02",
    "1955-12-31",
    "02/03/1991",
    "1993-05-06 07:08:09",
    "2001-06-07",
    "garbage",
    "",
    "31/11/2000",  # invalid day for month
    "2001-02-30",  # calendar-invalid, regex-valid
    "1990-1-2",
]
_V2_SEXES = ["M", "F", "X", "zz", ""]
_V2_ETHS = ["e0", "e1", "e2", "zz", ""]
_V2_CODES = ["v0", "v1", "v2", "v3", "zz", ""]
_V2_VALS = ["1", "2.5", "-3", "", "17.25", "x"]


def _gen_v2_case(seed: int, d: Path) -> tuple[Path, Path]:
    """Native v2-format fuzz corpus: rules shapes only v2 can express.

    Shapes drawn per seed (reference semantics each must hit):
      - uneven multi-concept lists -> clamped-zip combos
        (concept_helpers.generate_combinations: index min(i, len-1))
      - exact AND wildcard on one field -> exact wins
        (concept_helpers.get_value_mapping: exact > '*' > None)
      - original_value WITHOUT any value mapping: standard builder emits
        NOTHING (record_builder.py:344-368 gates on non-empty combinations)
        while the person builder emits with combos=[{}]
        (record_builder.py:236-241) — the emit asymmetry
      - several concept fields on one table mapping: person merges with
        later-field dest overwrite (record_builder.py:252-283); standard
        tables emit per-field record sets
      - multi-dest date mapping + the main-datetime quirk: the row's
        validity datetime is the FIRST (cdm-order) target's date source for
        that file, normalised IN PLACE (orchestrator.py:93-152); a target
        whose date source is a DIFFERENT column gets the RAW value copied
      - rules fields missing from the CSV header are skipped
        (orchestrator.py:201-203)
      - empty concept-id lists: the dest is dropped from combos
        (generate_combinations's `if concept_ids` filter)

    Round-12 shapes (each probe-confirmed via scripts/probe_v2_shapes.py
    before generating):
      - mapping with NO date_mapping: records emit with empty date fields
        (record_builder.apply_date_mappings returns True); the per-file
        MAIN datetime steers to the first cdm-order table that has one
        (mappingrules._get_infile_date_person_id_v2 partial fills)
      - mapping with NO person_id_mapping: its records keep an empty pid
        and are all rejected at write (invalid_person_ids)
      - a file where NO table maps a date (or no table maps a pid) is
        skipped wholesale (orchestrator.py:85-87)
      - the person FILE fanning out to a standard table (v1 multi-target
        analog; auto-ids run file-major)
      - date dests that are the date-ONLY columns: the full normalised
        datetime lands RAW in the *_date column (simple-field branch)
        and the *_datetime column stays empty
      - rules field names case-flipped vs the CSV header
        (CaseInsensitiveDict column maps)
      - the main datetime source doubling as a concept field: term
        matching sees the IN-PLACE normalised value
      - pid source == the datetime field: every record write rejects
        (normalised datetimes never appear in person_lookup)
    """
    rng = random.Random(31_337 + seed)
    inputs = d / "inputs"
    inputs.mkdir()

    pids = [f"p{i:03d}" for i in range(rng.randint(6, 25))]
    person_rows = [
        (p, rng.choice(_V2_SEXES), rng.choice(_V2_DATES), rng.choice(_V2_ETHS))
        for p in pids
    ]
    for _ in range(rng.randint(0, 4)):  # duplicate persons (first-wins)
        person_rows.append(
            (
                rng.choice(pids),
                rng.choice(_V2_SEXES),
                rng.choice(_V2_DATES),
                rng.choice(_V2_ETHS),
            )
        )
    (inputs / "demo.csv").write_text(
        "pid,sex,dob,eth\n" + "\n".join(",".join(r) for r in person_rows) + "\n"
    )

    obs_rows = [
        (
            rng.choice(pids + ["ghost1", "ghost2"]),
            rng.choice(_V2_DATES),
            rng.choice(_V2_DATES),
            rng.choice(_V2_CODES),
            rng.choice(_V2_VALS),
        )
        for _ in range(rng.randint(10, 60))
    ]
    (inputs / "obs.csv").write_text(
        "pid,when,when2,code,val\n" + "\n".join(",".join(r) for r in obs_rows) + "\n"
    )

    def _pid(f="pid"):
        return {"source_field": f, "dest_field": "person_id"}

    def _date(f, dests):
        return {"source_field": f, "dest_field": dests}

    # --- person mapping (always) ---
    sex_cm: dict = {
        "M": {"gender_concept_id": [8507], "gender_source_concept_id": [8507]},
        "F": {"gender_concept_id": [8532], "gender_source_concept_id": [8532]},
    }
    if rng.random() < 0.5:  # uneven zip inside person
        sex_cm["X"] = {
            "gender_concept_id": [8551, 8552],
            "gender_source_concept_id": [8551],
        }
    if rng.random() < 0.4:  # wildcard losing to exacts
        sex_cm["*"] = {"gender_concept_id": [8599]}
    if rng.random() < 0.7:
        sex_cm["original_value"] = ["gender_source_value"]
    person_cms: dict = {"sex": sex_cm}
    eth_variant = rng.randrange(5)
    if eth_variant == 1:
        person_cms["eth"] = {
            "e0": {"ethnicity_concept_id": [38003564]},
            "original_value": ["ethnicity_source_value"],
        }
    elif eth_variant == 2:  # dest collision: later field overwrites sex's dest
        person_cms["eth"] = {"e1": {"gender_concept_id": [7777]}}
    elif eth_variant == 3:  # wildcard multi-concept -> uneven zip across fields
        person_cms["eth"] = {
            "*": {"race_concept_id": [8527, 8516]},
            "original_value": ["race_source_value"],
        }
    elif eth_variant == 4:  # original-ONLY field: person still collects the
        # copy (record_builder.py:278-283) even though a standard table
        # would emit nothing for such a field
        person_cms["eth"] = {"original_value": ["ethnicity_source_value"]}
    person_map = {
        "person_id_mapping": _pid(),
        "date_mapping": _date("dob", ["birth_datetime"]),
        "concept_mappings": person_cms,
    }

    # --- observation mapping (always) ---
    code_cm: dict = {
        "v0": {
            "observation_concept_id": [9000, 9001],
            "observation_source_concept_id": [9000],
        },
        "v1": {"observation_concept_id": [9010], "observation_source_concept_id": [9010]},
    }
    if rng.random() < 0.5:
        code_cm["*"] = {"observation_concept_id": [9090]}
    if rng.random() < 0.7:
        code_cm["original_value"] = ["observation_source_value"]
    obs_cms: dict = {"code": code_cm}
    val_variant = rng.randrange(3)
    if val_variant == 1:  # original_value only -> standard builder emits nothing
        obs_cms["val"] = {"original_value": ["value_as_number"]}
    elif val_variant == 2:
        obs_cms["val"] = {
            "*": {"observation_concept_id": [9400]},
            "original_value": ["value_as_number"],
        }
    if rng.random() < 0.3:  # field absent from the CSV header
        obs_cms["nosuch"] = {"*": {"observation_concept_id": [9999]}}
    if rng.random() < 0.2:  # main datetime source doubling as a concept
        # field: term matching sees the in-place NORMALISED value, so keys
        # are normalised forms of the date zoo (plus one raw + wildcard)
        obs_cms["when"] = {
            "1990-01-02 00:00:00": {"observation_concept_id": [7100]},
            "1993-05-06 07:08:09": {"observation_concept_id": [7200]},
            "1990-01-02": {"observation_concept_id": [7300]},
            "*": {"observation_concept_id": [7900]},
            "original_value": ["observation_source_value"],
        }
    # date dests: usually the datetime column; sometimes the date-ONLY
    # column (raw full datetime lands there, datetime col stays empty),
    # sometimes both
    obs_dests_roll = rng.random()
    if obs_dests_roll < 0.70:
        obs_dests = ["observation_datetime"]
    elif obs_dests_roll < 0.85:
        obs_dests = ["observation_date"]
    else:
        obs_dests = ["observation_datetime", "observation_date"]
    observation_map = {
        "person_id_mapping": _pid("when" if rng.random() < 0.06 else "pid"),
        "date_mapping": _date("when", obs_dests),
        "concept_mappings": obs_cms,
    }
    if rng.random() < 0.10:  # observation contributes NO date mapping:
        # records emit with empty dates; the file's main datetime steers to
        # whichever other table (cdm order) still maps one, or the whole
        # file is skipped when none does
        del observation_map["date_mapping"]

    # --- measurement mapping (half the seeds): date source when2 != the
    # file's main datetime -> raw-copy quirk; sometimes the date source is
    # a column MISSING from the header entirely -> records emit with empty
    # date fields and can never strict-reject (record_builder.py:74-79) ---
    measurement_map = None
    if rng.random() < 0.5:
        m_cm: dict = {
            "v2": {
                "measurement_concept_id": [3020891],
                "measurement_source_concept_id": [3020891],
            }
        }
        if rng.random() < 0.5:
            m_cm["original_value"] = ["measurement_source_value"]
        m_date_src = "when2" if rng.random() < 0.8 else "nosuch_date"
        measurement_map = {
            "person_id_mapping": _pid(),
            "date_mapping": _date(m_date_src, ["measurement_datetime"]),
            "concept_mappings": {"code": m_cm},
        }
        m_roll = rng.random()
        if m_roll < 0.20:  # no date mapping at all: empty date fields
            del measurement_map["date_mapping"]
        elif m_roll < 0.32:  # no pid mapping: every record write rejects
            del measurement_map["person_id_mapping"]

    # --- condition mapping (60%): multi-dest dates, empty concept lists ---
    condition_map = None
    if rng.random() < 0.6:
        c_cm: dict = {
            "v1": {
                "condition_concept_id": [254761],
                "condition_source_concept_id": [254761],
            },
            "v3": {
                "condition_concept_id": [254762, 254763],
                "condition_source_concept_id": [254762],
            },
        }
        if rng.random() < 0.3:  # empty list: dest dropped from combos
            c_cm["v0"] = {"condition_concept_id": [], "condition_source_concept_id": [254764]}
        c_dests = rng.choice(
            [
                ["condition_start_datetime", "condition_end_datetime"],
                ["condition_start_datetime", "condition_end_datetime"],
                ["condition_start_date"],  # date-only dest: raw datetime
                ["condition_start_datetime", "condition_end_date"],
                ["condition_end_date", "condition_start_date"],
            ]
        )
        condition_map = {
            "person_id_mapping": _pid(),
            "date_mapping": _date("when", c_dests),
            "concept_mappings": {"code": c_cm},
        }

    # --- second source FILE for observation (40%): exercises the global
    # input-file iteration order (auto-number ids run file-major across
    # files, mappingrules._get_all_infile_names_v2) and independent
    # per-file main-datetime selection ---
    obs2_map = None
    if rng.random() < 0.4:
        o2_rows = [
            (
                rng.choice(pids + ["ghost1"]),
                rng.choice(_V2_DATES),
                rng.choice(_V2_CODES),
            )
            for _ in range(rng.randint(5, 25))
        ]
        (inputs / "obs2.csv").write_text(
            "pid,ts,code\n" + "\n".join(",".join(r) for r in o2_rows) + "\n"
        )
        obs2_map = {
            "person_id_mapping": _pid(),
            "date_mapping": _date("ts", ["observation_datetime"]),
            "concept_mappings": {
                "code": {
                    "v1": {"observation_concept_id": [9500]},
                    "*": {"observation_concept_id": [9501, 9502]},
                    "original_value": ["observation_source_value"],
                }
            },
        }

    # cdm insertion order decides the per-file MAIN datetime column
    # (first target mapping the file wins) — shuffle it so the quirk flips
    cdm: dict = {"person": {"demo.csv": person_map}}
    others = [("observation", observation_map)]
    if measurement_map:
        others.append(("measurement", measurement_map))
    if condition_map:
        others.append(("condition_occurrence", condition_map))
    rng.shuffle(others)
    for name, m in others:
        cdm[name] = {"obs.csv": m}
    if obs2_map is not None:
        cdm["observation"]["obs2.csv"] = obs2_map

    # --- person-FILE fan-out (35%): demo.csv also feeds observation (v1
    # multi-target analog; auto-ids run file-major across files) ---
    if rng.random() < 0.35:
        fan_cm: dict = {
            "eth": {
                "e0": {"observation_concept_id": [4001]},
                "e1": {"observation_concept_id": [4002, 4003]},
                "original_value": ["observation_source_value"],
            }
        }
        if rng.random() < 0.4:  # second fan field -> per-field record sets
            fan_cm["sex"] = {"M": {"observation_concept_id": [4100]}}
        cdm.setdefault("observation", {})["demo.csv"] = {
            "person_id_mapping": _pid(),
            "date_mapping": _date(
                "dob",
                ["observation_datetime"]
                if rng.random() < 0.7
                else ["observation_date"],
            ),
            "concept_mappings": fan_cm,
        }

    # --- case-flip post-pass (25% of seeds): rules-side field names are
    # matched case-insensitively against CSV headers (CaseInsensitiveDict
    # column maps) — flip random source fields to upper/title case ---
    if rng.random() < 0.25:

        def _flip(name: str) -> str:
            r = rng.random()
            if r < 0.4:
                return name.upper()
            if r < 0.6:
                return name.title()
            return name

        for table_maps in cdm.values():
            for m in table_maps.values():
                if "person_id_mapping" in m:
                    m["person_id_mapping"] = {
                        **m["person_id_mapping"],
                        "source_field": _flip(m["person_id_mapping"]["source_field"]),
                    }
                if "date_mapping" in m:
                    m["date_mapping"] = {
                        **m["date_mapping"],
                        "source_field": _flip(m["date_mapping"]["source_field"]),
                    }
                m["concept_mappings"] = {
                    _flip(f): cm for f, cm in m["concept_mappings"].items()
                }

    rules_file = d / "rules_v2.json"
    rules_file.write_text(
        json.dumps(
            {
                "metadata": {
                    "date_created": "2026-01-01T00:00:00",
                    "dataset": f"v2fuzz{seed}",
                },
                "cdm": cdm,
            },
            indent=1,
        )
    )
    return rules_file, inputs


_V2_TABLES = ["person", "observation", "measurement", "condition_occurrence"]


def run_v2_fuzz_seed(spark, tmp_path: Path, seed: int) -> None:
    """One native-v2 differential seed: records AND summary parity."""
    from carrot_transform_spark.pipeline import run_transform

    rules_file, inputs = _gen_v2_case(seed, tmp_path)
    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    _run_reference_v2(rules_file, inputs, ref_out, "demo")

    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = []
    for table in _V2_TABLES:
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


@pytest.mark.parametrize("seed", range(10))
def test_v2_native_fuzz_case(spark, tmp_path, seed):
    run_v2_fuzz_seed(spark, tmp_path, seed)


@pytest.mark.parametrize("seed", range(3))
def test_v2_differential_case(spark, tmp_path, seed):
    from carrot_transform_spark.pipeline import run_transform

    rules_v1_file, inputs = _gen_case(seed, tmp_path)
    rules = _v1_rules_to_v2(json.loads(rules_v1_file.read_text()))
    rules_file = tmp_path / "rules_v2.json"
    rules_file.write_text(json.dumps(rules, indent=1))

    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    _run_reference_v2(rules_file, inputs, ref_out, "demo")

    our_out = tmp_path / "our_out"
    run_transform(
        spark, rules_file=rules_file, inputs=inputs, output_dir=our_out, person_table="demo"
    )
    problems = []
    for table in ("person", "observation", "condition_occurrence"):
        problems += compare_table(
            table,
            our_out / f"{table}.tsv",
            ref_out / f"{table}.tsv",
            our_out / "person_ids.tsv",
            ref_out / "person_ids.tsv",
        )
    assert not problems, f"seed={seed}:\n" + "\n".join(problems[:20])
