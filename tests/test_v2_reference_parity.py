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
