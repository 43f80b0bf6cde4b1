"""Differential check of the round-12 probe shapes: reference launch_v2 vs
our run_transform on the same corpora (scripts/probe_v2_shapes.py shapes).

Usage: python scripts/probe_v2_shapes_diff.py [shape ...]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.probe_v2_shapes import SHAPES, DEMO, OBS  # noqa: E402
from tests.test_v2_reference_parity import _run_reference_v2  # noqa: E402

EXTRA = {
    "p4_person_two_files": {
        "demo2.csv": "pid,sex2,dob2\np002,M,1970-01-01\np009,M,1960-05-05\n"
    }
}
TABLES = ["person", "observation", "measurement", "condition_occurrence"]


def main() -> int:
    from carrot_transform_spark.session import get_spark
    from carrot_transform_spark.pipeline import run_transform
    from tests.carrot_compare import compare_table, read_tsv

    spark = get_spark(app_name="v2-probe-diff", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wanted = sys.argv[1:] or [s for s in SHAPES if s != "p4_person_two_files"]
    bad = []
    for name in wanted:
        d = Path(tempfile.mkdtemp(prefix=f"pdiff_{name}_"))
        try:
            inputs = d / "inputs"
            inputs.mkdir()
            (inputs / "demo.csv").write_text(DEMO)
            (inputs / "obs.csv").write_text(OBS)
            for fn, content in EXTRA.get(name, {}).items():
                (inputs / fn).write_text(content)
            rules = d / "rules.json"
            rules.write_text(json.dumps({
                "metadata": {"date_created": "2026-01-01T00:00:00", "dataset": name},
                "cdm": SHAPES[name],
            }, indent=1))
            ref_out = d / "ref"
            ref_out.mkdir()
            _run_reference_v2(rules, inputs, ref_out, "demo")
            our_out = d / "ours"
            run_transform(spark, rules_file=rules, inputs=inputs,
                          output_dir=our_out, person_table="demo")
            problems = []
            for t in TABLES:
                if not (ref_out / f"{t}.tsv").exists():
                    continue
                problems += compare_table(
                    t, our_out / f"{t}.tsv", ref_out / f"{t}.tsv",
                    our_out / "person_ids.tsv", ref_out / "person_ids.tsv")
            h1, r1 = read_tsv(our_out / "summary_mapstream.tsv")
            h2, r2 = read_tsv(ref_out / "summary_mapstream.tsv")
            ours = {tuple(r[:6]): tuple(r[6:]) for r in r1}
            gold = {tuple(r[:6]): tuple(r[6:]) for r in r2}
            sbad = {k: (gold.get(k), ours.get(k))
                    for k in set(gold) | set(ours) if gold.get(k) != ours.get(k)}
            if sbad:
                problems.append(f"summary diverges: {dict(list(sbad.items())[:6])}")
            status = "OK" if not problems else "DIVERGES"
            print(f"{name}: {status}")
            for p in problems[:12]:
                print(f"   {p}")
            if problems:
                bad.append(name)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print("ALL OK" if not bad else f"DIVERGENT: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
