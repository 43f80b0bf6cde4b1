"""Run the REFERENCE engine's mapstream CLI in-process for differential
testing. The reference at /root/reference is pure Python; three of its
module-scope imports (case_insensitive_dict, sqlalchemy, boto3) are
satisfied by the minimal stubs in tests/refshims — appended to sys.path
LAST so real packages win wherever they exist. Only the local-CSV input and
TSV output paths are exercised; the stubs raise if a DB/S3 path is touched.
"""

from __future__ import annotations

import sys
from pathlib import Path

_SHIMS = str(Path(__file__).resolve().parent / "refshims")
_REF = "/root/reference"


def run_reference_mapstream(
    rules_file,
    inputs_dir,
    out_dir,
    person: str,
    use_input_person_ids: bool = False,
    last_used_ids_file=None,
) -> None:
    for p in (_REF, _SHIMS):
        if p not in sys.path:
            sys.path.append(p)
    from click.testing import CliRunner

    from carrottransform.cli.subcommands.run import mapstream

    args = [
        "--rules-file",
        str(rules_file),
        "--inputs",
        str(inputs_dir),
        "--output",
        str(out_dir),
        "--person",
        person,
    ]
    if use_input_person_ids:
        args += ["--use-input-person-ids", "Y"]
    if last_used_ids_file is not None:
        args += ["--last-used-ids-file", str(last_used_ids_file)]
    result = CliRunner().invoke(mapstream, args, catch_exceptions=False)
    assert result.exit_code == 0, f"reference mapstream failed:\n{result.output}"
