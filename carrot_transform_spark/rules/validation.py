"""Planning-time validation — the reference's "analyzer" checks (SURVEY
§2.10, reference args.py:18-299, file_helpers.py:47-61).

All driver-side, run before any Spark job:

V1  person rules must read from exactly one source table, and it must match
    the --person table
V2  rules file exists/parses (handled by the loader); dataset name comes
    from metadata.dataset
V3  --person table name must match ^[a-zA-Z_][a-zA-Z0-9_]*$
V4  warn when the rules reference source tables absent from the input
    directory (or vice versa)
V5  object_query-style path navigation over the rules JSON
"""

from __future__ import annotations

import re
from pathlib import Path

from carrot_transform_spark.rules.ir import RuleSet

TABLE_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


class RulesValidationError(ValueError):
    pass


def check_person_table_name(person_table: str) -> None:
    """V3 (args.py:18, :366-375)."""
    if not TABLE_NAME_RE.match(person_table):
        raise RulesValidationError(
            f"invalid person table name {person_table!r}: must match "
            f"{TABLE_NAME_RE.pattern}"
        )


def check_person_rules(rules: RuleSet, person_table: str) -> None:
    """V1 (args.py:125-299): the person target must be fed by exactly one
    source table, and that table must be the --person table."""
    person_sources = rules.sources_for("person")
    if not person_sources:
        raise RulesValidationError("rules contain no mappings for the person table")
    if len(person_sources) > 1:
        # exact reference error text (cli/subcommands/run.py:102) so users and
        # scripts see the same diagnostic
        input_list = sorted(person_sources)
        raise RulesValidationError(
            f"Person properties were mapped from ({input_list}) but can only "
            f"come from the person file person={person_table!r}"
        )
    src = _strip_csv(person_sources[0])
    if src.lower() != _strip_csv(person_table).lower():
        raise RulesValidationError(
            f"person rules read from {src!r} but --person is {person_table!r}"
        )
    tm = rules.mappings["person"][person_sources[0]]
    if tm.person_id_mapping is None:
        raise RulesValidationError("person rules have no person_id mapping")
    if tm.date_mapping is None:
        raise RulesValidationError("person rules have no date (birth) mapping")


def check_files_exist(rules: RuleSet, input_dir: str | Path) -> list[str]:
    """V4 (file_helpers.py:47-61): returns warning strings for source tables
    named in the rules but missing on disk, and CSVs present but unmapped."""
    input_dir = Path(input_dir)
    warnings: list[str] = []
    if not input_dir.is_dir():
        return [f"input dir {input_dir} is not a directory"]
    on_disk = {p.stem.lower() for p in input_dir.glob("*.csv")}
    in_rules = {_strip_csv(t).lower() for t in rules.source_tables()}
    for t in sorted(in_rules - on_disk):
        warnings.append(f"rules reference source table '{t}' not present in {input_dir}")
    for t in sorted(on_disk - in_rules):
        warnings.append(f"input file '{t}.csv' has no mapping rules")
    return warnings


def object_query(data: dict | list, path: str):
    """V5 (args.py:25-59): navigate a rules JSON by '/'-separated path;
    integer segments index lists."""
    cur = data
    for seg in path.strip("/").split("/"):
        if isinstance(cur, list):
            cur = cur[int(seg)]
        elif isinstance(cur, dict):
            if seg not in cur:
                raise KeyError(f"path segment {seg!r} not found")
            cur = cur[seg]
        else:
            raise KeyError(f"cannot navigate into {type(cur).__name__} at {seg!r}")
    return cur


def _strip_csv(name: str) -> str:
    return name[:-4] if name.endswith(".csv") else name
