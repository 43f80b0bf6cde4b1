"""Order-insensitive golden TSV comparison.

Replicates the reference test harness semantics (tests/testools.py:44-160):
rows sorted, the auto-number id column stripped, person ids unmapped back to
source ids via each side's person_ids table — so order-dependent id
assignment differences don't fail the diff.
"""

from __future__ import annotations

import csv
from pathlib import Path

AUTO_ID_COLS = {
    "condition_occurrence": "condition_occurrence_id",
    "observation": "observation_id",
    "measurement": "measurement_id",
    "drug_exposure": "drug_exposure_id",
    "procedure_occurrence": "procedure_occurrence_id",
    "visit_occurrence": "visit_occurrence_id",
    "device_exposure": "device_exposure_id",
    "specimen": "specimen_id",
    "death": "death_id",
}


def read_tsv(path: str | Path) -> tuple[list[str], list[list[str]]]:
    with open(path, newline="", encoding="utf-8") as fh:
        rows = list(csv.reader(fh, delimiter="\t"))
    return rows[0], rows[1:]


def person_unmap(path: str | Path) -> dict[str, str]:
    """target_subject -> source_subject."""
    header, rows = read_tsv(path)
    return {r[1]: r[0] for r in rows}


def canonical_rows(
    table: str,
    header: list[str],
    rows: list[list[str]],
    unmap: dict[str, str] | None,
) -> list[tuple[str, ...]]:
    drop_idx = None
    auto_col = AUTO_ID_COLS.get(table)
    if auto_col and auto_col in header:
        drop_idx = header.index(auto_col)
    pid_idx = header.index("person_id") if "person_id" in header else None
    out = []
    for r in rows:
        r = list(r) + [""] * (len(header) - len(r))
        if pid_idx is not None and unmap is not None:
            r[pid_idx] = unmap.get(r[pid_idx], r[pid_idx])
        if drop_idx is not None:
            r = r[:drop_idx] + r[drop_idx + 1 :]
        out.append(tuple(r))
    return sorted(out)


def compare_table(
    table: str,
    ours_path: str | Path,
    golden_path: str | Path,
    ours_person_ids: str | Path,
    golden_person_ids: str | Path,
) -> list[str]:
    """Returns list of problems (empty == match)."""
    problems: list[str] = []
    h1, r1 = read_tsv(ours_path)
    h2, r2 = read_tsv(golden_path)
    if h1 != h2:
        problems.append(f"{table}: header mismatch\n ours : {h1}\n gold : {h2}")
        return problems
    u1 = person_unmap(ours_person_ids)
    u2 = person_unmap(golden_person_ids)
    c1 = canonical_rows(table, h1, r1, u1)
    c2 = canonical_rows(table, h2, r2, u2)
    if len(c1) != len(c2):
        problems.append(f"{table}: row count {len(c1)} vs golden {len(c2)}")
    for a, b in zip(c1, c2):
        if a != b:
            problems.append(f"{table}: first row diff\n ours : {a}\n gold : {b}")
            break
    return problems
