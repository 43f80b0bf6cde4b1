"""Mapping-rules JSON loader: v1/v2 auto-detect, both normalized to the IR.

Dialect detection mirrors the reference (mappingrules.py:42-60): a rules file
is v2 when any cdm.<table>.<source> value carries the three mapping-type
keys. v2 parses 1:1 into the IR (mappingrules.py:62-117). v1 (the legacy
Carrot-Mapper output, parsed at mappingrules.py:312-429 into tilde-keyed
lookup dicts) is converted: each v1 rule block contributes

- dest fields with dict ``term_mapping`` -> value_mappings[value][dest] +=
  concept (accumulating lists preserves multi-concept values spread over
  repeated rules),
- dest fields with scalar ``term_mapping`` -> wildcard value_mappings["*"],
- the dest matching the table's person-id column -> person_id_mapping,
- dest fields typed datetime/date in the DDL (no term_mapping) ->
  date_mapping dest list,
- remaining plain dest fields -> original_value fields of that source field.
"""

from __future__ import annotations

import json
from pathlib import Path

from carrot_transform_spark.omop.ddl import OmopSchemas
from carrot_transform_spark.rules.ir import (
    ConceptMapping,
    DateMapping,
    PersonIdMapping,
    RuleSet,
    TableMapping,
)


def load_rules(path: str | Path, omop: OmopSchemas) -> RuleSet:
    data = json.loads(Path(path).read_text())
    return parse_rules(data, omop)


def parse_rules(data: dict, omop: OmopSchemas) -> RuleSet:
    dataset = data.get("metadata", {}).get("dataset", "Unknown")
    if _is_v2(data):
        return RuleSet(dataset_name=dataset, mappings=_parse_v2(data), dialect="v2")
    return RuleSet(dataset_name=dataset, mappings=_parse_v1(data, omop), dialect="v1")


def _is_v2(data: dict) -> bool:
    for table_data in data.get("cdm", {}).values():
        if isinstance(table_data, dict):
            for value in table_data.values():
                if isinstance(value, dict) and all(
                    k in value
                    for k in ("person_id_mapping", "date_mapping", "concept_mappings")
                ):
                    return True
    return False


def _parse_v2(data: dict) -> dict[str, dict[str, TableMapping]]:
    out: dict[str, dict[str, TableMapping]] = {}
    for target, table_data in data["cdm"].items():
        out[target] = {}
        for source_table, m in table_data.items():
            pid = None
            if "person_id_mapping" in m:
                pid = PersonIdMapping(
                    source_field=m["person_id_mapping"]["source_field"],
                    dest_field=m["person_id_mapping"]["dest_field"],
                )
            dm = None
            if "date_mapping" in m:
                dests = m["date_mapping"]["dest_field"]
                if isinstance(dests, str):
                    dests = [dests]
                dm = DateMapping(source_field=m["date_mapping"]["source_field"], dest_fields=list(dests))
            cms: dict[str, ConceptMapping] = {}
            for source_field, fm in m.get("concept_mappings", {}).items():
                orig = list(fm.get("original_value", []))
                vm = {
                    value: {d: list(ids) for d, ids in dest_map.items()}
                    for value, dest_map in fm.items()
                    if value != "original_value"
                }
                cms[source_field] = ConceptMapping(
                    source_field=source_field, value_mappings=vm, original_value_fields=orig
                )
            out[target][source_table] = TableMapping(
                target_table=target,
                source_table=source_table,
                person_id_mapping=pid,
                date_mapping=dm,
                concept_mappings=cms,
            )
    return out


def _parse_v1(data: dict, omop: OmopSchemas) -> dict[str, dict[str, TableMapping]]:
    out: dict[str, dict[str, TableMapping]] = {}
    for target, rules_set in data["cdm"].items():
        per_source: dict[str, TableMapping] = {}
        person_col = omop.person_col(target) if omop.has_table(target) else None
        dt_fields = set(omop.table(target).datetime_fields) if omop.has_table(target) else set()
        d_fields = set(omop.table(target).date_fields) if omop.has_table(target) else set()
        for _rule_name, rule in rules_set.items():
            # source_table should be unique within one rule; group dest fields
            src_tables = {si["source_table"] for si in rule.values()}
            for src in src_tables:
                tm = per_source.get(src)
                if tm is None:
                    tm = TableMapping(
                        target_table=target,
                        source_table=src,
                        person_id_mapping=None,
                        date_mapping=None,
                        concept_mappings={},
                    )
                    per_source[src] = tm
                _merge_v1_rule(tm, rule, src, person_col, dt_fields, d_fields)
        out[target] = per_source
    return out


def _merge_v1_rule(
    tm: TableMapping,
    rule: dict,
    src: str,
    person_col: str | None,
    dt_fields: set[str],
    d_fields: set[str],
) -> None:
    # v1 applies derived date artifacts (linked *_date companion, y/m/d
    # components) only to the LAST dest listed per source field in the rule
    # (core.py: date handling runs after the outfield loop on its final
    # element) — track encounter order to find it.
    date_dests_in_rule: list[str] = []
    for dest_field, si in rule.items():
        if si["source_table"] != src:
            continue
        source_field = si["source_field"]
        term = si.get("term_mapping")
        if dest_field == person_col and term is None:
            tm.person_id_mapping = PersonIdMapping(source_field=source_field, dest_field=dest_field)
        elif term is None and (dest_field in dt_fields or dest_field in d_fields):
            if tm.date_mapping is None:
                tm.date_mapping = DateMapping(
                    source_field=source_field, dest_fields=[], companion_dests=[]
                )
            if dest_field not in tm.date_mapping.dest_fields:
                tm.date_mapping.dest_fields.append(dest_field)
            date_dests_in_rule.append(dest_field)
        elif term is not None and isinstance(term, dict):
            cm = tm.concept_mappings.setdefault(
                source_field, ConceptMapping(source_field=source_field)
            )
            for value, concept in term.items():
                dest_map = cm.value_mappings.setdefault(str(value), {})
                ids = dest_map.setdefault(dest_field, [])
                cid = int(concept)
                if cid not in ids:
                    ids.append(cid)
        elif term is not None:
            cm = tm.concept_mappings.setdefault(
                source_field, ConceptMapping(source_field=source_field)
            )
            dest_map = cm.value_mappings.setdefault("*", {})
            ids = dest_map.setdefault(dest_field, [])
            cid = int(term)
            if cid not in ids:
                ids.append(cid)
        else:
            cm = tm.concept_mappings.setdefault(
                source_field, ConceptMapping(source_field=source_field)
            )
            if dest_field not in cm.original_value_fields:
                cm.original_value_fields.append(dest_field)
    if date_dests_in_rule and tm.date_mapping is not None:
        last = date_dests_in_rule[-1]
        assert tm.date_mapping.companion_dests is not None
        if last not in tm.date_mapping.companion_dests:
            tm.date_mapping.companion_dests.append(last)
