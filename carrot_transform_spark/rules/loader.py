"""Mapping-rules JSON loader: v1/v2 auto-detect, both normalized to the IR.

Dialect detection mirrors the reference (mappingrules.py:42-60): a rules file
is v2 when any cdm.<table>.<source> value carries the three mapping-type
keys. v2 parses 1:1 into the IR (mappingrules.py:62-117). v1 (the legacy
Carrot-Mapper output, parsed at mappingrules.py:312-429 into tilde-keyed
lookup dicts) is converted block-faithfully for non-person targets (one
ConceptMapping per rule block, keyed on the block's single emission
trigger — see _merge_v1_block; uniform same-shape blocks fold back into
multi-value CMs so large generated rule files keep the merged fast paths),
while person rule-sets partition into process_rules KEY BUCKETS
(_merge_v1_rule): rule-sets with any dict term merge under '<file>~person',
scalar-only rule-sets under '<file>~<last-scalar-field>~person' (merging =
dict.update at value level for dict-kind fields, wholesale replace for
list-kind ones, mappingrules.py:331-341), and rule-sets with no
term_mapping at all are dropped before the merge. Record build emits one
record per consulted bucket (ir.PersonBucket). Person-id and date dests
register at TableMapping level for every target, with per-bucket presence
flags for the person table.
"""

from __future__ import annotations

import json
from pathlib import Path

from carrot_transform_spark.omop.ddl import OmopSchemas
from carrot_transform_spark.rules.ir import (
    ConceptMapping,
    DateMapping,
    PersonBucket,
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
                if target == "person":
                    # person rule-sets MERGE into one record shape
                    # (mappingrules.parse_rules_src_to_tgt updates the single
                    # file~person data dict across blocks)
                    _merge_v1_rule(tm, rule, src, person_col, dt_fields, d_fields)
                else:
                    # every other target emits records PER BLOCK, keyed on
                    # the block's trigger field (process_rules returns one
                    # key per block; get_target_records emits one record per
                    # registered block data)
                    _merge_v1_block(tm, rule, src, person_col, dt_fields, d_fields)
        if target == "person":
            # LOOKUP-side sources: the reference scans the RAW rules —
            # term-less (dropped) rule-sets included — last-wins on the
            # literal 'birth_datetime'/'person_id' dest names
            # (_get_person_source_field_info_v1, mappingrules.py:293-310)
            raw_dob: str | None = None
            raw_pid: str | None = None
            for rule in rules_set.values():
                if "birth_datetime" in rule:
                    raw_dob = rule["birth_datetime"]["source_field"]
                if "person_id" in rule:
                    raw_pid = rule["person_id"]["source_field"]
            for tm in per_source.values():
                tm.person_lookup_sources = (raw_dob, raw_pid)
        out[target] = per_source
    return out


def _merge_v1_block(
    tm: TableMapping,
    rule: dict,
    src: str,
    person_col: str | None,
    dt_fields: set[str],
    d_fields: set[str],
) -> None:
    """One NON-person v1 rule block -> one block-level ConceptMapping.

    Reference semantics (mappingrules.process_rules + core.get_target_records):
    a block is ONE record shape with a single emission trigger —
    - any dict ``term_mapping`` present: trigger = the LAST dict field's
      LAST value (term_value_key is overwritten per (field, value) in rule
      order), and each term-mapped dest receives its field's LAST term
      (data[field] appends outfield~term per value; the record write loop
      makes the last one win). A multi-entry dict therefore behaves exactly
      like the single-entry {last_value: last_term};
    - else a scalar ``term_mapping``: trigger = that field with the
      wildcard "*" match (plain_key — fires for any non-blank value; the
      LAST scalar field in rule order wins the key);
    - no term_mapping at all: key stays "" and the block emits nothing
      (parse_rules_src_to_tgt drops empty keys) — its person-id/date
      contributions still register.
    Every OTHER field in the block rides in the SAME record: plain fields
    copy their own cell (copy_fields; original_value_fields when the source
    IS the trigger field), and term maps on non-trigger fields write their
    last term as unconditional literals (extra_literals).

    Blocks fold together only when their SHAPE matches (same trigger field,
    companions, and per-value dest set — see the merge step below); anything
    else registers under a synthetic '<field>#<n>' key
    (ConceptMapping.source_field keeps the real column; the compiler
    resolves columns from it, never from the key)."""
    date_dests_in_rule: list[str] = []
    date_srcs_in_rule: list[str] = []  # date SOURCE fields, first-touch order
    date_writes_in_rule: list[tuple[str, str]] = []  # (source, dest) in rule order
    last_is_date: dict[str, bool] = {}  # per source field: is its FINAL entry a date dest
    trigger_field: str | None = None
    trigger_value: str | None = None  # None => wildcard trigger
    scalar_trigger: str | None = None
    term_writes: dict[str, dict[str, int]] = {}  # field -> dest -> last term
    last_value: dict[str, str] = {}  # dict-mapped field -> its last value
    plain_writes: list[tuple[str, str]] = []  # (dest, source field)

    for dest_field, si in rule.items():
        if si["source_table"] != src:
            continue
        source_field = si["source_field"]
        term = si.get("term_mapping")
        if dest_field == person_col and term is None:
            tm.person_id_mapping = PersonIdMapping(
                source_field=source_field, dest_field=dest_field
            )
            last_is_date[source_field] = False
        elif term is None and (dest_field in dt_fields or dest_field in d_fields):
            last_is_date[source_field] = True
            if tm.date_mapping is None:
                tm.date_mapping = DateMapping(
                    source_field=source_field, dest_fields=[], companion_dests=[]
                )
            if dest_field not in tm.date_mapping.dest_fields:
                tm.date_mapping.dest_fields.append(dest_field)
            date_dests_in_rule.append(dest_field)
            date_writes_in_rule.append((source_field, dest_field))
            if source_field not in date_srcs_in_rule:
                date_srcs_in_rule.append(source_field)
        elif term is not None and isinstance(term, dict):
            if not term:
                continue
            lv = str(list(term)[-1])
            last_value[source_field] = lv
            term_writes.setdefault(source_field, {})[dest_field] = int(term[list(term)[-1]])
            trigger_field = source_field  # last dict field wins the key
            trigger_value = lv
            last_is_date[source_field] = False
        elif term is not None:
            term_writes.setdefault(source_field, {})[dest_field] = int(term)
            scalar_trigger = source_field  # last scalar field wins plain_key
            last_is_date[source_field] = False
        else:
            plain_writes.append((dest_field, source_field))
            last_is_date[source_field] = False

    if date_dests_in_rule and tm.date_mapping is not None:
        last = date_dests_in_rule[-1]
        assert tm.date_mapping.companion_dests is not None
        if last not in tm.date_mapping.companion_dests:
            tm.date_mapping.companion_dests.append(last)

    if trigger_field is None:
        trigger_field = scalar_trigger
        trigger_value = None
    if trigger_field is None:
        return  # no term mapping anywhere: empty key, block emits nothing
    # this block SURVIVES into outdata: its date sources join the main-
    # datetime scan sequence (dropped blocks above contribute nothing there)
    if date_srcs_in_rule:
        if tm.v1_date_sources is None:
            tm.v1_date_sources = []
        tm.v1_date_sources.extend(date_srcs_in_rule)
    if trigger_value is not None:
        # the trigger field's dict may not be the LAST dict field iterated;
        # the key still uses the last dict field's last value
        trigger_value = last_value[trigger_field]

    cm = ConceptMapping(source_field=trigger_field)
    cm.date_writes = list(date_writes_in_rule)
    # derived artifacts only where the field's FINAL entry is a date dest
    last_date_dest: dict[str, str] = {}
    for src_w, dest_w in date_writes_in_rule:
        last_date_dest[src_w] = dest_w
    cm.date_companions = [
        dest_w for src_w, dest_w in last_date_dest.items() if last_is_date.get(src_w)
    ]
    match_key = trigger_value if trigger_value is not None else "*"
    cm.value_mappings[match_key] = {
        dest: [term] for dest, term in term_writes.get(trigger_field, {}).items()
    }
    for fld, writes in term_writes.items():
        if fld == trigger_field:
            continue
        if fld not in cm.companion_term_fields:
            cm.companion_term_fields.append(fld)
        for dest, term in writes.items():
            cm.extra_literals[dest] = str(term)
    for dest, fld in plain_writes:
        if fld == trigger_field:
            if dest not in cm.original_value_fields:
                cm.original_value_fields.append(dest)
        else:
            cm.copy_fields.append((dest, fld))

    # SHAPE-AWARE merge: real v1 rule files carry thousands of uniform
    # blocks (one per mapped value, identical companions and dest sets).
    # One ConceptMapping per block would compile a per-block record builder
    # — a plan explosion the old merged loader never had — so blocks whose
    # shape matches an existing CM (same trigger field, original/copy/
    # literal companions, and per-value dest set) fold back into it:
    # per-value emission and writes are identical either way (equal dest
    # sets make the clamped-zip combos reproduce block-wise records in
    # block order), and the maplit/broadcast-join large-map paths stay
    # reachable. Non-uniform blocks keep their own CM under a synthetic
    # '<field>#<n>' key.
    dest_set = tuple(sorted(cm.value_mappings[match_key]))
    sig = (
        trigger_field,
        tuple(cm.original_value_fields),
        tuple(cm.copy_fields),
        tuple(sorted(cm.extra_literals.items())),
        tuple(cm.companion_term_fields),
        tuple(cm.date_writes),
        tuple(cm.date_companions or ()),
        dest_set,
    )
    for existing in tm.concept_mappings.values():
        if existing.source_field != trigger_field:
            continue
        e_dests = {tuple(sorted(m)) for m in existing.value_mappings.values()}
        e_sig = (
            existing.source_field,
            tuple(existing.original_value_fields),
            tuple(existing.copy_fields),
            tuple(sorted(existing.extra_literals.items())),
            tuple(existing.companion_term_fields),
            tuple(existing.date_writes),
            tuple(existing.date_companions or ()),
            dest_set if {dest_set} == e_dests else None,
        )
        if e_sig != sig:
            continue
        tgt = existing.value_mappings.setdefault(match_key, {})
        for dest, ids in cm.value_mappings[match_key].items():
            lst = tgt.setdefault(dest, [])
            for cid in ids:
                if cid not in lst:
                    lst.append(cid)
        return

    key = trigger_field
    n = 1
    while key in tm.concept_mappings:
        key = f"{trigger_field}#{n}"
        n += 1
    tm.concept_mappings[key] = cm


def _merge_v1_rule(
    tm: TableMapping,
    rule: dict,
    src: str,
    person_col: str | None,
    dt_fields: set[str],
    d_fields: set[str],
) -> None:
    # process_rules key pre-scan (mappingrules.py:366-421): any DICT term
    # sets term_value_key '<file>~person'; a scalar term sets plain_key
    # '<file>~<field>~person' (LAST scalar field wins); a rule-set with no
    # term_mapping at all returns key '' and parse_rules_src_to_tgt DROPS it
    # ('if key != ""') — it contributes nothing, not even person-id/date
    # registrations (get_infile_date_person_id scans only surviving outdata)
    has_dict = False
    last_scalar: str | None = None
    for _dest, si in rule.items():
        if si["source_table"] != src:
            continue
        term = si.get("term_mapping")
        if term is None:
            continue
        if isinstance(term, dict):
            has_dict = True
        else:
            last_scalar = si["source_field"]
    if not has_dict and last_scalar is None:
        return

    # v1 applies derived date artifacts (linked *_date companion, y/m/d
    # components) only to the LAST dest listed per source field in the rule
    # (core.py: date handling runs after the outfield loop on its final
    # element) — track encounter order to find it.
    date_dests_in_rule: list[str] = []
    # Replicates process_rules' person data structure per rule-set
    # (mappingrules.py:331-429): data[field] starts as a plain LIST of
    # unconditional dests and becomes a value-keyed DICT when a dict
    # term_mapping touches the field. The dict conversion folds any
    # already-collected plain dests into the FIRST value processed, and a
    # plain dest arriving AFTER the conversion attaches to the STALE
    # `inputvalue` — the last value of the most recent dict iterated
    # (the reference raises KeyError when that stale value isn't one of
    # this field's values; those rule shapes can't run there, so they are
    # ignored here).
    rs: dict[str, dict] = {}  # field -> {kind, plains, values{v: {ids, plains}}}
    stale_value: str | None = None
    rs_maps_pid = False
    rs_maps_date = False
    rs_pid_field: str | None = None
    rs_date_fields: list[str] = []  # date SOURCE fields, first-touch order
    for dest_field, si in rule.items():
        if si["source_table"] != src:
            continue
        source_field = si["source_field"]
        term = si.get("term_mapping")
        if dest_field == person_col and term is None:
            tm.person_id_mapping = PersonIdMapping(source_field=source_field, dest_field=dest_field)
            rs_maps_pid = True
            rs_pid_field = source_field
        elif term is None and (dest_field in dt_fields or dest_field in d_fields):
            rs_maps_date = True
            if source_field not in rs_date_fields:
                rs_date_fields.append(source_field)
            if tm.date_mapping is None:
                tm.date_mapping = DateMapping(
                    source_field=source_field, dest_fields=[], companion_dests=[]
                )
            if dest_field not in tm.date_mapping.dest_fields:
                tm.date_mapping.dest_fields.append(dest_field)
            date_dests_in_rule.append(dest_field)
        elif term is not None and isinstance(term, dict):
            st = rs.setdefault(
                source_field, {"kind": "list", "plains": [], "lits": [], "values": {}}
            )
            for value, concept in term.items():
                v = str(value)
                if st["kind"] == "list":
                    # TypeError conversion: everything collected while the
                    # field was list-kind — plain dests AND scalar term
                    # writes — folds into the FIRST value processed
                    st["kind"] = "dict"
                    st["values"][v] = {
                        "ids": list(st["lits"]),
                        "plains": list(st["plains"]),
                    }
                    st["plains"] = []
                    st["lits"] = []
                elif v not in st["values"]:
                    st["values"][v] = {"ids": [], "plains": []}
                st["values"][v]["ids"].append((dest_field, int(concept)))
                stale_value = v
        elif term is not None:
            # scalar term on a person field: process_rules appends
            # 'dest~term' to the field's plain LIST (mappingrules.py:412-418)
            # and core.py applies list-kind entries UNCONDITIONALLY — the
            # term is written even for a blank cell (a scalar landing on an
            # already-dict field crashes the reference; ignored here)
            st = rs.setdefault(
                source_field, {"kind": "list", "plains": [], "lits": [], "values": {}}
            )
            if st["kind"] == "list":
                st["lits"].append((dest_field, int(term)))
        else:
            st = rs.setdefault(
                source_field, {"kind": "list", "plains": [], "lits": [], "values": {}}
            )
            if st["kind"] == "dict":
                if stale_value is not None and stale_value in st["values"]:
                    st["values"][stale_value]["plains"].append(dest_field)
            else:
                st["plains"].append(dest_field)
    # fold the rule-set into the merged mapping. Dict-kind fields REPLACE
    # at value level: the reference's cross-rule-set merge is
    # dict.update(new_rule_data) (mappingrules.py:parse_rules_src_to_tgt),
    # so a later rule-set redefining value v replaces v's whole entry list
    # — concept dests AND value-gated plains — while other values survive.
    if tm.v1_person_buckets is None:
        tm.v1_person_buckets = []
    bucket_key = None if has_dict else last_scalar
    bucket = next(
        (b for b in tm.v1_person_buckets if b.key_field == bucket_key), None
    )
    if bucket is None:
        bucket = PersonBucket(key_field=bucket_key)
        tm.v1_person_buckets.append(bucket)
    bucket.maps_person_id = bucket.maps_person_id or rs_maps_pid
    bucket.maps_date = bucket.maps_date or rs_maps_date
    if rs_pid_field is not None and rs_pid_field not in bucket.pid_fields:
        bucket.pid_fields.append(rs_pid_field)
    for f in rs_date_fields:
        if f not in bucket.date_fields:
            bucket.date_fields.append(f)
    for source_field, st in rs.items():
        cm = bucket.concept_mappings.setdefault(
            source_field, ConceptMapping(source_field=source_field)
        )
        if st["kind"] == "dict":
            # cross-rule-set merge only happens when the EXISTING entry is a
            # dict (mappingrules.py:334-341 'isinstance(..., dict)'); a
            # list-kind entry is wholesale-replaced ('just set it'), so an
            # earlier rule-set's plain dests and scalar terms are dropped
            if not cm.value_mappings and (
                cm.original_value_fields or cm.extra_literals
            ):
                cm.original_value_fields = []
                cm.extra_literals = {}
            for v, vd in st["values"].items():
                dest_map: dict[str, list[int]] = {}
                for dest, cid in vd["ids"]:
                    dest_map.setdefault(dest, []).append(cid)
                cm.value_mappings[v] = dest_map
                if vd["plains"]:
                    cm.value_original_fields[v] = list(vd["plains"])
                else:
                    cm.value_original_fields.pop(v, None)
        else:
            if cm.value_mappings:
                # existing dict-kind entry + a list-kind redefinition makes
                # the reference crash (dict.update over >2-char strings,
                # ValueError) — the shape cannot run there; leave the dict
                continue
            # wholesale replace (same 'just set it' branch): this rule-set's
            # plains/lits REPLACE whatever earlier rule-sets accumulated
            cm.original_value_fields = list(dict.fromkeys(st["plains"]))
            cm.extra_literals = {
                # unconditional write — core.py's list-kind application has
                # no valid-value check, so the term lands even on blank cells
                dest: str(cid)
                for dest, cid in st["lits"]
            }
    # ordered UNION across buckets = the reference's datacol enumeration
    # (_get_infile_data_fields_v1 iterates outdata keys in creation order,
    # fields in per-bucket insertion order)
    union: dict[str, ConceptMapping] = {}
    for b in tm.v1_person_buckets:
        for fname, bcm in b.concept_mappings.items():
            union.setdefault(fname, bcm)
    tm.concept_mappings = union
    # outdata date-source scan sequence (duplicates kept): the LAST element
    # is what _get_infile_date_person_id_v1 leaves as this target's
    # contribution to the file's main datetime column
    tm.v1_date_sources = [f for b in tm.v1_person_buckets for f in b.date_fields]
    if date_dests_in_rule and tm.date_mapping is not None:
        last = date_dests_in_rule[-1]
        assert tm.date_mapping.companion_dests is not None
        if last not in tm.date_mapping.companion_dests:
            tm.date_mapping.companion_dests.append(last)
