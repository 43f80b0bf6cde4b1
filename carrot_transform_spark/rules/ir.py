"""Canonical mapping-rules IR.

Both rules dialects (v1 legacy and v2) normalize into this one
representation, shaped after the cleaner v2 dialect (reference:
/root/reference/carrottransform/tools/mapping_types.py:5-31). The IR is the
"logical plan" input to the Spark compiler:

    RuleSet
      └─ per (target_table, source_table): TableMapping
           ├─ person_id_mapping : source col -> dest col
           ├─ date_mapping      : source col -> [dest datetime cols]
           └─ concept_mappings  : source col -> ConceptMapping
                ├─ value_mappings : source value (or "*") ->
                │                     {dest_field: [concept ids]}
                └─ original_value_fields : dest cols receiving the raw cell
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PersonIdMapping:
    source_field: str
    dest_field: str


@dataclass
class DateMapping:
    source_field: str
    dest_fields: list[str]
    # dest fields that also receive the derived date artifacts (the linked
    # *_date companion / year-month-day components). v2 applies them to every
    # dest (record_builder.py:85-147); v1 only to the LAST dest listed per
    # source field in each rule (core.py:104-154 uses the loop's final
    # output_col_data). None means "all dest_fields".
    companion_dests: list[str] | None = None

    def companions(self) -> list[str]:
        return self.dest_fields if self.companion_dests is None else self.companion_dests


@dataclass
class ConceptMapping:
    source_field: str
    # source value (or "*" wildcard) -> dest_field -> ordered concept ids
    value_mappings: dict[str, dict[str, list[int]]] = field(default_factory=dict)
    original_value_fields: list[str] = field(default_factory=list)
    # v1 BLOCK companions (reference core.py get_target_records: a v1 rule
    # block is ONE record shape keyed on its trigger field, and every other
    # source field in the block rides along in the SAME record):
    #   copy_fields    — (dest_field, other_source_field) raw-cell copies
    #                    (e.g. value_as_number <- val in a concept-keyed
    #                    block);
    #   extra_literals — dest_field -> literal written unconditionally
    #                    (a term mapping on a NON-trigger field collapses to
    #                    its last term, mappingrules.process_rules last-write-
    #                    wins).
    # v2 blocks and person targets never populate these.
    copy_fields: list[tuple[str, str]] = field(default_factory=list)
    extra_literals: dict[str, str] = field(default_factory=dict)
    # source fields of the extra_literals writes — they are DATA COLUMNS in
    # the reference's per-datacol iteration, so blank-cell metrics count
    # them even though no record is keyed on them
    companion_term_fields: list[str] = field(default_factory=list)
    # v1 NON-person blocks: this block's OWN date writes as ordered
    # (source_field, dest_field) pairs — each block writes only the date
    # dests its rule mapped, from its own columns (core.py iterates the
    # block's data entries; nothing is shared across blocks). The LAST
    # pair's dest carries the derived artifacts (linked *_date twin),
    # matching the reference's loop-final date handling. Empty for v2
    # (single per-target date mapping) and for person buckets (which use
    # PersonBucket.date_fields).
    date_writes: list[tuple[str, str]] = field(default_factory=list)
    # the dests that actually receive derived artifacts: core.py runs the
    # date handling once per source field on the field's FINAL data entry —
    # so a field whose last entry is a term/plain/person-id write gets NO
    # twin even though its date dest was written. None = derive as the
    # last date dest per source field (pre-tracking IR constructions).
    date_companions: list[str] | None = None
    # v1 PERSON-only: plain copies gated on ONE exact source value — the
    # reference's process_rules attaches a plain dest of a dict-mapped
    # field to data[field][inputvalue], where `inputvalue` is the STALE
    # last value of the most recent dict iterated (mappingrules.py:398-404:
    # plain-after-dict rides the dict's LAST value; plain-before-dict is
    # folded into the dict's FIRST value by the TypeError conversion at
    # mappingrules.py:355-364). value -> dest fields.
    value_original_fields: dict[str, list[str]] = field(default_factory=dict)


@dataclass
class PersonBucket:
    """v1 person rule-sets partition by their process_rules key
    (mappingrules.py:369-421): a rule-set with any DICT term map gets
    term_value_key '<file>~person' (key_field None here); a rule-set with
    only SCALAR terms gets plain_key '<file>~<last-scalar-field>~person'
    (key_field = that field); a rule-set with no term_mapping at all
    returns key '' and is DROPPED before the merge
    (parse_rules_src_to_tgt:325 'if key != ""'). Rule-sets sharing a key
    merge with dict.update/replace semantics INSIDE the bucket; distinct
    keys never merge. Record build (core.py:49-66) consults the dict
    bucket plus the scalar bucket whose key_field equals the row's FIRST
    data column — emitting one record per consulted bucket."""

    key_field: str | None  # None = the '<file>~person' dict bucket
    concept_mappings: dict[str, ConceptMapping] = field(default_factory=dict)
    # whether any rule-set merged into this bucket mapped the person-id /
    # a date dest: a bucket WITHOUT them builds records with a blank
    # person id (rejected at the person-lookup, counted invalid_person_ids)
    # / no date writes and NO strict-date gate (core.py only runs the date
    # handling for fields present in the bucket's own data)
    maps_person_id: bool = False
    maps_date: bool = False
    # the bucket's person-id SOURCE fields in data-dict insertion order —
    # the LAST one wins the person_id write (each data[field] entry writes
    # the dest in iteration order; re-mapping an existing field keeps its
    # original dict position, so insertion order is the write order)
    pid_fields: list[str] = field(default_factory=list)
    # same for date SOURCE fields: the bucket's record writes its date
    # dests from date_fields[-1] — normalised in place when that column is
    # the file's MAIN datetime column, RAW otherwise (run.py:230-235
    # mutates only the main column; core.py reads srcdata[infield])
    date_fields: list[str] = field(default_factory=list)


@dataclass
class TableMapping:
    target_table: str
    source_table: str
    person_id_mapping: PersonIdMapping | None
    date_mapping: DateMapping | None
    # insertion order matters: for the person table, later fields overwrite
    # earlier fields on dest-field collisions (reference
    # record_builder.py:271-272)
    concept_mappings: dict[str, ConceptMapping] = field(default_factory=dict)
    # v1 person ONLY (None otherwise): the process_rules key buckets in
    # creation order; concept_mappings is then their ordered UNION (bucket
    # creation order, per-bucket field insertion order) — the datacol
    # enumeration the reference derives in _get_infile_data_fields_v1
    v1_person_buckets: list[PersonBucket] | None = None
    # v1 person ONLY: the LOOKUP-side (dob, pid) source fields. The
    # reference's _get_person_source_field_info_v1 scans the RAW rules —
    # including term-less rule-sets that parse_rules_src_to_tgt drops —
    # last-wins on the literal dest names 'birth_datetime'/'person_id', so
    # a dropped rule-set can steer which columns read_person_ids keys the
    # person map on, independently of what the records write
    person_lookup_sources: tuple[str | None, str | None] | None = None
    # v1 ONLY: every date SOURCE field in outdata scan order (bucket/block
    # creation order, per-entry field insertion order, duplicates kept,
    # DROPPED term-less entries excluded). The file's MAIN datetime column
    # is the LAST element across the file's targets — the reference's
    # _get_infile_date_person_id_v1 last-wins scan
    v1_date_sources: list[str] | None = None


@dataclass
class RuleSet:
    dataset_name: str
    # target_table -> source_table -> TableMapping
    mappings: dict[str, dict[str, TableMapping]] = field(default_factory=dict)
    # source dialect: person-table semantics differ —
    #   v1 (run.py:301-302, core.py:51-102): one person record per input row,
    #      gated on the FIRST data column being non-blank, no person dedup,
    #      no combination explosion (later concept assignments overwrite),
    #      original values applied only when the field's value matched;
    #   v2 (record_builder.py:199-247): once per (source file, person id),
    #      clamped-zip combinations, original values on any non-blank cell.
    dialect: str = "v2"

    def targets(self) -> list[str]:
        return list(self.mappings)

    def sources_for(self, target: str) -> list[str]:
        return list(self.mappings.get(target, {}))

    def source_tables(self) -> list[str]:
        seen: dict[str, None] = {}
        for per_target in self.mappings.values():
            for src in per_target:
                seen.setdefault(src, None)
        return list(seen)

    def targets_for_source(self, source_table: str) -> list[str]:
        return [t for t, per in self.mappings.items() if source_table in per]

    def person_source_info(self, person_target: str = "person") -> tuple[str, str]:
        """(birth_datetime_source_field, person_id_source_field) for the person
        table rules — reference mappingrules.get_person_source_field_info.
        v1: the raw-rules scan recorded at parse time (includes dropped
        term-less rule-sets, last-wins); v2: the parsed mappings."""
        per = self.mappings.get(person_target, {})
        for tm in per.values():
            if tm.person_lookup_sources is not None:
                date_src, pid_src = tm.person_lookup_sources
                return date_src or "", pid_src or ""
            date_src = tm.date_mapping.source_field if tm.date_mapping else ""
            pid_src = tm.person_id_mapping.source_field if tm.person_id_mapping else ""
            return date_src, pid_src
        raise ValueError(f"no rules for person target table '{person_target}'")
