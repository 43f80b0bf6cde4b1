"""OMOP CDM DDL parsing -> per-table schema metadata + Spark StructTypes.

Re-implements the semantics of the reference's runtime DDL scan
(/root/reference/carrottransform/tools/omopcdm.py:51-128): a PostgreSQL DDL
file is parsed with regexes into, per table, the ordered column list and
the type-role classifications the pipeline needs:

- numeric fields        (integer / numeric)
- NOT NULL numeric      (pre-filled with "0" in every output record)
- datetime fields       (timestamp)
- date fields           (date)

plus the overlay config (omopcdm.py:133-137 merge_json) carrying
datetime_linked_fields, date_field_components, person_id_field and
auto_number_field.

The data plane stays stringly-typed (outputs are byte-compatible TSVs);
``struct_type`` offers the typed Spark schema for consumers that want
typed parquet outputs instead.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql.types import (
    DateType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

NUMERIC_TYPES = ("integer", "numeric")
DATETIME_TYPES = ("timestamp",)
DATE_TYPES = ("date",)

_VER_RE = re.compile(r"^--postgresql.*(\d+\.\d+)$")
_START_RE = re.compile(r"^CREATE\s*TABLE\s*(@?[a-zA-Z]+\.)?([a-zA-Z_]+)")
_COL_RE = re.compile(r"^\s*([a-z_]+)\s+([a-zA-Z_]+)")
_END_RE = re.compile(r".*[)];$")


@dataclass
class TableSchema:
    name: str
    columns: list[str] = field(default_factory=list)
    numeric_fields: list[str] = field(default_factory=list)
    notnull_numeric_fields: list[str] = field(default_factory=list)
    datetime_fields: list[str] = field(default_factory=list)
    date_fields: list[str] = field(default_factory=list)

    def column_index(self) -> dict[str, int]:
        # case-insensitive resolve, like the reference's CaseInsensitiveDict
        return {c.lower(): i for i, c in enumerate(self.columns)}

    def struct_type(self) -> StructType:
        fields = []
        for c in self.columns:
            if c in self.numeric_fields:
                t = IntegerType()
            elif c in self.datetime_fields:
                t = TimestampType()
            elif c in self.date_fields:
                t = DateType()
            else:
                t = StringType()
            fields.append(StructField(c, t, nullable=True))
        return StructType(fields)


@dataclass
class OmopSchemas:
    tables: dict[str, TableSchema]
    version: str | None
    # config overlays (all keyed by table name)
    datetime_linked_fields: dict[str, dict[str, str]] = field(default_factory=dict)
    date_field_components: dict[str, dict[str, dict[str, str]]] = field(default_factory=dict)
    person_id_field: dict[str, str] = field(default_factory=dict)
    auto_number_field: dict[str, str] = field(default_factory=dict)

    def table(self, name: str) -> TableSchema:
        return self.tables[name.lower()]

    def has_table(self, name: str) -> bool:
        return name.lower() in self.tables

    def linked_date_fields(self, table: str) -> dict[str, str]:
        return self.datetime_linked_fields.get(table, {})

    def date_components(self, table: str) -> dict[str, dict[str, str]]:
        return self.date_field_components.get(table, {})

    def person_col(self, table: str) -> str | None:
        return self.person_id_field.get(table)

    def auto_number_col(self, table: str) -> str | None:
        return self.auto_number_field.get(table)


def parse_ddl(text: str) -> tuple[dict[str, TableSchema], str | None]:
    tables: dict[str, TableSchema] = {}
    version: str | None = None
    current: TableSchema | None = None
    for raw in text.splitlines():
        line = raw.strip()
        if version is None:
            m = _VER_RE.search(line)
            if m:
                version = m.group(1)
        if current is None:
            m = _START_RE.search(line)
            if m:
                name = m.group(2).lower()
                current = tables.setdefault(name, TableSchema(name=name))
        else:
            m = _COL_RE.search(line)
            if m:
                fname, ftype = m.group(1), m.group(2).lower()
                current.columns.append(fname)
                if ftype in NUMERIC_TYPES:
                    current.numeric_fields.append(fname)
                    if "NOT" in line and "NULL" in line:
                        current.notnull_numeric_fields.append(fname)
                if ftype in DATETIME_TYPES:
                    current.datetime_fields.append(fname)
                if ftype in DATE_TYPES:
                    current.date_fields.append(fname)
        if _END_RE.search(line):
            current = None
    return tables, version


def load_schemas(ddl_path: str | Path, config_path: str | Path) -> OmopSchemas:
    from carrot_transform_spark.atpath import convert_path

    tables, version = parse_ddl(convert_path(ddl_path).read_text())
    cfg = json.loads(convert_path(config_path).read_text())
    return OmopSchemas(
        tables=tables,
        version=version,
        datetime_linked_fields=cfg.get("datetime_linked_fields", {}),
        date_field_components=cfg.get("date_field_components", {}),
        person_id_field=cfg.get("person_id_field", {}),
        auto_number_field=cfg.get("auto_number_field", {}),
    )
