"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet dir and
compares row count, column names, and an order-insensitive value hash
(rows sorted, columns sorted by name, values stringified).
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass
from datetime import date, datetime

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon_rows:
        h.update(row.encode("utf-8"))
        h.update(b"\x1e")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    spark_cols: list[str]
    oracle_cols: list[str]
    spark_hash: str
    oracle_hash: str
    detail: str = ""


def _duck_kind(t: str) -> str:
    """Collapse a DuckDB logical type to a comparison kind. HUGEINT is
    deliberately NOT integer-compatible: the driver's comparison renders it
    through pandas as float64 ('1764.0' vs Spark's '1764'), which is exactly
    the round-1 hash-fail mode — force an explicit CAST in the oracle."""
    t = t.upper()
    if t.startswith("DECIMAL"):
        return "dec"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "i"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "f"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    if t == "VARCHAR":
        return "s"
    if t == "BOOLEAN":
        return "b"
    return t.lower()


def _spark_kind(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "dec"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if t in ("float", "double"):
        return "f"
    if t.startswith("timestamp"):
        return "ts"
    if t == "date":
        return "date"
    if t == "string":
        return "s"
    if t == "boolean":
        return "b"
    return t


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # big scale factors (gen_sf_big factor>10) store each table as a
        # DIRECTORY of part files named <t>.parquet/ — glob those for DuckDB
        # (Spark reads either layout transparently)
        p = f"{sf_dir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    return con


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, spark_fn, oracle: str, sf_dir: str
) -> CompareResult:
    sdf = spark_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_kinds = {c: _spark_kind(t) for c, t in sdf.dtypes}
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(oracle)
    o_cols = list(rel.columns)
    o_kinds = {c: _duck_kind(str(t)) for c, t in zip(rel.columns, rel.types)}
    o_rows = rel.fetchall()
    s_hash = _hash_rows(s_cols, s_rows)
    o_hash = _hash_rows(o_cols, o_rows)
    kind_mismatch = [
        (c, s_kinds.get(c), o_kinds.get(c))
        for c in sorted(set(s_cols) | set(o_cols))
        if s_kinds.get(c) != o_kinds.get(c)
    ]
    ok = (
        len(s_rows) == len(o_rows)
        and sorted(s_cols) == sorted(o_cols)
        and not kind_mismatch
        and s_hash == o_hash
    )
    detail = ""
    if kind_mismatch:
        detail = f"type-kind mismatch (col, spark, duck): {kind_mismatch}"
    if not ok and len(s_rows) == len(o_rows) and sorted(s_cols) == sorted(o_cols):
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        srt_s = sorted("\x1f".join(_canon(r[i]) for i in order_s) for r in s_rows)
        srt_o = sorted("\x1f".join(_canon(r[i]) for i in order_o) for r in o_rows)
        for a, b in zip(srt_s, srt_o):
            if a != b:
                detail = f"first diff:\n  spark : {a[:400]}\n  oracle: {b[:400]}"
                break
    return CompareResult(
        name, ok, len(s_rows), len(o_rows), s_cols, o_cols, s_hash, o_hash, detail
    )
