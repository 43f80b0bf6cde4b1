"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet dir and
compares row count, column names, and an order-insensitive value hash
(rows sorted, columns sorted by name, values stringified).
"""

from __future__ import annotations

import hashlib
import math
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


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, name: str, spark_fn, oracle: str, sf_dir: str
) -> CompareResult:
    sdf = spark_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    s_hash = _hash_rows(s_cols, s_rows)
    o_hash = _hash_rows(o_cols, o_rows)
    ok = (
        len(s_rows) == len(o_rows)
        and sorted(s_cols) == sorted(o_cols)
        and s_hash == o_hash
    )
    detail = ""
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
