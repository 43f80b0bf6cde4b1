"""Shared scalar/expression helpers used across operators and oracle twins."""

from __future__ import annotations


def sql_str(s: str) -> str:
    """Render a Python string as a single-quoted ANSI SQL literal.

    Oracle-twin SQL builders interpolate user-supplied values (step names,
    strata, split labels, salts) into generated SQL; quote-doubling is the
    ANSI escape, understood by DuckDB and Spark SQL alike, and prevents a
    value containing ' from breaking (or injecting into) the query.
    """
    return "'" + str(s).replace("'", "''") + "'"
