"""Date normalisation as pure Column expressions (no UDFs).

Replicates the reference's two distinct validators:

- ``normalise_to8601`` (date_helpers.py:31-83): PERMISSIVE digit-shape
  regexes — prefix-matched, so calendar-invalid dates like 2020-99-99 pass
  and trailing garbage is ignored. Output "YYYY-MM-DD HH:MM:SS" (time
  defaults 00:00:00), NULL when the date part doesn't match.
- ``strict_date`` (date_helpers.py:9-28 get_datetime_value /
  validation.py:13-63): strict strptime against %Y-%m-%d, %d-%m-%Y,
  %d/%m/%Y — calendar-validating.

Everything is regexp_extract / lpad / concat — JVM-side, codegen-friendly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# prefix-match (no trailing anchor), like the reference's re.match
_ISO_RE = r"^(\d{4})[-/](\d{2})[-/](\d{2})"
_REV_RE = r"^(\d{2})[-/](\d{2})[-/](\d{4})"
_TIME_RE = r"^(\d{2}):(\d{2})(:(\d{2})(\.\d{6})?)?"


def _pad(col: Column, n: int) -> Column:
    # str(int(x)).zfill(n): strips leading zeros then left-pads
    return F.lpad(col.cast("int").cast("string"), n, "0")


def normalise_to8601(col: Column) -> Column:
    """Permissive normalisation to 'YYYY-MM-DD HH:MM:SS'; NULL on no-match."""
    date_part = F.split(col, " ").getItem(0)
    # the reference parses the time token ONLY when the split has exactly
    # two elements (date_helpers.py: len(item.split(' ')) == 2); with any
    # trailing token the time defaults to 00:00:00
    time_part = F.when(F.size(F.split(col, " ")) == 2, F.split(col, " ").getItem(1))

    iso_y = F.regexp_extract(date_part, _ISO_RE, 1)
    iso_m = F.regexp_extract(date_part, _ISO_RE, 2)
    iso_d = F.regexp_extract(date_part, _ISO_RE, 3)
    rev_d = F.regexp_extract(date_part, _REV_RE, 1)
    rev_m = F.regexp_extract(date_part, _REV_RE, 2)
    rev_y = F.regexp_extract(date_part, _REV_RE, 3)

    ymd = F.when(
        iso_y != "", F.concat_ws("-", _pad(iso_y, 4), _pad(iso_m, 2), _pad(iso_d, 2))
    ).when(rev_y != "", F.concat_ws("-", _pad(rev_y, 4), _pad(rev_m, 2), _pad(rev_d, 2)))

    t_h = F.regexp_extract(time_part, _TIME_RE, 1)
    t_m = F.regexp_extract(time_part, _TIME_RE, 2)
    t_s = F.regexp_extract(time_part, _TIME_RE, 4)
    time_str = F.when(
        time_part.isNotNull() & (t_h != ""),
        F.concat_ws(
            ":",
            _pad(t_h, 2),
            _pad(t_m, 2),
            _pad(F.when(t_s != "", t_s).otherwise(F.lit("0")), 2),
        ),
    ).otherwise(F.lit("00:00:00"))

    return F.when(ymd.isNotNull(), F.concat(ymd, F.lit(" "), time_str))


def strict_date(col: Column) -> Column:
    """Strict multi-format date parse -> DateType; NULL when invalid.

    Python's strptime (the reference validator) only accepts years >= 1,
    while Spark's 'yyyy' pattern happily parses 0000 into a proleptic
    year-0 date — guard the range so both reject it."""
    d = F.coalesce(
        F.try_to_date(col, "yyyy-M-d"),
        F.try_to_date(col, "d-M-yyyy"),
        F.try_to_date(col, "d/M/yyyy"),
    )
    return F.when(F.year(d) >= 1, d)


def strict_date_sql(expr: str) -> str:
    """SQL-text twin of strict_date for the string-assembled record plans."""
    d = (
        f"COALESCE(try_to_date({expr}, 'yyyy-M-d'), "
        f"try_to_date({expr}, 'd-M-yyyy'), try_to_date({expr}, 'd/M/yyyy'))"
    )
    return f"(CASE WHEN year({d}) >= 1 THEN {d} END)"


def valid_value(col: Column) -> Column:
    """Non-blank check (validation.py:8-10)."""
    return F.trim(col) != ""
