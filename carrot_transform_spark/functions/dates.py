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


# Canonical shapes take a one-regex fast path: the permissive pipeline
# below costs several regex matches per row (and its sheer generated-code
# size matters even when it never executes — see the JIT note on
# _normalise_to8601_permissive) — while
# real feeds are overwhelmingly one of four shapes: ISO datetime (with an
# optional trailing-zero-trimmed fraction, the timestamp->string cast
# shape), ISO date, or the two reference strict formats d-m-Y / d/m/Y.
# For inputs matching these anchored shapes the permissive pipeline
# reduces to a substring/concat (components already zero-padded; int()
# round-trips; the exactly-two-token rule is satisfied; a fractional
# second is dropped by the time regex either way), so the rewrites are
# bit-identical — pinned by tests/test_dates_property.py's independent
# model over generated inputs including all four shapes. The OMOP
# normalise stage at sf10 (10M rows) motivated this: 572 executor-seconds
# were regex evaluation (guide §1.2 step 2: per-task work).
_CANON_DT_RE = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d{1,6})?$"
_CANON_D_RE = r"^\d{4}-\d{2}-\d{2}$"
_CANON_REV_RE = r"^\d{2}([-/])\d{2}\1\d{4}$"


def normalise_to8601(col: Column) -> Column:
    """Permissive normalisation to 'YYYY-MM-DD HH:MM:SS'; NULL on no-match."""
    rev = F.concat(
        F.substring(col, 7, 4), F.lit("-"),
        F.substring(col, 4, 2), F.lit("-"),
        F.substring(col, 1, 2), F.lit(" 00:00:00"),
    )
    return (
        F.when(col.rlike(_CANON_DT_RE), F.substring(col, 1, 19))
        .when(col.rlike(_CANON_D_RE), F.concat(col, F.lit(" 00:00:00")))
        .when(col.rlike(_CANON_REV_RE), rev)
        .otherwise(_normalise_to8601_permissive(col))
    )


def _normalise_to8601_permissive(col: Column) -> Column:
    # Sized for JIT, not just for regex count: as the ELSE branch of the
    # fast-path CaseWhen this expression dominated the generated method
    # size, and at 10147 bytecode bytes the method exceeded the JVM's
    # 8000-byte HugeMethodLimit — the ENTIRE projection ran interpreted
    # (measured maxMethodCodeSize via explain('codegen'); ~3x on the OMOP
    # normalize stage). Three equivalences shrink it ~2x while the
    # property tests pin bit-identity to the reference model:
    # - every regex group here is a FIXED-WIDTH digit class, so the
    #   reference's str(int(x)).zfill(n) re-pad is the identity and the
    #   lpad/cast chains are dropped outright;
    # - the ISO arm keeps the whole match (group 0) and normalizes the
    #   separators with translate — one regex run instead of three;
    # - concat propagates NULL, so the final when(ymd.isNotNull(), ...)
    #   double-inline of ymd collapses to a single evaluation.
    date_part = F.substring_index(col, " ", 1)
    # the reference parses the time token ONLY when the split has exactly
    # two elements (date_helpers.py: len(item.split(' ')) == 2) — i.e. the
    # value has exactly one space; with any trailing token the time
    # defaults to 00:00:00. '' (no match / empty token) behaves like the
    # old NULL: every downstream extract yields '' and the default wins.
    time_part = F.regexp_extract(col, r"^[^ ]* ([^ ]*)$", 1)

    iso = F.regexp_extract(date_part, _ISO_RE, 0)
    rev_d = F.regexp_extract(date_part, _REV_RE, 1)
    rev_m = F.regexp_extract(date_part, _REV_RE, 2)
    rev_y = F.regexp_extract(date_part, _REV_RE, 3)
    ymd = F.when(iso != "", F.translate(iso, "/", "-")).when(
        rev_y != "",
        F.concat(rev_y, F.lit("-"), rev_m, F.lit("-"), rev_d),
    )

    t_h = F.regexp_extract(time_part, _TIME_RE, 1)
    t_m = F.regexp_extract(time_part, _TIME_RE, 2)
    t_s = F.regexp_extract(time_part, _TIME_RE, 4)
    time_str = F.when(
        t_h != "",
        F.concat(
            t_h, F.lit(":"), t_m, F.lit(":"),
            F.when(t_s != "", t_s).otherwise(F.lit("00")),
        ),
    ).otherwise(F.lit("00:00:00"))

    return F.concat(ymd, F.lit(" "), time_str)


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


def strict_date_ok(col: Column) -> Column:
    """Boolean twin of ``strict_date(col).isNotNull()`` that evaluates the
    3-format parse coalesce ONCE instead of twice (the CASE WHEN in
    strict_date inlines the parse into both the condition and the value,
    and the isNotNull wrapper re-evaluates the condition's copy — measured
    as half the person-map scan CPU at sf10). NULL-safe: never returns
    NULL, so negation (~) in the reject counters stays well-defined."""
    d = F.coalesce(
        F.try_to_date(col, "yyyy-M-d"),
        F.try_to_date(col, "d-M-yyyy"),
        F.try_to_date(col, "d/M/yyyy"),
    )
    return F.coalesce(F.year(d) >= 1, F.lit(False))


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
