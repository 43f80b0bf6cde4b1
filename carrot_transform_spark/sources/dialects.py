"""Per-dialect JDBC identifier-case and type-mapping rules.

The reference reaches Postgres/Trino/SQLite through SQLAlchemy, which hides
dialect quirks behind reflection; its own dialect handling is app-level:
table names are lower-cased before reflection and returned headers are
lower-cased (sources.py:75-119, SQL_TO_LOWER), column resolution is
case-insensitive because "Trino seems to flip column names around"
(omopcdm.py:145-146), and sink tables are created with all-Text columns
(outputs.py:133). On Spark JDBC those rules have to be explicit. This module
encodes them per dialect so a live Postgres/Trino matrix run needs zero code
changes: the sandbox has no database servers, so everything here is
unit-tested against recorded dialect metadata plus a live embedded-Derby
round trip.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class JdbcDialect:
    """Identifier-folding + type-mapping contract for one JDBC dialect.

    ident_fold: how the server folds UNQUOTED identifiers ("lower" for
    Postgres/Trino, "upper" for Derby/Oracle-style, "preserve" for SQLite).
    We always pass identifiers unquoted — the reference never quotes — so
    this predicts the server-side name of anything we create, which is what
    the source's app-level lower-casing then has to match case-insensitively.

    text_type: the server's type for the reference's all-Text target columns
    (outputs.py:133 creates every sink column as sqlalchemy Text).
    """

    name: str
    url_prefixes: tuple[str, ...]
    ident_fold: str  # "lower" | "upper" | "preserve"
    text_type: str
    # extra Spark JDBC options this dialect needs (merged under user options)
    read_options: dict[str, str] = field(default_factory=dict)
    write_options: dict[str, str] = field(default_factory=dict)

    def fold(self, ident: str) -> str:
        """Server-side name of an unquoted identifier."""
        if self.ident_fold == "lower":
            return ident.lower()
        if self.ident_fold == "upper":
            return ident.upper()
        return ident

    def column_types_clause(self, columns: list[str]) -> str:
        """createTableColumnTypes value making every column the dialect's
        text type — the Spark-side twin of the reference's all-Text CREATE."""
        return ", ".join(f"{c} {self.text_type}" for c in columns)


# Recorded dialect metadata. Postgres folds unquoted identifiers to lower
# case (PostgreSQL docs, SQL-spec deviation); Trino identifiers are
# case-insensitive and stored lower; Derby follows the SQL spec and folds
# upper; SQLite preserves the case it was given and matches
# case-insensitively. Text types: Postgres TEXT is unbounded; Trino has no
# TEXT alias, VARCHAR is unbounded; Derby has no unbounded VARCHAR, 32672 is
# its documented maximum; SQLite TEXT. Trino writes need isolationLevel NONE
# (no transactions in the Trino JDBC driver).
DIALECTS: tuple[JdbcDialect, ...] = (
    JdbcDialect(
        name="postgresql",
        url_prefixes=("jdbc:postgresql:",),
        ident_fold="lower",
        text_type="TEXT",
    ),
    JdbcDialect(
        name="trino",
        url_prefixes=("jdbc:trino:", "jdbc:presto:"),
        ident_fold="lower",
        text_type="VARCHAR",
        write_options={"isolationLevel": "NONE"},
    ),
    JdbcDialect(
        name="derby",
        url_prefixes=("jdbc:derby:",),
        ident_fold="upper",
        text_type="VARCHAR(32672)",
    ),
    JdbcDialect(
        name="sqlite",
        url_prefixes=("jdbc:sqlite:",),
        ident_fold="preserve",
        text_type="TEXT",
    ),
)

GENERIC = JdbcDialect(
    name="generic",
    url_prefixes=(),
    ident_fold="lower",
    text_type="VARCHAR(32672)",
)


def dialect_for_url(url: str) -> JdbcDialect:
    """Pick the dialect from the JDBC URL prefix; unknown products get the
    conservative GENERIC contract (lower fold, bounded VARCHAR)."""
    low = url.lower()
    for d in DIALECTS:
        if any(low.startswith(p) for p in d.url_prefixes):
            return d
    return GENERIC


# SQLAlchemy scheme -> JDBC subprotocol. The reference CLI accepts
# SQLAlchemy engine URLs for both inputs and outputs (sources.py:66-67,
# outputs.py:333-334); Spark needs JDBC form, where credentials ride in
# properties instead of the authority component.
_SQLALCHEMY_SCHEMES = {
    "postgresql": "postgresql",
    "postgres": "postgresql",
    "trino": "trino",
    "presto": "presto",
    "mysql": "mysql",
    "sqlite": "sqlite",
}


def sqlalchemy_to_jdbc(spec: str) -> tuple[str, dict[str, str]]:
    """Translate an SQLAlchemy engine URL to (jdbc url, properties).

    postgresql+psycopg2://u:p@host:5432/db?sslmode=require
      -> ("jdbc:postgresql://host:5432/db?sslmode=require",
          {"user": "u", "password": "p"})
    sqlite:////tmp/db.sqlite -> ("jdbc:sqlite:/tmp/db.sqlite", {})

    Raises ValueError for schemes with no JDBC mapping (the caller decides
    the fallback).
    """
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(spec)
    scheme = parts.scheme.split("+", 1)[0].lower()  # strip "+psycopg2" etc.
    if scheme not in _SQLALCHEMY_SCHEMES:
        raise ValueError(f"no JDBC mapping for SQLAlchemy scheme {parts.scheme!r}")
    props: dict[str, str] = {}
    if parts.username:
        props["user"] = unquote(parts.username)
    if parts.password:
        props["password"] = unquote(parts.password)
    sub = _SQLALCHEMY_SCHEMES[scheme]
    if scheme == "sqlite":
        # sqlite:///rel or sqlite:////abs — the path IS the database
        return f"jdbc:sqlite:{parts.path.lstrip('/') if not parts.path.startswith('//') else parts.path[1:]}", props
    host = parts.hostname or "localhost"
    port = f":{parts.port}" if parts.port else ""
    url = f"jdbc:{sub}://{host}{port}{parts.path}"
    if parts.query:
        url += f"?{parts.query}"
    return url, props
