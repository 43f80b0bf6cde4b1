"""``@carrot/`` path substitution (reference carrottransform/tools/at_path.py:7-15).

The reference CLI resolves ``@carrot/...`` against its own package
directory so packaged DDL/config files work from any install location.
Same here: ``@carrot/config/config.json`` resolves to this package's
bundled copy. Files are package data shipped in
``carrot_transform_spark/config/`` (the OMOP CDM DDL is OHDSI's public
DDL, identical to the reference's bundled copy).
"""

from __future__ import annotations

from pathlib import Path

_PKG_ROOT = Path(__file__).resolve().parent

AT_PREFIX = "@carrot/"

DEFAULT_DDL = "@carrot/config/OMOPCDM_postgresql_5.3_ddl.sql"
DEFAULT_CONFIG = "@carrot/config/config.json"


def convert_path(value: str | Path) -> Path:
    """Resolve ``@carrot/...`` to the packaged file; pass others through."""
    s = str(value).replace("\\", "/")
    if s.startswith(AT_PREFIX):
        return _PKG_ROOT / s[len(AT_PREFIX):]
    return Path(s)
