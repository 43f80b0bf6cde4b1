"""Import-time stub for sqlalchemy so the reference engine can be imported
for differential testing without the real package (no network in sandbox).
Only the names the reference imports at module scope exist; the local-CSV
fuzz path never CALLS any of them — touching one raises immediately so a
code path that genuinely needs SQL cannot silently "pass"."""


def _unavailable(*_a, **_k):
    raise RuntimeError("sqlalchemy stub: DB paths are not exercised in the fuzz")


def create_engine(value, *_a, **_k):
    """The reference probes EVERY input/output CLI string through
    create_engine and falls back to the CSV path when sqlalchemy rejects it
    with this exact ArgumentError message (tools/outputs.py convert /
    tools/sources.py convert). A filesystem path is not a URL, so the real
    library raises exactly this — reproduce the signal; never build engines."""
    raise exc.ArgumentError("Could not parse SQLAlchemy URL from given URL string")



select = _unavailable
insert = _unavailable
Column = _unavailable
MetaData = _unavailable
Table = _unavailable
Text = _unavailable


class _Engine:
    """Type-annotation placeholder (sqlalchemy.engine.Engine appears in the
    reference's signatures, evaluated at def time)."""


class _EngineModule:
    Engine = _Engine


class _ArgumentError(Exception):
    pass


class _ExcModule:
    ArgumentError = _ArgumentError


engine = _EngineModule()
exc = _ExcModule()
