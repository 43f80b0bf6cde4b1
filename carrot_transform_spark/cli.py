"""CLI — same surface as the reference's `carrot-transform run` group
(cli/subcommands/run.py:28-49, 344-390), Spark execution underneath.

    python -m carrot_transform_spark run mapstream \
        --rules-file rules.json --input-dir ./inputs \
        --output-dir ./out --person Demographics

``mapstream`` and ``v2`` share one implementation: the rules dialect is
auto-detected and dialect-specific person semantics are applied by the
planner. ``v2`` additionally asserts the rules file IS v2, like the
reference (orchestrator.py:309-310).
"""

from __future__ import annotations

import sys
from pathlib import Path

import click

from carrot_transform_spark.atpath import DEFAULT_CONFIG, DEFAULT_DDL


@click.group()
def cli():
    """carrot-transform-spark: OMOP ETL + analytics on Spark."""


@cli.group()
def run():
    """Run a transformation."""


def _common_options(fn):
    fn = click.option("--rules-file", required=True, envvar="RULES_FILE", help="mapping rules JSON")(fn)
    fn = click.option("--input-dir", "--inputs", "inputs", required=True, envvar="INPUT_DIR",
                      help="input CSV dir, jdbc: URL, s3a:// or minio: spec")(fn)
    fn = click.option("--output-dir", "--output", "output_dir", required=True, envvar="OUTPUT_DIR")(fn)
    fn = click.option("--person", "person_table", required=True, envvar="PERSON",
                      help="name of the person source table")(fn)
    fn = click.option("--omop-ddl-file", default=DEFAULT_DDL, envvar="OMOP_DDL_FILE")(fn)
    fn = click.option("--omop-config-file", default=DEFAULT_CONFIG, envvar="OMOP_CONFIG_FILE")(fn)
    fn = click.option("--use-input-person-ids", default="N", envvar="USE_INPUT_PERSON_IDS",
                      help="Y = pass source person ids through unchanged")(fn)
    fn = click.option("--last-used-ids-file", default=None, envvar="LAST_USED_IDS_FILE",
                      help="TSV of table<TAB>last-used-id; new ids continue after")(fn)
    fn = click.option("--log-file-threshold", default=0, type=int, envvar="LOG_FILE_THRESHOLD")(fn)
    fn = click.option("--master", default=None, help="Spark master (default local[*])")(fn)
    return fn


def _load_last_used_ids(path: str | None) -> dict[str, int] | None:
    if not path:
        return None
    out: dict[str, int] = {}
    for line in Path(path).read_text(encoding="utf-8-sig").splitlines():
        if not line.strip():
            continue
        # reference stores last+1 as the next id (person_helpers.py:16-24);
        # our planner adds row_number to the offset, so the raw last value
        # yields the same first id
        name, last = line.split("\t")[:2]
        out[name] = int(last)
    return out


def _execute(kind: str, **kw):
    from carrot_transform_spark.pipeline import run_transform
    from carrot_transform_spark.rules.loader import load_rules
    from carrot_transform_spark.omop.ddl import load_schemas
    from carrot_transform_spark.session import get_spark

    omop = load_schemas(kw["omop_ddl_file"], kw["omop_config_file"])
    rules = load_rules(kw["rules_file"], omop)
    if kind == "v2" and rules.dialect != "v2":
        click.echo("Rules file is not in v2 format!", err=True)
        sys.exit(1)

    from carrot_transform_spark.rules.validation import (
        RulesValidationError,
        check_person_rules,
        check_person_table_name,
    )

    try:
        check_person_table_name(kw["person_table"])
        check_person_rules(rules, kw["person_table"])
    except RulesValidationError as e:
        click.echo(f"error: {e}", err=True)
        sys.exit(-1)  # reference exit code for person-rules failures (run.py:104)

    spark = get_spark(app_name=f"carrot-{kind}", master=kw["master"])
    spark.sparkContext.setLogLevel("WARN")
    try:
        run_transform(
            spark,
            rules_file=kw["rules_file"],
            inputs=kw["inputs"],
            output_dir=kw["output_dir"],
            person_table=kw["person_table"],
            ddl_file=kw["omop_ddl_file"],
            config_file=kw["omop_config_file"],
            use_input_person_ids=str(kw["use_input_person_ids"]).upper() == "Y",
            last_used_ids=_load_last_used_ids(kw["last_used_ids_file"]),
            log_threshold=kw["log_file_threshold"],
        )
    finally:
        spark.stop()
    click.echo(f"done: outputs in {kw['output_dir']}")


@run.command()
@_common_options
def mapstream(**kw):
    """Legacy v1-compatible run (rules dialect auto-detected)."""
    _execute("mapstream", **kw)


@run.command()
@_common_options
def v2(**kw):
    """v2 run (requires v2 rules)."""
    _execute("v2", **kw)


if __name__ == "__main__":
    cli()
