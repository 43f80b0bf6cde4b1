"""Document quality filter chain (FineWeb/Gopher-style keep/drop gate).

Pretraining pipelines run a chain of cheap heuristic filters over every
document and keep only rows that pass all of them — with per-rule
attribution so curation can audit WHY documents were dropped (the
FineWeb/RefinedWeb ablation loop). This operator evaluates the standard
rule family in ONE corpus scan plus the repetition profile's keyed
aggregates:

  - too_short / too_long   — whitespace token count band;
  - no_stopword            — zero hits of the stopword marker (the cheap
                             "is this natural language" proxy);
  - low_alnum              — punctuation/symbol-dominated text;
  - dup_words              — Gopher repetition gate (duplicate-word
                             fraction from operators/repetition.py).

Output carries the raw signals, a ``reject_reasons`` CSV string (empty =
clean), and the ``keep`` flag, so the same frame serves filtering AND the
per-rule drop-rate dashboard (one extra groupBy on reject_reasons).

Scale posture: the signal scan is a narrow projection (no shuffle); the
repetition join is the profile's own doc-keyed aggregate joined back on
doc id. Nothing collects to the driver. All expressions are exact integer
or IEEE-double arithmetic reproduced verbatim in the DuckDB oracle.

The reference engine (Health-Informatics-UoN/carrot-transform) has only
row-validity filters (dates, non-empty values — cli/subcommands/run.py);
this quality family is part of the beyond-parity LLM-pipeline brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.functions.rounding import fround
from pyspark.sql import DataFrame

from carrot_transform_spark.operators.repetition import (
    repetition_profile,
    repetition_profile_sql,
)
from carrot_transform_spark.operators.text import occurrences


def quality_filter_chain(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 400,
    stop_needle: str = " the ",
    min_alnum: float = 0.6,
    max_dup_word_frac: float = 0.65,
) -> DataFrame:
    """(doc, n_tokens, stopword_hits, alnum_ratio, dup_word_frac,
    reject_reasons, keep) — one row per input document.

    ``reject_reasons`` is a comma-joined, rule-ordered list of every rule
    the document violates (empty string = passes all); ``keep`` is 1 iff no
    rule fired. Rule order is fixed so the string is deterministic.
    """
    txt = F.trim(F.col(text_col))
    padded = F.concat(F.lit(" "), txt, F.lit(" "))
    n_tok = F.size(F.split(txt, r"\s+"))
    stop_hits = occurrences(padded, stop_needle)
    stripped = F.replace(
        F.replace(F.replace(txt, F.lit(" "), F.lit("")), F.lit("."), F.lit("")),
        F.lit(","),
        F.lit(""),
    )
    alnum = fround(F.length(stripped) * F.lit(1.0) / F.length(txt))

    signals = docs.select(
        F.col(id_col).alias("doc"),
        n_tok.alias("n_tokens"),
        stop_hits.alias("stopword_hits"),
        alnum.alias("alnum_ratio"),
    )
    rep = repetition_profile(docs, id_col, text_col).select("doc", "dup_word_frac")
    j = signals.join(rep, "doc", "left").withColumn(
        "dup_word_frac", F.coalesce("dup_word_frac", F.lit(0.0))
    )

    rules = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("no_stopword", F.col("stopword_hits") == 0),
        ("low_alnum", F.col("alnum_ratio") < min_alnum),
        ("dup_words", F.col("dup_word_frac") > max_dup_word_frac),
    ]
    reasons = F.concat_ws(",", *[F.when(cond, F.lit(name)) for name, cond in rules])
    return j.select(
        "doc",
        "n_tokens",
        "stopword_hits",
        "alnum_ratio",
        "dup_word_frac",
        reasons.alias("reject_reasons"),
        F.when(reasons == "", 1).otherwise(0).alias("keep"),
    )


def quality_filter_chain_sql(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 400,
    stop_needle: str = " the ",
    min_alnum: float = 0.6,
    max_dup_word_frac: float = 0.65,
) -> str:
    """DuckDB twin of quality_filter_chain (same rule order and math)."""
    rep = repetition_profile_sql(table, id_expr, text_expr)
    stop = (
        f"CAST((LENGTH(' ' || trim({text_expr}) || ' ') - "
        f"LENGTH(REPLACE(' ' || trim({text_expr}) || ' ', '{stop_needle}', '')))"
        f" / {len(stop_needle)} AS INTEGER)"
    )
    rules = [
        ("too_short", f"n_tokens < {min_tokens}"),
        ("too_long", f"n_tokens > {max_tokens}"),
        ("no_stopword", "stopword_hits = 0"),
        ("low_alnum", f"alnum_ratio < {min_alnum}"),
        ("dup_words", f"dup_word_frac > {max_dup_word_frac}"),
    ]
    cases = ", ".join(f"CASE WHEN {cond} THEN '{name}' END" for name, cond in rules)
    return f"""
    WITH sig AS (
        SELECT {id_expr} AS doc,
               len(regexp_split_to_array(trim({text_expr}), '\\s+')) AS n_tokens,
               {stop} AS stopword_hits,
               CAST(FLOOR((LENGTH(REPLACE(REPLACE(REPLACE(trim({text_expr}), ' ', ''),
                                            '.', ''), ',', '')) * 1.0
                     / LENGTH(trim({text_expr}))) * 10000 + 0.5) / 10000
                    AS DOUBLE) AS alnum_ratio
        FROM {table}
    ),
    rep AS ({rep}),
    j AS (
        SELECT sig.doc, sig.n_tokens, sig.stopword_hits, sig.alnum_ratio,
               COALESCE(rep.dup_word_frac, 0.0) AS dup_word_frac
        FROM sig LEFT JOIN rep ON sig.doc = rep.doc
    )
    SELECT doc, n_tokens, stopword_hits, alnum_ratio, dup_word_frac,
           concat_ws(',', {cases}) AS reject_reasons,
           CASE WHEN concat_ws(',', {cases}) = '' THEN 1 ELSE 0 END AS keep
    FROM j
    """
