"""Text-analysis operators: language-ID, quality scoring, token stats,
fingerprinting. Pure column expressions (JVM-side); see queries/text.py for
the oracle-verified instantiations over the synthetic corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.functions.rounding import fround
from pyspark.sql import Column, DataFrame

DEFAULT_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " y ", " de la "],
    "zh": [" de ", " shi "],
}


def occurrences(col: Column, needle: str) -> Column:
    """Non-overlapping occurrence count via replace-length delta."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def token_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), r"\s+"))


def lang_scores(col: Column, markers: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Per-language stopword-hit scores over a space-padded text column."""
    markers = markers or DEFAULT_LANG_MARKERS
    padded = F.concat(F.lit(" "), F.trim(col), F.lit(" "))
    out: dict[str, Column] = {}
    for lang, needles in markers.items():
        score = None
        for ndl in needles:
            c = occurrences(padded, ndl)
            score = c if score is None else score + c
        out[lang] = score
    return out


def lang_id(col: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Deterministic argmax over lang_scores (dict order breaks ties)."""
    scores = lang_scores(col, markers)
    order = list(scores)
    expr = None
    for lang in order:
        geq = None
        for other in order:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            geq = c if geq is None else (geq & c)
        expr = F.when(geq, F.lit(lang)) if expr is None else expr.when(geq, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_flags(
    col: Column,
    min_tokens: int = 20,
    max_tokens: int = 400,
    stop_needle: str = " the ",
) -> dict[str, Column]:
    """Standard cheap pre-filter signals: length band, stopword presence,
    alnum density. Returns named Column expressions to attach."""
    txt = F.trim(col)
    padded = F.concat(F.lit(" "), txt, F.lit(" "))
    n_tok = token_count(col)
    stop_hits = occurrences(padded, stop_needle)
    stripped = F.replace(
        F.replace(F.replace(txt, F.lit(" "), F.lit("")), F.lit("."), F.lit("")),
        F.lit(","),
        F.lit(""),
    )
    len_ok = F.when(n_tok.between(min_tokens, max_tokens), 1).otherwise(0)
    return {
        "n_tokens": n_tok,
        "len_ok": len_ok,
        "stopword_hits": stop_hits,
        "alnum_ratio": fround(F.length(stripped) * F.lit(1.0) / F.length(txt)),
        "keep_flag": F.when(
            n_tok.between(min_tokens, max_tokens) & (stop_hits >= 1), 1
        ).otherwise(0),
    }


def fingerprint(col: Column) -> Column:
    """Canonical md5 content fingerprint over normalized text."""
    return F.md5(F.lower(F.trim(col)))


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) corpus token frequencies — map-side-combine aggregation."""
    return (
        df.select(F.explode(F.split(F.trim(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
