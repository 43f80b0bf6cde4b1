"""Text-analysis operators over the documents table.

Training-data-pipeline staples: token counting, quality scoring, language
identification (stopword-hit heuristic), and content fingerprinting. All
pure JVM-side expressions (no Python UDFs) with exact DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from carrot_transform_spark.functions.rounding import fround, fround_sql
from carrot_transform_spark.queries import load, register

# stopword markers per language for the langid heuristic (space-padded so we
# count whole-word hits via substring replacement)
_LANG_MARKERS = {
    "en": " the ",
    "de": " der ",
    "fr": " le ",
    "es": " el ",
    "zh": " de ",
}


def _occurrences(col: Column, needle: str) -> Column:
    """# of non-overlapping occurrences of needle, via replace-length delta —
    identical semantics in Spark and DuckDB."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def _occurrences_sql(expr: str, needle: str) -> str:
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{needle}', ''))) / {len(needle)} AS INTEGER)"
    )


# BPE-ish tokenization: letter runs, digit runs, single punctuation marks —
# the shape (not the learned merges) of a byte-pair tokenizer's pre-split.
# Class-only regex so Java (Spark) and RE2 (DuckDB) agree exactly.
_BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# polynomial rolling hash over token hashes: h = fold(h*31 + h32(tok)) mod p.
# Order-sensitive (unlike a bag-of-words hash) and incrementally updatable —
# the windowed-fingerprint primitive.
_RHASH_MOD = 2147483647


def _profile_sql() -> str:
    """Single-pass doc profile: token stats + quality + langid + fingerprint."""
    scores = {
        lang: _occurrences_sql("' ' || txt || ' '", marker)
        for lang, marker in _LANG_MARKERS.items()
    }
    order = list(_LANG_MARKERS)
    cond = []
    for lang in order:
        geq = " AND ".join(f"{scores[lang]} >= {scores[o]}" for o in order if o != lang)
        cond.append(f"WHEN {geq} THEN '{lang}'")
    cases = " ".join(cond)
    stop = _occurrences_sql("' ' || txt || ' '", " the ")
    tok_h32 = "CAST(CONCAT('0x', substring(md5(x), 1, 8)) AS UBIGINT)"
    return f"""
    WITH t AS (
        SELECT doc_id, lang, source, text, trim(text) AS txt,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
        FROM documents WHERE LENGTH(trim(text)) > 0
    )
    SELECT doc_id, lang, source,
           n_tokens,
           len(regexp_extract_all(txt, '{_BPE_PAT}')) AS n_tokens_bpe,
           LENGTH(text) AS n_chars_actual,
           {fround_sql("LENGTH(txt) * 1.0 / n_tokens")} AS chars_per_token,
           CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 1 ELSE 0 END AS len_ok,
           {stop} AS stopword_hits,
           {fround_sql("LENGTH(REPLACE(REPLACE(REPLACE(txt, ' ', ''), '.', ''), ',', '')) * 1.0 / LENGTH(txt)")} AS alnum_ratio,
           CASE WHEN n_tokens BETWEEN 20 AND 400 AND {stop} >= 1
                THEN 1 ELSE 0 END AS keep_flag,
           CASE {cases} ELSE 'und' END AS predicted_lang,
           md5(lower(txt)) AS fingerprint,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(regexp_split_to_array(txt, '\\s+'),
                                  x -> CAST({tok_h32} AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % {_RHASH_MOD}) AS rolling_hash
    FROM t
    """


@register("txt_doc_profile", oracle=_profile_sql(), tags=("text", "profile"))
def txt_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus scan computing the full per-document profile (token stats,
    quality gate, language-ID argmax, content fingerprint). At 100 TB this is
    the shape you want: every per-doc metric in a single projection over one
    pass — no repeated scans per metric family. All JVM-side expressions."""
    d = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    txt = F.trim("text")
    padded = F.concat(F.lit(" "), txt, F.lit(" "))
    n_tokens = F.size(F.split(txt, r"\s+"))
    stop_hits = _occurrences(padded, " the ")
    stripped = F.replace(
        F.replace(F.replace(txt, F.lit(" "), F.lit("")), F.lit("."), F.lit("")),
        F.lit(","),
        F.lit(""),
    )
    scores = {lang: _occurrences(padded, m) for lang, m in _LANG_MARKERS.items()}
    order = list(_LANG_MARKERS)
    lang_expr = None
    for lang in order:  # first match wins, same as the SQL CASE chain
        geq = None
        for other in order:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            geq = c if geq is None else (geq & c)
        lang_expr = (
            F.when(geq, F.lit(lang)) if lang_expr is None else lang_expr.when(geq, F.lit(lang))
        )
    lang_expr = lang_expr.otherwise(F.lit("und"))
    tok_h32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")  # noqa: E731
    rolling = F.aggregate(
        F.transform(F.split(txt, r"\s+"), tok_h32),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % _RHASH_MOD,
    )
    return d.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all(txt, F.lit(_BPE_PAT), F.lit(0))).alias("n_tokens_bpe"),
        F.length("text").alias("n_chars_actual"),
        fround(F.length(txt) * F.lit(1.0) / n_tokens).alias("chars_per_token"),
        F.when(n_tokens.between(20, 400), 1).otherwise(0).alias("len_ok"),
        stop_hits.alias("stopword_hits"),
        fround(F.length(stripped) * F.lit(1.0) / F.length(txt)).alias("alnum_ratio"),
        F.when(n_tokens.between(20, 400) & (stop_hits >= 1), 1).otherwise(0).alias("keep_flag"),
        lang_expr.alias("predicted_lang"),
        F.md5(F.lower(txt)).alias("fingerprint"),
        rolling.alias("rolling_hash"),
    )


@register(
    "txt_word_freq",
    oracle="""
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents) t
    WHERE w <> ''
    GROUP BY w ORDER BY freq DESC, word
    """,
    tags=("text", "explode", "agg"),
    prepared=True,
)
def txt_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency — explode + count, the building block for
    TF/IDF and BPE-ish vocab induction. At 100 TB this is the classic
    map-side-combine aggregation; partial counts collapse before shuffle."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
    )


@register(
    "txt_redact_patterns",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                          '(the|and|of) ', '<STOP> ', 'g') AS redacted,
           LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]+', '', 'g')) AS digit_chars
    FROM documents
    """,
    tags=("text", "transform", "redact"),
)
def txt_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern scrubbing (the shape of PII redaction / boilerplate removal in
    a data-cleaning stage): chained regexp_replace, all JVM-side. Both
    engines use non-overlapping left-to-right global replacement."""
    d = load(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace(F.col("text"), r"[0-9]+", "<NUM>"),
        r"(the|and|of) ",
        "<STOP> ",
    )
    return d.select(
        "doc_id",
        red.alias("redacted"),
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), r"[0-9]+", ""))).alias(
            "digit_chars"
        ),
    )
