"""Edit-distance similarity self-join: all string pairs within Levenshtein
distance k, via lossless prefix-filtered q-gram blocking.

The string-similarity member of the dedup/linkage family (MinHash/SimHash
cover set similarity, SemDeDup covers embeddings): entity resolution and
typo-level dedup in training-data pipelines ask for exact small-radius
edit-distance pairs — "which near-identical names/titles/words exist in
this corpus". All-pairs Levenshtein is O(n^2) and dead at scale; the
standard relational approach is q-gram blocking with count filtering
(Gravano et al. 2001, "Approximate string joins in a database (almost)
for free", VLDB) sharpened by PREFIX filtering (Chaudhuri, Ganti &
Kaushik 2006, "A primitive operator for similarity joins in data
cleaning", ICDE; Xiao, Wang & Lin 2008 "Ed-Join", VLDB):

- one edit operation destroys at most q positional q-grams, so strings
  within distance k share >= G_s - k*q of s's G_s = |s|-q+1 grams;
- therefore any valid pair shares at least ONE gram among each side's
  (k*q + 1) GLOBALLY RAREST grams (the prefix-filter theorem, with grams
  ordered by corpus frequency) — a CONSTANT number of index entries per
  string, with the join keyed on the rarest grams by construction, which
  is what bounds both fan-out and skew at 100 TB;
- strings too short to carry k*q+1 informative grams (G_s <= k*q, i.e.
  |s| <= (k+1)*q - 1 — at most 5 chars for k=2, q=2) fall through the
  count filter entirely and are paired within +-k length buckets
  instead; the distinct-short-string population is alphabet-bounded, so
  the bucket join is small whatever the corpus size.

Candidates from either path are verified with exact ``levenshtein`` —
available as a built-in in BOTH engines and integer-exact by definition,
so the DuckDB twin needs no quantization fences anywhere.

Spark shape: gram explode -> global gram-frequency groupBy (map-side
combined) -> per-string top-(k*q+1) window -> gram equi-join -> distinct
pairs -> one scalar levenshtein filter. Every corpus-sized frame is the
deduped string table, never raw documents; at 100 TB the string table is
the Heaps-law vocabulary, the prefix index is (k*q+1)x that, and the only
shuffles are the gram groupBy and the gram join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_Q = 2
DEFAULT_K = 1


def qgrams(strings: DataFrame, s_col: str = "s", q: int = DEFAULT_Q) -> DataFrame:
    """(s, gram): positional q-gram multiset flattened to occurrences —
    strings shorter than q emit nothing (they take the short-pool path)."""
    return strings.select(
        F.col(s_col).alias("s"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({s_col}) - {int(q)} + 1, 0)),"
                f" i -> substring({s_col}, i, {int(q)}))"
            )
        ).alias("gram"),
    )


def edit_join(
    strings: DataFrame,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
) -> DataFrame:
    """(a, b, dist): every unordered pair of DISTINCT strings within
    Levenshtein distance k (a < b lexicographically), exact.

    ``strings`` is a one-column frame of distinct strings (callers dedup
    first — that is the corpus-size cut). Lossless by the prefix-filter
    theorem: the gram path covers every pair where both sides have more
    than k*q grams; shorter strings are covered by the length-bucket
    pool; pairs mixing the two populations differ in length by more than
    k unless both are short (G <= k*q + k implies the longer side is
    still short-pool eligible), handled by the pool's +-k bucketing over
    ALL strings of short-compatible length.
    """
    kq1 = int(k) * int(q) + 1
    # short threshold: a string with G_s <= k*q grams, i.e. length <=
    # (k+1)*q - 1. Its +-k neighbourhood reaches length (k+1)*q - 1 + k;
    # every string up to that length joins the pool so short<->longer
    # pairs are not lost.
    short_len = (int(k) + 1) * int(q) - 1
    pool_len = short_len + int(k)

    st = strings.select(F.col(s_col).alias("s")).distinct().persist()

    # ---- prefix-filter path (strings with > k*q grams) ----
    g = qgrams(st.filter(F.length("s") > short_len), "s", q)
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("gfreq"))
    w = Window.partitionBy("s").orderBy(F.asc("gfreq"), F.asc("gram"))
    prefix = (
        g.join(freq, "gram")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kq1)
        .select("s", "gram")
    )
    pa = prefix.select(F.col("s").alias("a"), "gram")
    pb = prefix.select(F.col("s").alias("b"), "gram")
    gram_cand = (
        pa.join(pb, "gram")
        .filter(
            (F.col("a") < F.col("b"))
            & (
                F.abs(F.length("a") - F.length("b")) <= F.lit(int(k))
            )
        )
        .select("a", "b")
        .distinct()
    )

    # ---- short pool: +-k length buckets over all short-compatible strings
    sp = st.filter(F.length("s") <= pool_len)
    sa = sp.select(F.col("s").alias("a"), F.length("s").alias("la"))
    sb = sp.select(F.col("s").alias("b"), F.length("s").alias("lb"))
    short_cand = (
        sa.join(
            sb,
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("la") - F.col("lb")) <= F.lit(int(k))),
        )
        .filter((F.col("la") <= short_len) | (F.col("lb") <= short_len))
        .select("a", "b")
    )

    cand = gram_cand.unionByName(short_cand).distinct()
    out = cand.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= F.lit(int(k)))
    return out


def edit_join_words_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
    max_word: int = 12,
) -> str:
    """DuckDB twin of edit_join over the distinct words of a document
    table (the sub-check shape): identical tokenisation (the repo's
    whitespace class), gram prefix selection with the same (gfreq, gram)
    tie order, the same short-pool rule, and exact levenshtein verify."""
    kq1 = int(k) * int(q) + 1
    short_len = (int(k) + 1) * int(q) - 1
    pool_len = short_len + int(k)
    return f"""
    WITH ej_w AS MATERIALIZED (
        SELECT DISTINCT word AS s FROM (
            SELECT unnest(list_filter(regexp_split_to_array({text_col}, '[ \t\r\n]+'),
                                      t -> t <> '')) AS word
            FROM {table}
        ) WHERE length(word) <= {int(max_word)}
    ),
    ej_g AS MATERIALIZED (
        SELECT s, substring(s, u.i, {int(q)}) AS gram
        FROM ej_w, UNNEST(range(1, greatest(length(s) - {int(q)} + 1, 0) + 1)) AS u(i)
        WHERE length(s) > {short_len}
    ),
    ej_freq AS MATERIALIZED (
        SELECT gram, COUNT(*) AS gfreq FROM ej_g GROUP BY gram
    ),
    ej_prefix AS MATERIALIZED (
        SELECT s, gram FROM (
            SELECT g.s, g.gram,
                   ROW_NUMBER() OVER (
                       PARTITION BY g.s ORDER BY f.gfreq, g.gram
                   ) AS rn
            FROM ej_g g JOIN ej_freq f ON f.gram = g.gram
        ) WHERE rn <= {kq1}
    ),
    ej_gram_cand AS (
        SELECT DISTINCT pa.s AS a, pb.s AS b
        FROM ej_prefix pa JOIN ej_prefix pb ON pb.gram = pa.gram
        WHERE pa.s < pb.s AND abs(length(pa.s) - length(pb.s)) <= {int(k)}
    ),
    ej_short_cand AS (
        SELECT sa.s AS a, sb.s AS b
        FROM ej_w sa JOIN ej_w sb
          ON sa.s < sb.s AND abs(length(sa.s) - length(sb.s)) <= {int(k)}
        WHERE sa.s IS NOT NULL
          AND length(sa.s) <= {pool_len} AND length(sb.s) <= {pool_len}
          AND (length(sa.s) <= {short_len} OR length(sb.s) <= {short_len})
    ),
    ej_cand AS (
        SELECT DISTINCT a, b FROM (
            SELECT a, b FROM ej_gram_cand
            UNION ALL SELECT a, b FROM ej_short_cand
        )
    )
    SELECT a, b, CAST(levenshtein(a, b) AS INT) AS dist
    FROM ej_cand WHERE levenshtein(a, b) <= {int(k)}
    """


def edit_join_words(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
    max_word: int = 12,
) -> DataFrame:
    """Distinct-word edit-distance pairs of a document table — tokenise
    (the repo's whitespace class), dedup, edit_join."""
    from carrot_transform_spark.operators.unigram import word_counts

    words = word_counts(docs, text_col, max_word).select(
        F.col("word").alias("s")
    )
    return edit_join(words, "s", k, q)
