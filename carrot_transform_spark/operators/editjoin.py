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
  within distance k share >= G_s - k*q of s's G_s = |s|-q+1 gram
  occurrences;
- therefore any valid pair shares at least ONE gram among each side's
  (k*q + 1) GLOBALLY RAREST grams (the prefix-filter theorem, with grams
  ordered by corpus frequency) — a CONSTANT number of index entries per
  string, with the join keyed on the rarest grams by construction, which
  is what bounds both fan-out and skew at 100 TB.

The filter is vacuous when G_s <= k*q, so short strings need their own
treatment — and an all-pairs pool there is NOT acceptable: for k=2, q=2
"short" means length <= 5, which is most of a word vocabulary, and a
quadratic join over it is exactly the bench-scale-fine / 100 TB-dead
shape. Instead the join runs TIERED prefixes (every tier is the same
lossless theorem at a different gram size):

- tier q (default 2): both sides longer than S_q = (k+1)*q - 1;
- tier 1 (unigrams):  both sides of length in (k, S_q + k] — single-char
  grams give G_s = |s| > k, so the filter bites; the prefix is the k+1
  rarest characters;
- residual all-pairs pool: ONLY strings of length <= 2k (a handful of
  characters; the distinct population is alphabet-bounded for real), with
  at least one side <= k.

Every within-distance pair lands fully inside one tier (lengths differ
by <= k, so both sides of a short-side pair fit the next tier down), and
candidates from any tier are verified with exact ``levenshtein`` —
a built-in in BOTH engines and integer-exact by definition, so the
DuckDB twin needs no quantization fences anywhere.

Spark shape per tier: gram explode -> global gram-frequency groupBy
(map-side combined) -> per-string top-(k*q+1) window -> gram equi-join ->
distinct pairs -> one scalar levenshtein filter. Every corpus-sized
frame is the deduped string table, never raw documents; at 100 TB the
string table is the Heaps-law vocabulary, the prefix index is (k*q+1)x
that, and the only shuffles are the gram groupBys and the gram joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_Q = 2
DEFAULT_K = 1


def qgrams(strings: DataFrame, s_col: str = "s", q: int = DEFAULT_Q) -> DataFrame:
    """(s, gram): positional q-gram occurrences of each string."""
    return strings.select(
        F.col(s_col).alias("s"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(length({s_col}) - {int(q)} + 1, 0)),"
                f" i -> substring({s_col}, i, {int(q)}))"
            )
        ).alias("gram"),
    )


def _prefix_pairs(st: DataFrame, q: int, k: int, len_lo: int, len_hi: int | None) -> DataFrame:
    """Candidate (a, b) pairs from one prefix-filter tier: strings with
    len_lo < length <= len_hi (len_hi=None means unbounded), indexed on
    their k*q+1 globally rarest q-grams."""
    kq1 = int(k) * int(q) + 1
    cond = F.length("s") > int(len_lo)
    if len_hi is not None:
        cond = cond & (F.length("s") <= int(len_hi))
    g = qgrams(st.filter(cond), "s", q)
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
    return (
        pa.join(pb, "gram")
        .filter(
            (F.col("a") < F.col("b"))
            & (F.abs(F.length("a") - F.length("b")) <= F.lit(int(k)))
        )
        .select("a", "b")
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
    first — that is the corpus-size cut). Lossless: pairs with both sides
    longer than S_q ride the q-gram tier; a pair whose shorter side is in
    (k, S_q] has BOTH sides <= S_q + k (lengths differ by <= k) and >= k+1
    — fully inside the unigram tier; pairs whose shorter side is <= k ride
    the residual pool (partner length <= 2k).
    """
    short_q = (int(k) + 1) * int(q) - 1  # filter vacuous at/below this
    st = strings.select(F.col(s_col).alias("s")).distinct().persist()

    tiers = [
        _prefix_pairs(st, q, k, short_q, None),
        _prefix_pairs(st, 1, k, int(k), short_q + int(k)),
    ]

    # residual pool: length <= 2k partners of length <= k strings — a few
    # characters at most, alphabet-bounded population
    sp = st.filter(F.length("s") <= 2 * int(k))
    sa = sp.select(F.col("s").alias("a"), F.length("s").alias("la"))
    sb = sp.select(F.col("s").alias("b"), F.length("s").alias("lb"))
    pool = (
        sa.join(
            sb,
            (F.col("a") < F.col("b"))
            & (F.abs(F.col("la") - F.col("lb")) <= F.lit(int(k))),
        )
        .filter((F.col("la") <= int(k)) | (F.col("lb") <= int(k)))
        .select("a", "b")
    )

    from functools import reduce

    cand = reduce(DataFrame.unionByName, tiers + [pool]).distinct()
    return cand.select(
        "a", "b", F.levenshtein("a", "b").alias("dist")
    ).filter(F.col("dist") <= F.lit(int(k)))


def _prefix_pairs_sql(
    words_cte: str, q: int, k: int, len_lo: int, len_hi: int | None, tag: str
) -> str:
    kq1 = int(k) * int(q) + 1
    hi = f"AND length(s) <= {int(len_hi)}" if len_hi is not None else ""
    return f"""
    ej_g{tag} AS MATERIALIZED (
        SELECT s, substring(s, u.i, {int(q)}) AS gram
        FROM {words_cte}, UNNEST(range(1, greatest(length(s) - {int(q)} + 1, 0) + 1)) AS u(i)
        WHERE length(s) > {int(len_lo)} {hi}
    ),
    ej_freq{tag} AS MATERIALIZED (
        SELECT gram, COUNT(*) AS gfreq FROM ej_g{tag} GROUP BY gram
    ),
    ej_prefix{tag} AS MATERIALIZED (
        SELECT s, gram FROM (
            SELECT g.s, g.gram,
                   ROW_NUMBER() OVER (
                       PARTITION BY g.s ORDER BY f.gfreq, g.gram
                   ) AS rn
            FROM ej_g{tag} g JOIN ej_freq{tag} f ON f.gram = g.gram
        ) WHERE rn <= {kq1}
    ),
    ej_cand{tag} AS (
        SELECT DISTINCT pa.s AS a, pb.s AS b
        FROM ej_prefix{tag} pa JOIN ej_prefix{tag} pb ON pb.gram = pa.gram
        WHERE pa.s < pb.s AND abs(length(pa.s) - length(pb.s)) <= {int(k)}
    )"""


def edit_join_words_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
    max_word: int = 12,
) -> str:
    """DuckDB twin of edit_join over the distinct words of a document
    table (the sub-check shape): identical tokenisation (the repo's
    whitespace class), the same tiered gram prefixes with the same
    (gfreq, gram) tie order, the same residual pool rule, and exact
    levenshtein verify."""
    short_q = (int(k) + 1) * int(q) - 1
    t2 = _prefix_pairs_sql("ej_w", q, k, short_q, None, "2")
    t1 = _prefix_pairs_sql("ej_w", 1, k, int(k), short_q + int(k), "1")
    return f"""
    WITH ej_w AS MATERIALIZED (
        SELECT DISTINCT word AS s FROM (
            SELECT unnest(list_filter(regexp_split_to_array({text_col}, '[ \t\r\n]+'),
                                      t -> t <> '')) AS word
            FROM {table}
        ) WHERE length(word) <= {int(max_word)}
    ),
    {t2},
    {t1},
    ej_pool AS (
        SELECT sa.s AS a, sb.s AS b
        FROM ej_w sa JOIN ej_w sb
          ON sa.s < sb.s AND abs(length(sa.s) - length(sb.s)) <= {int(k)}
        WHERE length(sa.s) <= {2 * int(k)} AND length(sb.s) <= {2 * int(k)}
          AND (length(sa.s) <= {int(k)} OR length(sb.s) <= {int(k)})
    ),
    ej_cand AS (
        SELECT DISTINCT a, b FROM (
            SELECT a, b FROM ej_cand2
            UNION ALL SELECT a, b FROM ej_cand1
            UNION ALL SELECT a, b FROM ej_pool
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


# ---- incremental edit join ----------------------------------------------
# The batch operator above orders gram prefixes by LIVE corpus frequency —
# the best selectivity, but an incremental store cannot afford it: new
# data would shift frequencies and invalidate every stored prefix,
# forcing an O(store) re-index per step. The prefix-filter theorem holds
# for ANY fixed global order, so the incremental variant FREEZES the
# frequency table once (from the first batch / a reference sample) and
# orders every later prefix by the frozen ranks, unseen grams ranking
# RAREST (freq 0 — an unseen gram is maximally selective). A string's
# index rows are then a pure function of (string, frozen ranks): the
# store never re-indexes, and each step costs O(batch + collisions) —
# the MinHash/SimHash/fingerprint incremental-store discipline.
#
# Why not a frequency-free hash order? Tried and rejected: on a
# low-diversity corpus (customer names sharing the literal prefix
# "Customer#") a pure md5 order can rank one of the shared grams first
# for EVERY string, and the gram join degenerates into one quadratic hot
# bucket — the exact skew the frequency order exists to avoid. Frozen
# ranks keep the selectivity (digit-region grams are rare in any
# representative sample) while staying permanent.


def edit_gram_ranks(
    strings: DataFrame,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
) -> DataFrame:
    """(qq, gram, gfreq): frozen gram-frequency table over a reference
    string set, for both tier gram sizes (q and 1). Build it ONCE from
    the first batch (or any representative sample) and persist it with
    the store — later batches reuse it verbatim."""
    st = strings.select(F.col(s_col).alias("s"))
    parts = [
        qgrams(st, "s", qq)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gfreq"))
        .select(F.lit(qq).alias("qq"), "gram", "gfreq")
        for qq in (int(q), 1)
    ]
    return parts[0].unionByName(parts[1])


def edit_prefix_index(
    strings: DataFrame,
    ranks: DataFrame,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
) -> DataFrame:
    """(s, tier, gram): frozen-rank prefix index rows for a string set.
    tier 2 = q-grams (length > S_q), tier 1 = unigrams (length in
    (k, S_q + k]), tier 0 = pool marker (length <= 2k, gram = '').
    A string of borderline length indexes in every tier that covers it —
    exactly the batch operator's tiering, so the same losslessness
    argument applies pair-by-pair. Prefix order: (frozen gfreq with
    unseen-as-0, gram) — deterministic and engine-stable."""
    short_q = (int(k) + 1) * int(q) - 1
    st = strings.select(F.col(s_col).alias("s"))

    def _tier(qq: int, lo: int, hi: int | None, tier: int) -> DataFrame:
        kq1 = int(k) * qq + 1
        cond = F.length("s") > lo
        if hi is not None:
            cond = cond & (F.length("s") <= hi)
        g = qgrams(st.filter(cond), "s", qq)
        r = ranks.filter(F.col("qq") == qq).select("gram", "gfreq")
        w = Window.partitionBy("s").orderBy(
            F.asc(F.coalesce(F.col("gfreq"), F.lit(0))), F.asc("gram")
        )
        return (
            g.join(F.broadcast(r), "gram", "left")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= kq1)
            .select("s", F.lit(tier).alias("tier"), "gram")
        )

    pool = st.filter(F.length("s") <= 2 * int(k)).select(
        "s", F.lit(0).alias("tier"), F.lit("").alias("gram")
    )
    return (
        _tier(int(q), short_q, None, 2)
        .unionByName(_tier(1, int(k), short_q + int(k), 1))
        .unionByName(pool)
    )


def edit_join_incremental(
    store_index: DataFrame,
    store_strings: DataFrame,
    batch: DataFrame,
    ranks: DataFrame,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(pairs, batch_index): edit-distance pairs INVOLVING the genuinely
    new strings of ``batch`` (vs store and vs each other), plus the index
    rows to append to the store.

    ``store_index`` is the accumulated edit_prefix_index output,
    ``store_strings`` the accumulated distinct strings (dedup of
    already-seen batch strings is an O(batch) anti-join), ``ranks`` the
    FROZEN gram-frequency table the store was indexed with
    (edit_gram_ranks — both sides must use the same order). Union of
    step-wise pairs over any batch split == the one-shot edit_join pairs
    (store-internal pairs were emitted when THEIR batch arrived).
    """
    new = (
        batch.select(F.col(s_col).alias("s"))
        .distinct()
        .join(store_strings.select(F.col(s_col).alias("s")), "s", "left_anti")
        .persist()
    )
    nidx = edit_prefix_index(new, ranks, "s", k, q).persist()
    if persist_registry is not None:
        persist_registry.extend([new, nidx])
    all_idx = store_index.unionByName(nidx)

    na = nidx.filter(F.col("tier") > 0).select(
        F.col("s").alias("a"), "tier", "gram"
    )
    ab = all_idx.filter(F.col("tier") > 0).select(
        F.col("s").alias("b"), "tier", "gram"
    )
    gram_cand = (
        na.join(ab, ["tier", "gram"])
        .filter(
            (F.col("a") != F.col("b"))
            & (F.abs(F.length("a") - F.length("b")) <= F.lit(int(k)))
        )
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    )
    np_ = nidx.filter(F.col("tier") == 0).select(F.col("s").alias("a"))
    ap = all_idx.filter(F.col("tier") == 0).select(F.col("s").alias("b"))
    pool_cand = (
        np_.join(
            ap,
            (F.col("a") != F.col("b"))
            & (F.abs(F.length("a") - F.length("b")) <= F.lit(int(k))),
        )
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
    )
    pairs = (
        gram_cand.unionByName(pool_cand)
        .distinct()
        .select("a", "b", F.levenshtein("a", "b").alias("dist"))
        .filter(F.col("dist") <= F.lit(int(k)))
    )
    return pairs, nidx


def _ranked_index_sql(words_cte: str, ranks_cte: str, k: int, q: int, tag: str) -> str:
    """Index CTE (s, tier, gram) over ``words_cte`` with the frozen-rank
    prefix order — the DuckDB mirror of edit_prefix_index."""
    short_q = (int(k) + 1) * int(q) - 1

    def tier(qq: int, lo: int, hi: int | None, t: int) -> str:
        kq1 = int(k) * qq + 1
        hi_sql = f"AND length(s) <= {int(hi)}" if hi is not None else ""
        return f"""
        SELECT s, {t} AS tier, gram FROM (
            SELECT g.s, g.gram,
                   ROW_NUMBER() OVER (
                       PARTITION BY g.s
                       ORDER BY COALESCE(r.gfreq, 0), g.gram
                   ) AS rn
            FROM (
                SELECT s, substring(s, u.i, {qq}) AS gram
                FROM {words_cte},
                     UNNEST(range(1, greatest(length(s) - {qq} + 1, 0) + 1)) AS u(i)
                WHERE length(s) > {int(lo)} {hi_sql}
            ) g LEFT JOIN {ranks_cte} r ON r.qq = {qq} AND r.gram = g.gram
        ) WHERE rn <= {kq1}"""

    return f"""
    ej_idx{tag} AS MATERIALIZED (
        {tier(int(q), short_q, None, 2)}
        UNION ALL
        {tier(1, int(k), short_q + int(k), 1)}
        UNION ALL
        SELECT s, 0 AS tier, '' AS gram FROM {words_cte}
        WHERE length(s) <= {2 * int(k)}
    )"""


def edit_join_incremental_sql(
    store_sql: str,
    batch_sql: str,
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
) -> str:
    """DuckDB twin of one edit_join_incremental step: ``store_sql`` /
    ``batch_sql`` each project a string column ``s``; ranks are frozen
    from the STORE strings (the operator contract); the emission is every
    pair involving a genuinely NEW batch string (vs store and vs each
    other)."""
    wsplit = f"""
    ej_store_w AS MATERIALIZED (SELECT DISTINCT s FROM ({store_sql}) ej_sin),
    ej_new_w AS MATERIALIZED (
        SELECT DISTINCT s FROM ({batch_sql}) ej_bin
        WHERE s NOT IN (SELECT s FROM ej_store_w)
    ),
    ej_ranks AS MATERIALIZED (
        SELECT {int(q)} AS qq, gram, COUNT(*) AS gfreq FROM (
            SELECT substring(s, u.i, {int(q)}) AS gram
            FROM ej_store_w,
                 UNNEST(range(1, greatest(length(s) - {int(q)} + 1, 0) + 1)) AS u(i)
        ) GROUP BY gram
        UNION ALL
        SELECT 1 AS qq, gram, COUNT(*) AS gfreq FROM (
            SELECT substring(s, u.i, 1) AS gram
            FROM ej_store_w, UNNEST(range(1, length(s) + 1)) AS u(i)
        ) GROUP BY gram
    )"""
    sidx = _ranked_index_sql("ej_store_w", "ej_ranks", k, q, "_s")
    nidx = _ranked_index_sql("ej_new_w", "ej_ranks", k, q, "_n")
    return f"""
    WITH {wsplit},
    {sidx},
    {nidx},
    ej_union_idx AS (
        SELECT * FROM ej_idx_s UNION ALL SELECT * FROM ej_idx_n
    ),
    ej_inc_cand AS (
        SELECT DISTINCT least(na.s, ab.s) AS a, greatest(na.s, ab.s) AS b
        FROM ej_idx_n na JOIN ej_union_idx ab
          ON ab.tier = na.tier AND ab.gram = na.gram
        WHERE na.tier > 0 AND na.s <> ab.s
          AND abs(length(na.s) - length(ab.s)) <= {int(k)}
        UNION
        SELECT DISTINCT least(np.s, ap.s) AS a, greatest(np.s, ap.s) AS b
        FROM ej_idx_n np JOIN ej_union_idx ap
          ON ap.tier = 0 AND np.tier = 0
        WHERE np.s <> ap.s AND abs(length(np.s) - length(ap.s)) <= {int(k)}
    )
    SELECT a, b, CAST(levenshtein(a, b) AS INT) AS dist
    FROM ej_inc_cand WHERE levenshtein(a, b) <= {int(k)}
    """
