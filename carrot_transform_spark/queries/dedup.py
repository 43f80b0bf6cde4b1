"""Deduplication suite over the documents table.

Four families, all shuffle-conscious:

- exact:        hash-groupBy on a canonical fingerprint (one shuffle on the
                16-byte hash, not the document text).
- ngram-jaccard: shingle inverted index -> candidate pairs -> exact Jaccard
                verification. Candidate generation is the scale lever: we
                join on shingle hash (small key), never doc x doc.
- minhash-lsh:  k-permutation MinHash signatures (shared deterministic
                md5-based hash so the DuckDB oracle reproduces them bit-for
                bit) -> banded LSH bucket join -> verified Jaccard.
- simhash:      bitwise majority over token hashes; near-dup = small
                Hamming distance. Signature computation shown here.

100 TB posture: every stage keys on fixed-width hashes; shingle explosion
is the only row-multiplying step and collapses immediately into per-doc
(min-)aggregates; candidate pairs are bounded by bucket collision counts,
and the band join is an equi-join Catalyst can shuffle-hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from carrot_transform_spark.functions.rounding import fround, fround_sql
from carrot_transform_spark.queries import load, qpersist, register, register_suite

# shared deterministic 32-bit hash: identical in Spark and DuckDB
#   spark : conv(substring(md5(s), 1, 8), 16, 10)::bigint
#   duckdb: CAST('0x' || substring(md5(s), 1, 8) AS UBIGINT)


def _h32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def _h32_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, 8)) AS UBIGINT)"


def _tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def shingles_sql(pred: str = "") -> str:
    """The shingle CTE body; ``pred`` is an extra doc-level predicate
    (the pipe-ops suite bounds its heavy sub-checks to a fixed doc-id
    slice that is a no-op at the sf0.01 gate)."""
    where = f"{pred} AND " if pred else ""
    return f"""
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 0)),
                   i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                        regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                        regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
        FROM documents
        WHERE {where}len(regexp_split_to_array(trim(text), '\\s+')) >= 3
"""


_SHINGLES_SQL = """
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(len(regexp_split_to_array(trim(text), '\\s+')) - 2, 0)),
                   i -> regexp_split_to_array(trim(text), '\\s+')[i] || ' ' ||
                        regexp_split_to_array(trim(text), '\\s+')[i+1] || ' ' ||
                        regexp_split_to_array(trim(text), '\\s+')[i+2])) AS shingles
        FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 3
"""


def _shingles(col: Column) -> Column:
    """Distinct 3-word shingles, as strings 'w1 w2 w3'."""
    toks = _tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        )
    )


def _exploded_shingles(
    spark: SparkSession,
    sf_dir: str,
    persist: bool = False,
    max_doc_id: int | None = None,
) -> DataFrame:
    """(doc_id, n, s): one row per distinct shingle per doc. The tokens array
    is materialized once per row (single projection); callers that traverse
    the index several times (signature + candidate + verify stages) pass
    persist=True so the explosion happens exactly once. ``max_doc_id``
    bounds the corpus BEFORE the shingle transform (suite scale cap)."""
    d = load(spark, sf_dir, "documents")
    if max_doc_id is not None:
        d = d.filter(F.col("doc_id") < max_doc_id)
    # the corpus file is small enough to land in one scan partition, but the
    # shingle transform is the expensive (interpreted, HOF) stage — spread it
    # across cores first; at real scale the scan itself is many splits and
    # this hash-repartition also pre-buckets the doc_id aggregations
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 3
    )
    sh = toks.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("toks", i),
                    F.element_at("toks", i + 1),
                    F.element_at("toks", i + 2),
                ),
            )
        ).alias("shingles"),
    )
    # explode_outer, NOT explode: plain explode adds an implicit
    # size(shingles)>0 pushdown predicate that re-evaluates the whole
    # (interpreted) shingle transform per row below the exchange — measured
    # 9.6s -> 0.6s at sf0.1 for this stage
    e = sh.select(
        "doc_id", F.size("shingles").alias("n"), F.explode_outer("shingles").alias("s")
    ).filter(F.col("s").isNotNull())
    # qpersist (not bare persist): registers the cache for release at the
    # next registry-query invocation, so back-to-back driver runs don't
    # accumulate shingle indexes until LRU thrash. Lazy — callers decide
    # when to materialize (most .count() right before a multi-branch DAG).
    return qpersist(e, eager=False) if persist else e


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


@register(
    "dd_exact_groups",
    oracle="""
    SELECT md5(lower(trim(text))) AS fingerprint,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
    tags=("dedup", "exact"),
)
def dd_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim("text"))).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("canonical_doc_id"))
        .orderBy("fingerprint")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup: inverted index -> candidates -> verify
# ---------------------------------------------------------------------------


_NGRAM_SQL = f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
    cand AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS inter, ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
        FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b,
           {fround_sql("inter * 1.0 / (na + nb - inter)")} AS jaccard
    FROM cand
    WHERE inter * 1.0 / (na + nb - inter) >= 0.8
    ORDER BY doc_a, doc_b
    """


def ngram_sql(pred: str = "") -> str:
    """_NGRAM_SQL with an extra doc-level predicate on the shingle CTE."""
    out = _NGRAM_SQL.replace(_SHINGLES_SQL, shingles_sql(pred), 1)
    # a textual replace that silently no-ops (embedded constant drifted)
    # would run the oracle UNSLICED while the Spark side stays sliced — a
    # confusing gate failure far from the cause; fail HERE instead
    assert pred == "" or out != _NGRAM_SQL, (
        "ngram_sql: _SHINGLES_SQL not found inside _NGRAM_SQL — the "
        "embedded shingle CTE drifted from shingles_sql()"
    )
    return out


def dd_ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None = None
) -> DataFrame:
    """Near-duplicate pairs with 3-gram Jaccard >= 0.8. Candidate pairs come
    from the shingle inverted index (equi-join on shingle), so cost is
    sum-over-shingles(df^2), not |docs|^2."""
    e = _exploded_shingles(spark, sf_dir, max_doc_id=max_doc_id)
    a = e.alias("a")
    b = e.alias("b")
    cand = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.any_value(F.col("a.n")).alias("na"),
            F.any_value(F.col("b.n")).alias("nb"),
        )
    )
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        cand.filter(jac >= 0.8)
        .select("doc_a", "doc_b", fround(jac).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MINHASH_K = 8  # 8 hash functions -> 4 bands x 2 rows


def _minhash_sig_sql(pred: str = "") -> str:
    """DuckDB SQL computing the k minhash values per doc (columns mh0..mh7):
    one md5 base hash per shingle, k universal-hash (a*h+b) mod P
    derivations — the exact salt table the Spark plan uses
    (operators/dedup.minhash_salts). ``pred``: extra doc predicate on the
    shingle CTE (suite scale caps)."""
    from carrot_transform_spark.operators.dedup import MH_PRIME, minhash_salts

    parts = [
        f"MIN(CAST(({a} * hs + {b}) % {MH_PRIME} AS BIGINT)) AS mh{i}"
        for i, (a, b) in enumerate(minhash_salts(_MINHASH_K))
    ]
    mins = ", ".join(parts)
    return f"""
    WITH sh AS ({shingles_sql(pred) if pred else _SHINGLES_SQL}),
    eu AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    e AS MATERIALIZED (SELECT doc_id, {_h32_sql('s')} AS hs FROM eu)
    SELECT doc_id, {mins} FROM e GROUP BY doc_id
    """


def dd_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 MinHash signature per document. One explode + one groupBy(min);
    one md5 per exploded row (not k) — the k permutations are cheap integer
    derivations — so there's a single shuffle keyed on doc_id."""
    from carrot_transform_spark.operators.dedup import MH_PRIME, minhash_salts

    e = _exploded_shingles(spark, sf_dir)
    base = _h32(F.col("s"))
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % MH_PRIME).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_salts(_MINHASH_K))
    ]
    return e.groupBy("doc_id").agg(*aggs).orderBy("doc_id")


# Prepared-plan memo for the LSH query (same pattern as _PREPARED_PLANS,
# which this builder can't join directly because it has per-call side
# effects: the shingle index must be re-persisted and eagerly materialized
# on EVERY invocation — bench isolation clears it between repeats). On a
# hit we re-run exactly those side effects (re-register the persist, count
# through a fresh wrapper so the cache lookup finds the new entry) and
# skip only the ~0.3 s of py4j plan construction. The check-then-set and
# the _QUERY_CACHES registration are guarded by a lock so a racing miss
# can't double-build and leak one persisted index (the query is not built
# from suite threads today, but the memo must not depend on that).
import threading as _threading

_MINHASH_LOCK = _threading.Lock()
_MINHASH_MEMO: dict[tuple[int, str], tuple[DataFrame, DataFrame]] = {}


@register(
    "dd_minhash_lsh_pairs",
    oracle=f"""
    WITH sig AS MATERIALIZED ({_minhash_sig_sql()}),
    bands AS (
        SELECT doc_id, 0 AS band, CONCAT(mh0, '_', mh1) AS bkey FROM sig
        UNION ALL SELECT doc_id, 1, CONCAT(mh2, '_', mh3) FROM sig
        UNION ALL SELECT doc_id, 2, CONCAT(mh4, '_', mh5) FROM sig
        UNION ALL SELECT doc_id, 3, CONCAT(mh6, '_', mh7) FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    sh AS ({_SHINGLES_SQL}),
    e AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS s, len(shingles) AS n FROM sh),
    verified AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS inter,
               ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb
        FROM cand c
        JOIN e a ON a.doc_id = c.doc_a
        JOIN e b ON b.doc_id = c.doc_b AND b.s = a.s
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, {fround_sql("inter * 1.0 / (na + nb - inter)")} AS jaccard
    FROM verified
    WHERE inter * 1.0 / (na + nb - inter) >= 0.7
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "minhash", "lsh", "bench"),
)
def dd_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH (4 bands x 2 rows) over MinHash signatures, then exact
    Jaccard verification of the candidates. The band join is an equi-join on
    (band, band-key) — tiny keys, shuffle-hash friendly; verification only
    touches candidate docs."""
    from carrot_transform_spark.queries import _QUERY_CACHES, _fresh_rewrap

    key = (id(spark), sf_dir)
    with _MINHASH_LOCK:
        memo = _MINHASH_MEMO.get(key)
        if memo is not None:
            e_memo, final = memo
            try:
                e_memo.persist()  # re-register (bench isolation cleared it)
                if e_memo not in _QUERY_CACHES:  # released at next registry query
                    _QUERY_CACHES.append(e_memo)
                _fresh_rewrap(e_memo).count()  # eager materialization, fresh QE
                return _fresh_rewrap(final)
            except Exception:
                _MINHASH_MEMO.pop(key, None)  # private API moved: rebuild below
        e, out = _build_minhash_plan(spark, sf_dir)
        _MINHASH_MEMO[key] = (e, out)
        return out


def _build_minhash_plan(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build (persisted shingle index, final LSH-pairs plan); the index is
    eagerly materialized here. Callers hold _MINHASH_LOCK."""
    from carrot_transform_spark.operators.dedup import MH_PRIME, minhash_salts

    e = _exploded_shingles(spark, sf_dir, persist=True)
    # eager materialization: the DAG reads e three times (signatures +
    # both sides of the verify join); without this the cold cache is raced
    # and recomputed per branch within the single downstream action
    e.count()
    base = _h32(F.col("s"))
    aggs = [
        F.min((F.lit(a) * base + F.lit(b)) % MH_PRIME).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_salts(_MINHASH_K))
    ]
    sig = e.groupBy("doc_id").agg(*aggs)
    band_cols = [
        F.struct(F.lit(bi).alias("band"), F.concat_ws("_", f"mh{2*bi}", f"mh{2*bi+1}").alias("bkey"))
        for bi in range(_MINHASH_K // 2)
    ]
    bands = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    ba = bands.alias("a")
    bb = bands.alias("b")
    cand = (
        ba.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify joins (guide §3.1): cand (LSH bucket collisions, pairs only)
    # carries an explicit broadcast hint. The SECOND join's cand⋈ea side
    # carries a SHUFFLE_HASH hint: that side grows as |cand| x shingles-
    # per-doc — linear in corpus size — so the r15 session-1 forced
    # BROADCAST of it regressed sf10 ~30% (a 1.3M-row driver-built hash
    # relation per run), but as a shuffled-hash BUILD side it is bounded
    # per partition and skips the sort of the far larger index side
    # (26M rows at sf10). r16 interleaved sf10 A/B (identical 25,593
    # pairs): SHUFFLE_HASH 20.3 s vs planner-chosen SMJ 27.0 s over 3
    # rounds. The hint is size-gated (prefer_shuffle_hash on the
    # materialized index — e.count() above makes its stats the ACTUAL
    # cached bytes): below the broadcast threshold the planner's
    # broadcast is strictly better and the hint would suppress it
    # (measured +0.7 s/run at sf0.1). Hinting the INDEX side instead
    # OOMs the per-partition hash map (measured) — never build the index.
    from carrot_transform_spark.operators.dedup import prefer_shuffle_hash

    ea = e.alias("ea")
    eb = e.alias("eb")
    hits_a = F.broadcast(cand).join(ea, F.col("ea.doc_id") == F.col("doc_a"))
    left = hits_a.select(
        "doc_a", "doc_b", F.col("ea.s").alias("s_a"), F.col("ea.n").alias("na")
    )
    if prefer_shuffle_hash(e):
        left = left.hint("shuffle_hash")
    verified = (
        left.join(eb, (F.col("eb.doc_id") == F.col("doc_b")) & (F.col("eb.s") == F.col("s_a")))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.any_value(F.col("na")).alias("na"),
            F.any_value(F.col("eb.n")).alias("nb"),
        )
    )
    jac = F.col("inter") * 1.0 / (F.col("na") + F.col("nb") - F.col("inter"))
    out = (
        verified.filter(jac >= 0.7)
        .select("doc_a", "doc_b", fround(jac).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )
    return e, out


# ---------------------------------------------------------------------------
# SimHash signatures
# ---------------------------------------------------------------------------

# 64-bit SimHash as two 32-bit halves (see operators/dedup.simhash_signatures
# for why halves beat a packed int64), 16-bit prefix blocking
_SIMHASH_SIG_SQL = f"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents WHERE LENGTH(trim(text)) > 0
    ),
    th AS (SELECT doc_id, {_h32_sql('t')} AS hl, {_h32_sql("t || '#H'")} AS hh FROM tok),
    bits AS (
        SELECT doc_id, i,
               SUM(CASE WHEN (hl >> i) & 1 = 1 THEN 1 ELSE -1 END) AS wl,
               SUM(CASE WHEN (hh >> i) & 1 = 1 THEN 1 ELSE -1 END) AS wh
        FROM th, UNNEST(generate_series(0, 31)) AS g(i)
        GROUP BY doc_id, i
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN wh > 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS sim_hi,
           CAST(SUM(CASE WHEN wl > 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS sim_lo
    FROM bits GROUP BY doc_id ORDER BY doc_id
    """


def dd_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash (two salted 32-bit halves): per-token hashes, per-bit
    +1/-1 majority vote, sign -> bit. Token explode x bit explode, two-level
    aggregate — all JVM-side integer ops."""
    from carrot_transform_spark.operators.dedup import simhash_signatures

    d = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return (
        simhash_signatures(d, "doc_id", "text", bits=64)
        .select(F.col("id").alias("doc_id"), "sim_hi", "sim_lo")
        .orderBy("doc_id")
    )


@register(
    "dd_simhash_hamming_pairs",
    oracle=f"""
    WITH sig AS ({_SIMHASH_SIG_SQL}),
    wb AS (SELECT doc_id, sim_hi, sim_lo, sim_hi >> 16 AS bucket FROM sig)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) AS hamming
    FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim_hi, b.sim_hi)) + bit_count(xor(a.sim_lo, b.sim_lo)) <= 8
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "simhash", "hamming"),
)
def dd_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: small Hamming distance within prefix-blocked
    buckets (64-bit signatures, 16-bit prefix -> 65k buckets; the bucket
    join bounds the pair space and bit_count(xor) is a single codegen'd
    integer op per pair)."""
    from carrot_transform_spark.operators.dedup import hamming_pairs, simhash_signatures

    d = load(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sig = qpersist(simhash_signatures(d, "doc_id", "text", bits=64))
    return (
        hamming_pairs(sig, max_distance=8, prefix_bits=16)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# suite: signature computations + exact-Jaccard index verify as one entry
# (the end-to-end LSH pair queries stay standalone above)
# ---------------------------------------------------------------------------

register_suite(
    "dd_index_suite",
    [
        (
            "dd_minhash_signatures",
            dd_minhash_signatures,
            _minhash_sig_sql() + " ORDER BY doc_id",
            [("doc_id", "i")] + [(f"mh{i}", "i") for i in range(_MINHASH_K)],
        ),
        (
            "dd_simhash_signatures",
            dd_simhash_signatures,
            _SIMHASH_SIG_SQL,
            [("doc_id", "i"), ("sim_hi", "i"), ("sim_lo", "i")],
        ),
        (
            "dd_ngram_jaccard_pairs",
            dd_ngram_jaccard_pairs,
            _NGRAM_SQL,
            [("doc_a", "i"), ("doc_b", "i"), ("jaccard", "f")],
        ),
    ],
    tags=("dedup", "suite"),
)
