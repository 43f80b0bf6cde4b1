"""Edit-distance similarity join (operators/editjoin.py).

Verified by brute-force equivalence (the blocking must be LOSSLESS: the
operator's pairs equal all-pairs Levenshtein on random corpora, k=1 and
k=2, including short strings that ride the length-bucket pool), hand
cases for the prefix/pool split, and the DuckDB twin row-for-row on
real test data."""

from __future__ import annotations

import itertools
import random

import duckdb
import pyspark.sql.functions as F

from carrot_transform_spark.operators.editjoin import (
    edit_join,
    edit_join_words,
    edit_join_words_sql,
)


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def _brute(strings: list[str], k: int) -> set[tuple[str, str, int]]:
    out = set()
    for a, b in itertools.combinations(sorted(set(strings)), 2):
        d = _lev(a, b)
        if d <= k:
            out.add((a, b, d))
    return out


def _rand_corpus(seed: int, n: int = 60) -> list[str]:
    rng = random.Random(seed)
    base = ["cat", "cart", "card", "care", "a", "ab", "abc", "xyzzy", "spark"]
    out = []
    for _ in range(n):
        w = list(rng.choice(base))
        for _ in range(rng.randint(0, 2)):
            op = rng.randint(0, 2)
            p = rng.randrange(len(w) + (op == 1)) if w or op == 1 else 0
            if op == 0 and w:
                w[p] = rng.choice("abcdex")
            elif op == 1:
                w.insert(p, rng.choice("abcdex"))
            elif w:
                del w[p]
        if w:
            out.append("".join(w))
    return out


def test_lossless_vs_bruteforce_k1(spark):
    strings = _rand_corpus(11)
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r["a"], r["b"], r["dist"]) for r in edit_join(df, k=1).collect()}
    assert got == _brute(strings, 1)


def test_lossless_vs_bruteforce_k2(spark):
    strings = _rand_corpus(23, n=40)
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r["a"], r["b"], r["dist"]) for r in edit_join(df, k=2).collect()}
    assert got == _brute(strings, 2)


def test_short_and_long_mix(spark):
    """Pairs mixing a short-pool string with a longer one must not be
    lost: 'ab' vs 'abc' (dist 1) crosses the pool boundary at k=1, q=2."""
    strings = ["ab", "abc", "abcd", "x", "xy", "abcdefgh"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r["a"], r["b"], r["dist"]) for r in edit_join(df, k=1).collect()}
    assert got == _brute(strings, 1)
    assert ("ab", "abc", 1) in got


def test_no_false_positives_and_exact_distances(spark):
    strings = ["kitten", "sitting", "kitchen", "mitten"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {(r["a"], r["b"], r["dist"]) for r in edit_join(df, k=2).collect()}
    assert got == {("kitten", "mitten", 1), ("kitchen", "kitten", 2)}


def test_prefix_index_is_constant_width(spark):
    """Each gram-path string indexes exactly k*q+1 grams (the prefix
    filter's skew/fan-out bound) — count the index rows directly."""
    from carrot_transform_spark.operators.editjoin import DEFAULT_K, DEFAULT_Q, qgrams

    strings = ["abcdefgh", "abcdefgx", "qrstuvwx"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    kq1 = DEFAULT_K * DEFAULT_Q + 1
    g = qgrams(df.select(F.col("s")), "s", DEFAULT_Q)
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("gfreq"))
    from pyspark.sql import Window

    w = Window.partitionBy("s").orderBy(F.asc("gfreq"), F.asc("gram"))
    prefix = (
        g.join(freq, "gram")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kq1)
    )
    per = {r["s"]: r["n"] for r in prefix.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == kq1 for v in per.values())


def test_sql_twin_matches_spark(spark, sf_dir):
    from carrot_transform_spark.queries import load

    # k=2: the synthetic corpus has no typo-level (k=1) word pairs, but
    # plenty of distance-2 dictionary neighbours (scan/span, line/like)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    srows = sorted(
        (r["a"], r["b"], r["dist"]) for r in edit_join_words(d, k=2).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 150"
    )
    orows = sorted(tuple(r) for r in con.execute(edit_join_words_sql(k=2)).fetchall())
    assert srows == orows
    assert len(srows) > 0  # the check is vacuous on an empty pair set


# ---- incremental --------------------------------------------------------

def test_incremental_union_equals_batch(spark):
    """THE incremental-correctness property: splitting the corpus into
    batches and unioning each step's pairs reproduces the one-shot join
    exactly (store-internal pairs were emitted when their batch arrived)."""
    from carrot_transform_spark.operators.editjoin import (
        edit_gram_ranks,
        edit_join,
        edit_join_incremental,
        edit_prefix_index,
    )

    strings = _rand_corpus(31, n=50)
    sdf = spark.createDataFrame([(s,) for s in set(strings)], "s string")
    full = {(r["a"], r["b"], r["dist"]) for r in edit_join(sdf, k=2).collect()}

    batches = [list(set(strings))[i::3] for i in range(3)]
    # ranks frozen from the FIRST batch only — later batches reuse them,
    # which is the whole point (no store re-index when frequencies shift)
    first = spark.createDataFrame([(s,) for s in batches[0]], "s string")
    ranks = edit_gram_ranks(first, k=2).persist()
    empty = spark.createDataFrame([], "s string")
    store_idx = edit_prefix_index(empty, ranks, k=2)
    store_str = empty
    got = set()
    for b in batches:
        bdf = spark.createDataFrame([(s,) for s in b] or [("",)], "s string").filter(
            F.col("s") != ""
        )
        pairs, nidx = edit_join_incremental(store_idx, store_str, bdf, ranks, k=2)
        got |= {(r["a"], r["b"], r["dist"]) for r in pairs.collect()}
        store_idx = store_idx.unionByName(nidx)
        store_str = store_str.unionByName(bdf.select("s")).distinct()
    assert got == full


def test_incremental_repeated_batch_is_noop(spark):
    from carrot_transform_spark.operators.editjoin import (
        edit_gram_ranks,
        edit_join_incremental,
        edit_prefix_index,
    )

    strings = ["cat", "cart", "card"]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    ranks = edit_gram_ranks(sdf, k=1)
    idx = edit_prefix_index(sdf, ranks, k=1)
    pairs, nidx = edit_join_incremental(idx, sdf, sdf, ranks, k=1)
    assert pairs.count() == 0  # nothing genuinely new
    assert nidx.count() == 0


def test_incremental_sql_twin_matches_spark(spark, sf_dir):
    """Customer names (unique zero-padded numbers) make a real
    incremental corpus: every odd-custkey batch name is genuinely new
    and has digit-substitution neighbours in the even-custkey store.
    (Document words are useless here — the synthetic vocabulary is ~31
    words shared by every split, so the new-string set is empty.)"""
    from carrot_transform_spark.operators.editjoin import (
        edit_gram_ranks,
        edit_join_incremental,
        edit_join_incremental_sql,
        edit_prefix_index,
    )
    from carrot_transform_spark.queries import load

    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 150)
    sw = c.filter(F.col("c_custkey") % 2 == 0).select(F.col("c_name").alias("s"))
    bw = c.filter(F.col("c_custkey") % 2 == 1).select(F.col("c_name").alias("s"))
    ranks = edit_gram_ranks(sw, k=1)
    sidx = edit_prefix_index(sw, ranks, k=1)
    pairs, _ = edit_join_incremental(sidx, sw, bw, ranks, k=1)
    srows = sorted((r["a"], r["b"], r["dist"]) for r in pairs.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{sf_dir}/customer.parquet')"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            edit_join_incremental_sql(
                "SELECT c_name AS s FROM customer WHERE c_custkey < 150 AND c_custkey % 2 = 0",
                "SELECT c_name AS s FROM customer WHERE c_custkey < 150 AND c_custkey % 2 = 1",
                k=1,
            )
        ).fetchall()
    )
    assert srows == orows
    assert len(srows) > 0
