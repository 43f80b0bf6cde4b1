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
