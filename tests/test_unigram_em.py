"""EM-mode unigram refinement (operators/unigram.em_refine): hard-EM
(Viterbi) usage re-estimation + pruning. The registry sub-check keeps
the base induction; EM mode gets BOTH a full DuckDB twin
(test_em_duckdb_twin_exact: unigram_sql(em_rounds=k), exact row
equality at k = 0, 1, 2) and Spark-side contract pins:

- brute-force likelihood parity: after EM the Viterbi segmentation of
  every word still equals the exhaustive-enumeration argmin under the
  refined costs, and the refined model's total corpus cost is <= the
  base model's (re-costing to the actually-used pieces can only shrink
  the Viterbi objective measured under the new model's own normaliser
  restricted to surviving pieces... pinned empirically on this corpus);
- pruning: the bottom prune_frac multi-char pieces by usage are gone,
  single chars all survive;
- determinism: two runs produce identical vocab + segmentations.
"""

from __future__ import annotations

import math
from itertools import product

import pyspark.sql.functions as F

from carrot_transform_spark.operators.unigram import (
    em_refine,
    piece_vocab,
    unigram_encode_docs,
    viterbi_segment,
    word_counts,
)

_CORPUS = [
    "banana bandana ban b anana nabana",
    "banana banana ban band bandana",
    "cab cabban bancab ban banana",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_CORPUS)], "doc_id long, text string"
    )


def _brute_best(word: str, costs: dict[str, int], max_piece: int):
    """Exhaustive minimum-(cost, seg) segmentation via all cut subsets."""
    n = len(word)
    best = None
    for cuts in product([0, 1], repeat=n - 1):
        bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
        if any(len(p) > max_piece or p not in costs for p in pieces):
            continue
        cand = (sum(costs[p] for p in pieces), "\x1f".join(pieces))
        if best is None or cand < best:
            best = cand
    return best


def test_em_viterbi_matches_bruteforce(spark):
    wc = word_counts(_docs(spark), max_word=8)
    base = piece_vocab(wc, max_piece=3, min_count=2)
    refined = em_refine(wc, base, em_rounds=1, prune_frac=0.25, max_word=8, max_piece=3)
    costs = {r["piece"]: r["cost"] for r in refined.collect()}
    seg = viterbi_segment(wc, refined, max_word=8, max_piece=3).collect()
    assert seg, "refined vocab must still segment the corpus"
    for r in seg:
        exp = _brute_best(r["word"], costs, max_piece=3)
        assert exp is not None, f"{r['word']} unsegmentable under refined vocab"
        assert (r["cost"], r["seg"]) == exp, r["word"]


def test_em_prunes_low_usage_and_keeps_chars(spark):
    wc = word_counts(_docs(spark), max_word=8)
    base = piece_vocab(wc, max_piece=3, min_count=2)
    base_rows = base.collect()
    n_multi = sum(1 for r in base_rows if len(r["piece"]) > 1)
    refined = em_refine(wc, base, em_rounds=1, prune_frac=0.25, max_word=8, max_piece=3)
    ref_rows = refined.collect()
    ref_multi = sum(1 for r in ref_rows if len(r["piece"]) > 1)
    assert ref_multi == n_multi - int(n_multi * 0.25)
    base_chars = {r["piece"] for r in base_rows if len(r["piece"]) == 1}
    ref_chars = {r["piece"] for r in ref_rows if len(r["piece"]) == 1}
    assert ref_chars == base_chars

    # pruned pieces are exactly the lowest-usage ones: every surviving
    # multi-char piece's usage >= every pruned piece's usage
    seg0 = viterbi_segment(wc, base, max_word=8, max_piece=3)
    used = {
        r["piece"]: r["u"]
        for r in seg0.select(
            F.explode(F.split("seg", "\x1f")).alias("piece"), "cnt"
        )
        .groupBy("piece")
        .agg(F.sum("cnt").alias("u"))
        .collect()
    }
    surviving = {r["piece"] for r in ref_rows if len(r["piece"]) > 1}
    pruned = {r["piece"] for r in base_rows if len(r["piece"]) > 1} - surviving
    if surviving and pruned:
        assert min(used.get(p, 0) for p in surviving) >= max(
            used.get(p, 0) for p in pruned
        )


def test_em_total_cost_improves_on_skewed_corpus(spark):
    # EM concentrates mass on the pieces the model actually uses: the
    # total Viterbi cost under the refined model (its own normaliser)
    # drops vs the base model on a corpus with heavy piece reuse
    wc = word_counts(_docs(spark), max_word=8)
    base = piece_vocab(wc, max_piece=3, min_count=2)

    def total_cost(pv):
        seg = viterbi_segment(wc, pv, max_word=8, max_piece=3)
        return seg.agg(F.sum(F.col("cost") * F.col("cnt"))).collect()[0][0]

    c_base = total_cost(base)
    c_ref = total_cost(
        em_refine(wc, base, em_rounds=1, prune_frac=0.25, max_word=8, max_piece=3)
    )
    assert c_ref < c_base, (c_ref, c_base)


def test_em_mode_flag_and_determinism(spark):
    d = _docs(spark)
    a = unigram_encode_docs(d, max_word=8, max_piece=3, min_count=2, em_rounds=1)
    b = unigram_encode_docs(d, max_word=8, max_piece=3, min_count=2, em_rounds=1)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b
    base = unigram_encode_docs(d, max_word=8, max_piece=3, min_count=2)
    assert rows_a != sorted(tuple(r) for r in base.collect())


def test_em_duckdb_twin_exact(spark, tmp_path):
    """unigram_sql(em_rounds=k) is a full oracle twin of the EM mode:
    exact row equality (not just hashes) for k = 0, 1, 2 on a corpus
    with enough reuse that pruning and re-costing both fire."""
    import duckdb

    from carrot_transform_spark.operators.unigram import unigram_sql

    docs = _docs(spark)
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    for k in (0, 1, 2):
        srows = sorted(
            tuple(r)
            for r in unigram_encode_docs(
                docs, max_word=8, max_piece=3, min_count=2, em_rounds=k
            ).collect()
        )
        orows = sorted(
            tuple(r)
            for r in con.execute(
                unigram_sql(max_word=8, max_piece=3, min_count=2, em_rounds=k)
            ).fetchall()
        )
        assert srows == orows, f"em_rounds={k}"


def test_em_prune_frac_double_arithmetic_twin(spark):
    """Non-default prune_frac with NEGATIVE repr error (0.29: the nearest
    double is below the decimal value) must floor identically in both
    engines. DuckDB parses a bare decimal literal as exact DECIMAL —
    100 * 0.29 = 29.00 exact, floor 29 — while Spark/Python compute the
    IEEE product 28.999...996, floor 28. The SQL twin therefore CASTs the
    literal to DOUBLE so both engines floor the identical IEEE product."""
    import duckdb

    from carrot_transform_spark.operators.unigram import unigram_sql

    con = duckdb.connect()
    # unit pin of the divergence class itself: the bare literal diverges
    # from Python, the CAST(... AS DOUBLE) form matches it
    bare = con.execute("SELECT CAST(floor(100 * 0.29) AS BIGINT)").fetchone()[0]
    dbl = con.execute(
        "SELECT CAST(floor(100 * CAST(0.29 AS DOUBLE)) AS BIGINT)"
    ).fetchone()[0]
    assert bare == 29 and dbl == 28 and int(100 * 0.29) == 28

    # and the emitted SQL uses the DOUBLE form
    sql = unigram_sql(max_word=8, max_piece=3, min_count=2, em_rounds=1,
                      prune_frac=0.29)
    assert "CAST(0.29 AS DOUBLE)" in sql

    # full twin at the negative-repr-error frac
    docs = _docs(spark)
    con.register("documents", docs.toPandas())
    srows = sorted(
        tuple(r)
        for r in unigram_encode_docs(
            docs, max_word=8, max_piece=3, min_count=2, em_rounds=1,
            prune_frac=0.29,
        ).collect()
    )
    orows = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert srows == orows


# ------------------------------------------------------------- soft EM
#
# em_mode="soft" (round-15): the E-step is the forward-backward pass over
# the same lattice — MARGINAL expected piece counts over all segmentations
# (Kudo 2018 §3.2 as published), in quantized-double + exact-DECIMAL
# arithmetic (operators/unigram.soft_expected_counts / _lse_round).


def test_soft_expected_counts_match_bruteforce(spark):
    """Forward-backward marginals == exhaustive enumeration: for every
    piece, Σ_w cnt_w · Σ_seg P(seg|w) · count(piece in seg), P from the
    integer costs. The only divergence allowed is the documented
    quantization (fround at 1e-12/1e-9), orders below the count scale."""
    from carrot_transform_spark.operators.unigram import (
        _COST_SCALE,
        piece_vocab,
        soft_expected_counts,
        word_counts,
    )

    wc = word_counts(_docs(spark), max_word=8)
    pv = piece_vocab(wc, max_piece=3, min_count=2)
    costs = {r["piece"]: r["cost"] for r in pv.collect()}
    wrows = {r["word"]: r["cnt"] for r in wc.collect()}

    def segs(word, maxp=3):
        n = len(word)
        for cuts in product([0, 1], repeat=n - 1):
            bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            ps = [word[bounds[i] : bounds[i + 1]] for i in range(len(bounds) - 1)]
            if all(len(p) <= maxp and p in costs for p in ps):
                yield ps

    exp_counts: dict[str, float] = {}
    for word, cnt in wrows.items():
        tot = 0.0
        per: dict[str, float] = {}
        for ps in segs(word):
            p = math.exp(-sum(costs[x] for x in ps) / _COST_SCALE)
            tot += p
            for x in ps:
                per[x] = per.get(x, 0.0) + p
        for x, v in per.items():
            exp_counts[x] = exp_counts.get(x, 0.0) + cnt * v / tot

    soft = {
        r["piece"]: float(r["used"])
        for r in soft_expected_counts(wc, pv, 8, 3).collect()
    }
    assert set(soft) == {p for p, v in exp_counts.items() if v > 0} | set(soft)
    for x in set(exp_counts) | set(soft):
        assert math.isclose(
            exp_counts.get(x, 0.0), soft.get(x, 0.0), abs_tol=1e-3
        ), x


def test_soft_em_duckdb_twin_exact(spark):
    """unigram_sql(em_rounds=k, em_mode='soft') is a full oracle twin:
    exact row equality at k = 1, 2 — the forward-backward marginal
    arithmetic (BIGINT cost diffs, fround-fenced exp/ln, DECIMAL sums)
    pins across engines."""
    import duckdb

    from carrot_transform_spark.operators.unigram import unigram_sql

    docs = _docs(spark)
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    for k in (1, 2):
        srows = sorted(
            tuple(r)
            for r in unigram_encode_docs(
                docs, max_word=8, max_piece=3, min_count=2, em_rounds=k,
                em_mode="soft",
            ).collect()
        )
        orows = sorted(
            tuple(r)
            for r in con.execute(
                unigram_sql(
                    max_word=8, max_piece=3, min_count=2, em_rounds=k,
                    em_mode="soft",
                )
            ).fetchall()
        )
        assert srows == orows, f"soft em_rounds={k}"


def test_soft_em_mode_contract(spark):
    from carrot_transform_spark.operators.unigram import (
        em_refine, piece_vocab, unigram_sql, word_counts,
    )

    d = _docs(spark)
    # deterministic + differs from both the base model and hard EM
    a = sorted(tuple(r) for r in unigram_encode_docs(
        d, max_word=8, max_piece=3, min_count=2, em_rounds=1, em_mode="soft"
    ).collect())
    b = sorted(tuple(r) for r in unigram_encode_docs(
        d, max_word=8, max_piece=3, min_count=2, em_rounds=1, em_mode="soft"
    ).collect())
    assert a == b
    hard = sorted(tuple(r) for r in unigram_encode_docs(
        d, max_word=8, max_piece=3, min_count=2, em_rounds=1
    ).collect())
    assert a != hard
    # pruning contract holds in soft mode too: single chars all survive,
    # multi-char count drops by the floor rule
    wc = word_counts(d, max_word=8)
    base = piece_vocab(wc, max_piece=3, min_count=2)
    base_rows = base.collect()
    n_multi = sum(1 for r in base_rows if len(r["piece"]) > 1)
    ref = em_refine(
        wc, base, em_rounds=1, prune_frac=0.25, max_word=8, max_piece=3,
        em_mode="soft",
    ).collect()
    assert sum(1 for r in ref if len(r["piece"]) > 1) == n_multi - int(n_multi * 0.25)
    assert {r["piece"] for r in ref if len(r["piece"]) == 1} == {
        r["piece"] for r in base_rows if len(r["piece"]) == 1
    }
    # unknown mode rejected
    import pytest

    with pytest.raises(ValueError):
        em_refine(wc, base, em_mode="fuzzy")
    with pytest.raises(ValueError):
        unigram_sql(em_mode="fuzzy")
