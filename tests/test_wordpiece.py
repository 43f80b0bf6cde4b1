"""WordPiece tokenizer (operators/wordpiece.py).

Verified three ways: a pure-Python greedy longest-match reference on a
hand-sized corpus (vocab induction + encoding, exact), the generated
DuckDB chained-CTE twin row-for-row on real test data, and structural
properties (continuation marking, whole-word-UNK semantics, plan shape
of the best-match join)."""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pyspark.sql.functions as F

from carrot_transform_spark.operators.wordpiece import (
    DEFAULT_MAX_PIECE,
    DEFAULT_MAX_WORD,
    DEFAULT_MIN_COUNT,
    UNK,
    wordpiece_best_match,
    wordpiece_encode,
    wordpiece_encode_docs,
    wordpiece_sql,
    wordpiece_vocab,
)
from carrot_transform_spark.operators.unigram import word_counts

_US = "\x1f"


def py_wordpiece(
    texts: list[str],
    max_word: int = DEFAULT_MAX_WORD,
    max_piece: int = DEFAULT_MAX_PIECE,
    min_count: int = DEFAULT_MIN_COUNT,
):
    """Pure-Python reference: returns (vocab dict, {word: (seg, n_tok, cnt)})."""
    wc: Counter = Counter()
    for t in texts:
        for w in t.split():
            if w and len(w) <= max_word:
                wc[w] += 1
    vocab: Counter = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece, len(w) - i) + 1):
                vocab[(w[i : i + l], 0 if i == 0 else 1)] += c
    vocab = {k: v for k, v in vocab.items() if v >= min_count}
    enc = {}
    for w, c in wc.items():
        pos, seg = 0, []
        while pos < len(w):
            m = None
            for l in range(min(max_piece, len(w) - pos), 0, -1):
                key = (w[pos : pos + l], 0 if pos == 0 else 1)
                if key in vocab:
                    m = l
                    break
            if m is None:
                seg = None
                break
            seg.append(w[pos : pos + m] if pos == 0 else "##" + w[pos : pos + m])
            pos += m
        if seg is None:
            enc[w] = (UNK, 1, c)
        else:
            enc[w] = (_US.join(seg), len(seg), c)
    return vocab, enc


def _corpus(seed: int = 5, n: int = 40):
    rng = random.Random(seed)
    words = ["the", "cat", "cats", "sat", "mat", "mats", "matting", "dog", "undo"]
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        for _ in range(n)
    ]


def test_matches_python_reference(spark):
    texts = _corpus()
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = wordpiece_encode_docs(df).collect()
    vocab, enc = py_wordpiece(texts)
    got_pieces = {r["a"]: r["n"] for r in rows if r["kind"] == "piece"}
    exp_pieces = {
        (p if ic == 0 else "##" + p): f for (p, ic), f in vocab.items()
    }
    assert got_pieces == exp_pieces
    got_words = {r["a"]: (r["b"], r["k"], r["n"]) for r in rows if r["kind"] == "word"}
    assert got_words == enc


def test_greedy_is_longest_match_first(spark):
    """The greedy coder must take the LONGEST matching piece, not the
    first or cheapest: with 'mat', 'matt' and '##ing' all frequent,
    'matting' segments as matt + ##ing, never mat + ##t + ##ing."""
    texts = ["matt " * 6 + "matting " * 6 + "ing " * 6 + "ting " * 6]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    wc = word_counts(df)
    vocab = wordpiece_vocab(wc, max_piece=4, min_count=5)
    enc = {
        r["word"]: r["seg"]
        for r in wordpiece_encode(wc, vocab, max_piece=4).collect()
    }
    assert enc["matting"].split(_US)[0] == "matt"


def test_unk_whole_word(spark):
    """One unmatchable position anywhere makes the WHOLE word [UNK] —
    the BERT convention — even when a prefix segmented fine."""
    texts = ["common " * 10 + "commonq"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    wc = word_counts(df)
    vocab = wordpiece_vocab(wc, min_count=5)
    enc = {
        r["word"]: (r["seg"], r["is_unk"])
        for r in wordpiece_encode(wc, vocab).collect()
    }
    assert enc["commonq"] == (UNK, 1)
    assert enc["common"][1] == 0


def test_initial_vs_continuation_populations(spark):
    """'s' at word start and '##s' inside words are DIFFERENT vocab
    entries with different frequencies."""
    texts = ["s s s s s cats mats hats rats bats"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    vocab = {
        (r["piece"], r["is_cont"]): r["freq"]
        for r in wordpiece_vocab(word_counts(df), min_count=5).collect()
    }
    assert vocab[("s", 0)] == 5
    assert vocab[("s", 1)] == 5


def test_best_match_vocab_broadcasts(spark):
    df = spark.createDataFrame([(0, "aa ab aa ab ba " * 3)], "doc_id long, text string")
    wc = word_counts(df)
    vocab = wordpiece_vocab(wc, min_count=2)
    plan = (
        wordpiece_best_match(wc, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_sql_twin_matches_spark(spark, sf_dir):
    from carrot_transform_spark.queries import load

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    srows = sorted(tuple(r) for r in wordpiece_encode_docs(d).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet') WHERE doc_id < 150"
    )
    orows = sorted(tuple(r) for r in con.execute(wordpiece_sql()).fetchall())
    assert srows == orows
