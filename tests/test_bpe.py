"""Distributed BPE merge-training (operators/bpe.py).

Verification strategy:
- a pure-Python reference trainer (Counter-based, the textbook Sennrich
  algorithm with the same count-DESC/(a,b)-ASC tie-break) is compared
  against the Spark trainer on seeded random corpora over a tiny alphabet
  (maximally tie- and overlap-prone: runs like "aaaa" exercise the
  leftmost-first non-overlap rule the double-separator replace encodes);
- bpe_encode (rank-order greedy) must reproduce the training-time
  segmentation of every training word — the classic BPE property;
- the generated DuckDB oracle SQL (bpe_train_sql) must emit row-for-row
  the same merge/sym/word rows as the Spark sub-check assembly.
"""

from __future__ import annotations

import random
from collections import Counter

import duckdb
import pytest

import pyspark.sql.functions as F

from carrot_transform_spark.operators.bpe import (
    SEP,
    bpe_encode,
    bpe_train,
    bpe_train_docs,
    bpe_train_sql,
    bpe_vocab,
    encode_words,
    merge_pattern,
    word_counts,
)


# --------------------------------------------------------- python reference


def py_bpe(words: dict[str, int], n_merges: int):
    """Textbook BPE trainer: pair counts over dict-of-word-counts, argmax
    with (count DESC, (a, b) ASC) tie-break, leftmost-first non-overlapping
    re-segmentation."""
    segs = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, cnt in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


def _random_corpus(seed: int, alphabet: str = "ab", n_docs: int = 30):
    rng = random.Random(seed)
    docs = []
    for _ in range(n_docs):
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 12))
        ]
        docs.append(" ".join(words))
    return docs


def _spark_segs(words_df):
    out = {}
    for r in words_df.collect():
        out[r["word"]] = [s for s in r["seg"].strip(SEP).split(SEP + SEP)]
    return out


# ------------------------------------------------------------------- tests


def test_merge_pattern_leftmost_nonoverlap():
    """The double-separator replace implements BPE's merge rule exactly,
    including the shared-boundary runs a single separator would corrupt."""
    def seg(*syms):
        return SEP + (SEP + SEP).join(syms) + SEP

    search, repl = merge_pattern("a", "a")
    assert seg("a", "a", "a").replace(search, repl) == seg("aa", "a")
    assert seg("a", "a", "a", "a").replace(search, repl) == seg("aa", "aa")
    # a pair must not false-match inside a longer symbol
    search, repl = merge_pattern("a", "b")
    assert seg("a", "ba").replace(search, repl) == seg("a", "ba")
    assert seg("xa", "b").replace(search, repl) == seg("xa", "b")
    assert seg("a", "b", "a", "b").replace(search, repl) == seg("ab", "ab")


@pytest.mark.parametrize("seed", [1, 2, 7, 13, 99])
def test_train_matches_python_reference(spark, seed):
    docs = _random_corpus(seed)
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got_merges, got_words = bpe_train_docs(df, n_merges=12, checkpoint_every=4)

    wc: Counter = Counter(w for t in docs for w in t.split() if w)
    want_merges, want_segs = py_bpe(dict(wc), 12)

    assert got_merges == want_merges
    assert _spark_segs(got_words) == want_segs
    # counts survived the rounds
    assert {r["word"]: r["cnt"] for r in got_words.collect()} == dict(wc)


def test_early_stop_when_no_pairs_left(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    merges, words = bpe_train_docs(df, n_merges=50)
    # 'a' and 'b' are single symbols; only ('a','b')-type pairs exist: none
    # (words are single chars) -> zero merges
    assert merges == []
    assert _spark_segs(words) == {"a": ["a"], "b": ["b"]}


def test_word_counts_filters_sep_and_blank(spark):
    df = spark.createDataFrame(
        [("hi  there\thi",), (f"bad{SEP}word ok",), ("",)], "text string"
    )
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert got == {"hi": 2, "there": 1, "ok": 1}


def test_vocab_ids_and_encode_words(spark):
    docs = ["low lower lowest low low", "newer newest new low"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    merges, words = bpe_train_docs(df, n_merges=6)
    vocab = bpe_vocab(words, merges)
    v = {r["sym"]: r["id"] for r in vocab.collect()}
    # chars get 0..C-1 lexicographically, merges C..C+n-1 in rank order
    # (first-minting merge wins when two merges produce the same token)
    chars = sorted({c for t in docs for w in t.split() for c in w})
    want = {c: i for i, c in enumerate(chars)}
    for i, (a, b, _) in enumerate(merges):
        want.setdefault(a + b, len(chars) + i)
    assert v == want
    enc = {r["word"]: r for r in encode_words(words, vocab).collect()}
    segs = _spark_segs(words)
    for w, syms in segs.items():
        assert enc[w]["n_tokens"] == len(syms)
        assert enc[w]["ids_csv"] == ",".join(str(v[s]) for s in syms)


@pytest.mark.parametrize("seed", [3, 21])
def test_encode_reproduces_training_segmentation(spark, seed):
    docs = _random_corpus(seed, alphabet="abc")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    merges, words = bpe_train(word_counts(df), n_merges=10)
    vocab = {r["sym"]: r["id"] for r in bpe_vocab(words, merges).collect()}
    segs = _spark_segs(words)
    got = {r["doc_id"]: list(r["ids"]) for r in bpe_encode(df, merges, vocab).collect()}
    for i, t in enumerate(docs):
        want = [vocab[s] for w in t.split() for s in segs[w]]
        assert got[i] == want, f"doc {i} encode mismatch"


def test_encode_oov_symbol_is_minus_one(spark):
    df = spark.createDataFrame([(0, "aa ab")], "doc_id long, text string")
    merges, words = bpe_train(word_counts(df), n_merges=2)
    vocab = {r["sym"]: r["id"] for r in bpe_vocab(words, merges).collect()}
    new = spark.createDataFrame([(1, "aZ")], "doc_id long, text string")
    (row,) = bpe_encode(new, merges, vocab).collect()
    assert -1 in list(row["ids"])


def test_batched_merges_equal_exact_on_independent_pairs(spark):
    """merges_per_round>1 is exact when the top pairs don't interact: a
    corpus of disjoint 2-char words has independent pair counts, so the
    batched and sequential trainers must produce identical merge lists."""
    docs = [" ".join(["ab"] * 9 + ["cd"] * 7 + ["ef"] * 5 + ["gh"] * 3)]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    exact, _ = bpe_train(word_counts(df), n_merges=4)
    batched, words_b = bpe_train(word_counts(df), n_merges=4, merges_per_round=4)
    assert exact == batched == [
        ("a", "b", 9), ("c", "d", 7), ("e", "f", 5), ("g", "h", 3),
    ]
    assert _spark_segs(words_b) == {"ab": ["ab"], "cd": ["cd"], "ef": ["ef"], "gh": ["gh"]}


def test_batched_merges_skip_interacting_pairs_within_round(spark):
    """Pairs sharing a symbol must not land in the same round: with only
    'aaa' words, round-start pairs are (a,a) — after picking it, (a,a)'s
    symbols are used, so the round picks exactly one merge even at k=8."""
    df = spark.createDataFrame([("aaa aaa aaa",)], "text string")
    merges, words = bpe_train(word_counts(df), n_merges=2, merges_per_round=8)
    # round 1: (a,a) (2 adjacencies x 3 words); round 2: (aa,a) — never
    # both in one round
    assert merges == [("a", "a", 6), ("aa", "a", 3)]
    assert _spark_segs(words) == {"aaa": ["aaa"]}


@pytest.mark.parametrize("seed", [4])
def test_batched_merges_are_valid_tokenizer(spark, seed):
    """General corpus: the batched mode's merges still train a coherent
    tokenizer — encode(rank-greedy) reproduces the trainer's own final
    segmentation for every training word."""
    docs = _random_corpus(seed, alphabet="abc")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    merges, words = bpe_train(word_counts(df), n_merges=12, merges_per_round=4)
    assert len(merges) == 12
    vocab = {r["sym"]: r["id"] for r in bpe_vocab(words, merges).collect()}
    segs = _spark_segs(words)
    got = {r["doc_id"]: list(r["ids"]) for r in bpe_encode(df, merges, vocab).collect()}
    for i, t in enumerate(docs):
        want = [vocab[s] for w in t.split() for s in segs[w]]
        assert got[i] == want


def test_tokenizer_save_load_roundtrip(spark, tmp_path):
    """Train -> save -> load -> encode must equal encoding with the
    in-memory tokenizer (the train-once / encode-everywhere hand-off)."""
    from carrot_transform_spark.operators.bpe import load_tokenizer, save_tokenizer

    docs = _random_corpus(5, alphabet="abc")
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    merges, words = bpe_train(word_counts(df), n_merges=8)
    vocab_df = bpe_vocab(words, merges)
    vocab = {r["sym"]: r["id"] for r in vocab_df.collect()}

    save_tokenizer(str(tmp_path / "tok"), merges, vocab_df)
    merges2, vocab2 = load_tokenizer(spark, str(tmp_path / "tok"))
    assert merges2 == merges
    assert vocab2 == vocab
    want = {r["doc_id"]: list(r["ids"]) for r in bpe_encode(df, merges, vocab).collect()}
    got = {r["doc_id"]: list(r["ids"]) for r in bpe_encode(df, merges2, vocab2).collect()}
    assert got == want


def test_sql_twin_matches_spark_rows(spark):
    """Row-for-row equality of the assembled sub-check output vs the
    generated DuckDB SQL on the same corpus (the oracle contract, checked
    directly rather than through the suite checksum)."""
    from carrot_transform_spark.queries.pipeline_ops import txt_bpe_train, _BPE_MERGES

    sf_dir = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in txt_bpe_train(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(bpe_train_sql(_BPE_MERGES)).fetchall())
    assert len(got) == len(want)
    assert got == want
