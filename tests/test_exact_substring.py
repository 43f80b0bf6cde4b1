"""ExactSubstr dedup (operators/repetition.exact_substring_scrub): maximal
cross-document duplicate token runs >= L are removed EXACTLY — pinned
against a brute-force Python reference, plus two witnesses that the
strided window approximation (scrub_cross_doc_spans) genuinely over- and
under-scrubs on the same inputs."""

from __future__ import annotations

import pyspark.sql.functions as F

from carrot_transform_spark.operators.repetition import (
    exact_substring_scrub,
    scrub_cross_doc_spans,
)

L = 8


def _py_exact_scrub(docs: dict[int, str], min_len: int = L) -> dict[int, str]:
    """Brute-force reference: for each doc, a position is removed iff some
    window of min_len tokens containing it appears verbatim in another doc."""
    toks = {d: t.split() for d, t in docs.items()}
    windows: dict[tuple[str, ...], set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - min_len + 1):
            windows.setdefault(tuple(ts[i : i + min_len]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        covered = set()
        for i in range(len(ts) - min_len + 1):
            w = tuple(ts[i : i + min_len])
            if len(windows[w]) > 1:
                covered.update(range(i, i + min_len))
        out[d] = " ".join(t for j, t in enumerate(ts) if j not in covered)
    return out


def _run(spark, docs: dict[int, str], fn, **kw):
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    return {r["doc"]: r["clean_text"] for r in fn(df, "doc_id", "text", **kw).collect()}


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_exact_scrub_matches_python_reference(spark):
    dup = _words("d", 11)  # an 11-token duplicated run (> L)
    docs = {
        1: f"{_words('a', 5)} {dup} {_words('b', 6)}",
        2: f"{_words('c', 3)} {dup} {_words('e', 9)}",
        3: _words("f", 20),                   # no duplicates
        4: f"{_words('g', 4)} {_words('d', 6)}",  # shares only 6 dup-tokens (< L)
    }
    got = _run(spark, docs, exact_substring_scrub, min_len=L)
    want = _py_exact_scrub(docs)
    assert got == want
    # the duplicated run is gone, the unique flanks survive verbatim
    assert got[1] == f"{_words('a', 5)} {_words('b', 6)}"
    assert got[2] == f"{_words('c', 3)} {_words('e', 9)}"
    assert got[3] == docs[3]
    assert got[4] == docs[4]  # sub-L overlap untouched


def test_strided_scrub_underscrubs_unaligned_duplicates(spark):
    """An L-token duplicate at an offset not on the stride grid: no strided
    window lies wholly inside it, so stride-4 window hashing misses it —
    the exact scrub removes it."""
    dup = _words("d", L)
    docs = {
        1: f"{_words('a', 3)} {dup} {_words('b', 9)}",   # dup at offset 3
        2: f"{_words('c', 5)} {dup} {_words('e', 7)}",   # dup at offset 5
    }
    exact = _run(spark, docs, exact_substring_scrub, min_len=L)
    strided = _run(spark, docs, scrub_cross_doc_spans, span=L, stride=4)
    assert exact == _py_exact_scrub(docs)
    assert exact[1] == f"{_words('a', 3)} {_words('b', 9)}"
    # the witness: the strided form left the duplicate in place
    assert strided[1] == docs[1] and strided[2] == docs[2]


def test_strided_scrub_overscrubs_short_tail_duplicates(spark):
    """Two 11-token docs sharing only their last 7 tokens (< L): the
    strided grid's short trailing window (pos 5-11, 7 tokens because
    (11-8) % 4 != 0) collides across the docs and cuts the sub-L
    duplicate; ExactSubstr must keep it."""
    tail = _words("t", 7)
    docs = {
        1: f"{_words('a', 4)} {tail}",
        2: f"{_words('b', 4)} {tail}",
    }
    exact = _run(spark, docs, exact_substring_scrub, min_len=L)
    strided = _run(spark, docs, scrub_cross_doc_spans, span=L, stride=4)
    assert exact == _py_exact_scrub(docs)
    assert exact[1] == docs[1] and exact[2] == docs[2]
    # the witness: the strided form removed the 7-token tail (< L)
    assert strided[1] == _words("a", 4) and strided[2] == _words("b", 4)


def test_exact_scrub_merges_overlapping_runs_to_maximal_span(spark):
    """Two overlapping duplicated regions merge into one maximal covered
    span — no seam tokens survive inside it."""
    run = _words("d", 14)
    docs = {
        1: f"{_words('a', 2)} {run}",
        2: f"{run} {_words('b', 2)}",
        3: f"{_words('c', 16)}",
    }
    got = _run(spark, docs, exact_substring_scrub, min_len=L)
    assert got == _py_exact_scrub(docs)
    assert got[1] == _words("a", 2)
    assert got[2] == _words("b", 2)


def test_exact_scrub_blank_and_fully_duplicated_docs(spark):
    dup = _words("d", 10)
    docs = {1: dup, 2: dup, 3: "   ", 4: "solo text here"}
    got = _run(spark, docs, exact_substring_scrub, min_len=L)
    assert got[1] == "" and got[2] == ""
    assert got[3] == "" and got[4] == "solo text here"


def test_rolling_impl_matches_chunk_impl_on_documents(spark):
    """The polynomial rolling-hash span stage must reproduce the
    md5(chunk_text) grid exactly on real corpus text (same covered
    positions -> byte-identical cleaned docs)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    roll = {
        (r["doc"], r["n_removed"], r["clean_text"])
        for r in exact_substring_scrub(docs, min_len=L).collect()
    }
    chunk = {
        (r["doc"], r["n_removed"], r["clean_text"])
        for r in exact_substring_scrub(docs, min_len=L, impl="chunk").collect()
    }
    assert roll == chunk and roll


def test_rolling_hash_kernel_window_identity(spark):
    """h1/h2 depend only on window CONTENT: equal token windows at
    different positions/documents collide, different windows do not."""
    from carrot_transform_spark.operators.repetition import _rolling_window_hashes

    rows = [
        (1, "a b c d e f g h tail one"),
        (2, "lead a b c d e f g h other"),   # same 8-window at offset 1
        (3, "a b c d e f g X different"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc"], r["chunk_idx"]): (r["h1"], r["h2"])
        for r in _rolling_window_hashes(df, "doc_id", "text", 8).collect()
    }
    assert got[(1, 0)] == got[(2, 1)]
    assert got[(1, 0)] != got[(3, 0)]
    # window grid: doc 1 has 10 tokens -> 3 full windows (idx 0..2)
    assert {i for d, i in got if d == 1} == {0, 1, 2}
