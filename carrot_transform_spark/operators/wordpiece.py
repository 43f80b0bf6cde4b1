"""WordPiece tokenizer: frequency-derived subword vocabulary + greedy
longest-match-first encoding, as distributed DataFrame ops.

The fourth tokenizer family next to whole-word ids (operators/vocab.py),
BPE merge-training (operators/bpe.py) and the unigram-LM Viterbi coder
(operators/unigram.py): WordPiece (Schuster & Nakajima 2012, "Japanese
and Korean voice search", ICASSP; the inference algorithm is the BERT
tokenizer of Devlin et al. 2019, and Song et al. 2021 "Fast WordPiece
Tokenization", EMNLP, describes the same greedy longest-match-first
semantics this module implements) segments each word by repeatedly
taking the LONGEST vocabulary piece that prefixes the remaining suffix —
word-initial pieces match as-is, word-internal pieces carry the ``##``
continuation marker — and emits ``[UNK]`` for the whole word when no
piece matches at some position.

Vocabulary note: production WordPiece vocabs are trained by a
likelihood objective (a BPE-like merge loop); this module derives the
vocab from substring frequencies (every substring slot of the deduped
words, split into initial/continuation populations, kept at
freq >= min_count) — the ENCODER semantics are the faithful part, the
induction is the same frequency heuristic as operators/unigram.py and is
documented as such. Rare characters fall below min_count like any other
piece, so the ``[UNK]`` path is real, exactly as in deployed vocabs.

Spark-first shape — everything after the word-dedup pass is
corpus-size-independent (the operators/bpe.py trick):

1. ``word_counts`` (shared with unigram): distinct words + frequencies,
   the ONE corpus-sized aggregation.
2. ``wordpiece_vocab``: one explode over substring slots, one groupBy —
   (piece, is_cont, freq).
3. ``wordpiece_best_match``: greedy longest-match is a DETERMINISTIC
   function of (word, start): precompute it ONCE as a (word, j) ->
   (end, piece) table (per-slot argmax on piece length over the lattice
   join), then the greedy loop just follows pointers — each of the
   max_word unrolled rounds is ONE co-partitioned join + a null check,
   no per-round aggregation (leaner than the Viterbi DP, which must
   argmin over alternatives every round).
4. ``wordpiece_encode``: max_word rounds with the per-round
   localCheckpoint(eager) lineage cut (the unigram/MMR discipline).

Engine-exact by construction: there is NO floating point anywhere —
counts, lengths and positions are integers, the greedy choice is an
integer argmax with a unique winner (one substring per length per slot),
so the DuckDB twin (``wordpiece_sql``, the generated chained-CTE recipe
of bpe_train_sql/unigram_sql) is exactly row-equal with no quantization
fences at all.

At 100 TB: |distinct words| is the working set (Heaps' law); the vocab
and best-match tables are |words|*L-bounded, every greedy round is a
co-partitioned |active-words|-row join, and no stage after word_counts
touches corpus-sized row counts. Encoding full documents (not just the
distinct-word table) is a broadcast-join of the per-word segmentation
back onto the token stream — word-level dedup is exactly why the greedy
loop never runs per-token.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from carrot_transform_spark.operators.unigram import word_counts  # noqa: F401

_WS = "[ \t\r\n]+"
_US = "\x1f"
UNK = "[UNK]"
DEFAULT_MAX_WORD = 12
DEFAULT_MAX_PIECE = 4
DEFAULT_MIN_COUNT = 5


def wordpiece_vocab(
    words: DataFrame,
    max_piece: int = DEFAULT_MAX_PIECE,
    min_count: int = DEFAULT_MIN_COUNT,
) -> DataFrame:
    """(piece, is_cont, freq): substring pieces of the distinct words,
    split into word-initial (is_cont=0, substrings starting at position
    1) and continuation (is_cont=1, starting later) populations — the
    same string can appear in both with different frequencies, exactly
    like ``foo`` vs ``##foo`` in a BERT vocab. freq = sum of
    containing-word counts over every occurrence slot; pieces below
    min_count are dropped (single characters included — that is what
    makes ``[UNK]`` reachable)."""
    subs = words.select(
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), i ->
                    transform(sequence(1, least({int(max_piece)}, length(word) - i + 1)),
                              l -> struct(CASE WHEN i = 1 THEN 0 ELSE 1 END AS is_cont,
                                          substring(word, i, l) AS piece))))"""
            )
        ).alias("s"),
        "cnt",
    ).select(F.col("s.piece").alias("piece"), F.col("s.is_cont").alias("is_cont"), "cnt")
    return (
        subs.groupBy("piece", "is_cont")
        .agg(F.sum("cnt").alias("freq"))
        .filter(F.col("freq") >= F.lit(int(min_count)))
    )


def wordpiece_best_match(
    words: DataFrame,
    vocab: DataFrame,
    max_piece: int = DEFAULT_MAX_PIECE,
) -> DataFrame:
    """(word, j, pos, disp): the greedy longest vocabulary match at every
    start offset j (0-based) of every word — end position pos and the
    display form (``##``-prefixed when j > 0). One lattice explode +
    broadcast vocab join + per-slot max; the winner per (word, j) is
    unique because lengths differ."""
    slots = words.select(
        "word",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), i ->
                    transform(sequence(1, least({int(max_piece)}, length(word) - i + 1)),
                              l -> struct(i - 1 AS j, i + l - 1 AS pos,
                                          CASE WHEN i = 1 THEN 0 ELSE 1 END AS is_cont,
                                          substring(word, i, l) AS piece))))"""
            )
        ).alias("s"),
    ).select(
        "word",
        F.col("s.j").alias("j"),
        F.col("s.pos").alias("pos"),
        F.col("s.is_cont").alias("is_cont"),
        F.col("s.piece").alias("piece"),
    )
    hits = slots.join(
        F.broadcast(vocab.select("piece", "is_cont")), ["piece", "is_cont"]
    )
    best = (
        hits.groupBy("word", "j")
        .agg(F.max(F.struct(F.col("pos"), F.col("piece"))).alias("b"))
        .select(
            "word",
            "j",
            F.col("b.pos").alias("pos"),
            F.when(F.col("j") == 0, F.col("b.piece"))
            .otherwise(F.concat(F.lit("##"), F.col("b.piece")))
            .alias("disp"),
        )
    )
    return best


def wordpiece_encode(
    words: DataFrame,
    vocab: DataFrame,
    max_word: int = DEFAULT_MAX_WORD,
    max_piece: int = DEFAULT_MAX_PIECE,
    persist_registry: list | None = None,
) -> DataFrame:
    """(word, cnt, seg, n_tokens, is_unk): greedy longest-match-first
    segmentation of every distinct word. seg = display pieces joined by
    US; an unmatchable word gets seg='[UNK]', n_tokens=1, is_unk=1 (the
    whole-word-UNK convention of the BERT tokenizer)."""
    spark = words.sparkSession
    from carrot_transform_spark.operators.dedup import _constraint_propagation_off

    par = spark.sparkContext.defaultParallelism
    w = words.repartition(par, "word").persist()
    if persist_registry is not None:
        persist_registry.append(w)
    bm = (
        wordpiece_best_match(w, vocab, max_piece)
        .repartition(par, "word")
        .persist()
    )
    if persist_registry is not None:
        persist_registry.append(bm)
    bm.count()

    done_parts: list[DataFrame] = []
    with _constraint_propagation_off(spark):
        # state: words still being consumed; cur = next unmatched offset
        state = (
            w.select(
                "word",
                "cnt",
                F.lit(0).alias("cur"),
                F.lit("").alias("seg"),
                F.lit(0).alias("n_tokens"),
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(int(max_word)):
            # checkpoint the joined round ONCE: the three consumers below
            # (UNK split, finished split, next state) would otherwise each
            # re-execute the bm join — 3x the per-round work at vocab scale
            step = state.join(
                bm.withColumnRenamed("j", "cur"), ["word", "cur"], "left"
            ).localCheckpoint(eager=True)
            # no match at cur -> the whole word is [UNK]
            done_parts.append(
                step.filter(F.col("pos").isNull()).select(
                    "word",
                    "cnt",
                    F.lit(UNK).alias("seg"),
                    F.lit(1).alias("n_tokens"),
                    F.lit(1).alias("is_unk"),
                )
            )
            adv = step.filter(F.col("pos").isNotNull()).select(
                "word",
                "cnt",
                F.col("pos").alias("cur"),
                F.when(F.col("seg") == "", F.col("disp"))
                .otherwise(F.concat_ws(_US, "seg", "disp"))
                .alias("seg"),
                (F.col("n_tokens") + 1).alias("n_tokens"),
            )
            done_parts.append(
                adv.filter(F.length("word") == F.col("cur")).select(
                    "word", "cnt", "seg", "n_tokens", F.lit(0).alias("is_unk")
                )
            )
            # adv is a narrow filter over the checkpointed step — no extra
            # materialization needed for the next round's join input
            state = adv.filter(F.length("word") > F.col("cur"))
    # each round consumes >= 1 char, so max_word rounds always drain
    return reduce(DataFrame.unionByName, done_parts)


def wordpiece_encode_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word: int = DEFAULT_MAX_WORD,
    max_piece: int = DEFAULT_MAX_PIECE,
    min_count: int = DEFAULT_MIN_COUNT,
    persist_registry: list | None = None,
) -> DataFrame:
    """(kind, a, b, k, n): the sub-check emission — one 'piece' row per
    vocabulary entry (a=display form, n=freq) and one 'word' row per
    distinct word (a=word, b=seg, k=n_tokens, n=cnt; is_unk folded into
    b='[UNK]'). Same 5-column shape as operators/bpe.txt_bpe_train."""
    wc = word_counts(docs, text_col, max_word)
    vocab = wordpiece_vocab(wc, max_piece, min_count)
    enc = wordpiece_encode(wc, vocab, max_word, max_piece, persist_registry)
    piece_rows = vocab.select(
        F.lit("piece").alias("kind"),
        F.when(F.col("is_cont") == 0, F.col("piece"))
        .otherwise(F.concat(F.lit("##"), F.col("piece")))
        .alias("a"),
        F.lit("").alias("b"),
        F.lit(0).cast("long").alias("k"),
        F.col("freq").cast("long").alias("n"),
    )
    word_rows = enc.select(
        F.lit("word").alias("kind"),
        F.col("word").alias("a"),
        F.col("seg").alias("b"),
        F.col("n_tokens").cast("long").alias("k"),
        F.col("cnt").cast("long").alias("n"),
    )
    return piece_rows.unionByName(word_rows)


def wordpiece_sql(
    table: str = "documents",
    text_col: str = "text",
    max_word: int = DEFAULT_MAX_WORD,
    max_piece: int = DEFAULT_MAX_PIECE,
    min_count: int = DEFAULT_MIN_COUNT,
) -> str:
    """DuckDB twin of wordpiece_encode_docs: identical tokenisation,
    vocabulary induction, best-match table and the max_word greedy rounds
    as chained MATERIALIZED CTEs. Pure integer/string arithmetic — no
    quantization fences needed."""
    P = int(max_piece)
    L = int(max_word)
    rounds = []
    for r in range(1, L + 1):
        prev = "wp_s0" if r == 1 else f"wp_s{r - 1}"
        rounds.append(
            f"""wp_s{r} AS MATERIALIZED (
        SELECT s.word, s.cnt,
               CASE WHEN m.pos IS NULL THEN -1 ELSE m.pos END AS cur,
               CASE WHEN m.pos IS NULL THEN '{UNK}'
                    WHEN s.seg = '' THEN m.disp
                    ELSE s.seg || chr(31) || m.disp END AS seg,
               CASE WHEN m.pos IS NULL THEN 1 ELSE s.n_tokens + 1 END AS n_tokens,
               CASE WHEN m.pos IS NULL THEN 1 ELSE 0 END AS is_unk
        FROM {prev} s LEFT JOIN wp_bm m ON m.word = s.word AND m.j = s.cur
        WHERE s.cur >= 0 AND s.cur < length(s.word)
        UNION ALL
        SELECT word, cnt, cur, seg, n_tokens, is_unk FROM {prev}
        WHERE cur < 0 OR cur >= length(word)
    )"""
        )
    chain = ",\n    ".join(rounds)
    return f"""
    WITH wp_wc AS MATERIALIZED (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT unnest(list_filter(regexp_split_to_array({text_col}, '{_WS}'),
                                      t -> t <> '')) AS word
            FROM {table}
        ) WHERE length(word) <= {L}
        GROUP BY word
    ),
    wp_slots AS MATERIALIZED (
        SELECT word, cnt, u.i - 1 AS j, u.i + l.l - 1 AS pos,
               CASE WHEN u.i = 1 THEN 0 ELSE 1 END AS is_cont,
               substring(word, u.i, l.l) AS piece
        FROM wp_wc,
             UNNEST(range(1, length(word) + 1)) AS u(i),
             UNNEST(range(1, least({P}, length(word) - u.i + 1) + 1)) AS l(l)
    ),
    wp_vocab AS MATERIALIZED (
        SELECT piece, is_cont, SUM(cnt) AS freq
        FROM wp_slots GROUP BY piece, is_cont
        HAVING SUM(cnt) >= {int(min_count)}
    ),
    wp_bm AS MATERIALIZED (
        SELECT word, j, MAX(pos) AS pos,
               CASE WHEN j = 0 THEN arg_max(piece, pos)
                    ELSE '##' || arg_max(piece, pos) END AS disp
        FROM wp_slots sl
        WHERE EXISTS (SELECT 1 FROM wp_vocab v
                      WHERE v.piece = sl.piece AND v.is_cont = sl.is_cont)
        GROUP BY word, j
    ),
    wp_s0 AS MATERIALIZED (
        SELECT word, cnt, 0 AS cur, '' AS seg, 0 AS n_tokens, 0 AS is_unk
        FROM wp_wc
    ),
    {chain}
    SELECT 'piece' AS kind,
           CASE WHEN is_cont = 0 THEN piece ELSE '##' || piece END AS a,
           '' AS b, CAST(0 AS BIGINT) AS k, CAST(freq AS BIGINT) AS n
    FROM wp_vocab
    UNION ALL
    SELECT 'word' AS kind, word AS a, seg AS b,
           CAST(n_tokens AS BIGINT) AS k, CAST(cnt AS BIGINT) AS n
    FROM wp_s{L}
    """
