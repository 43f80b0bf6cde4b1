"""Distributed BPE merge-training (byte-pair encoding tokenizer induction).

The one first-class tokenizer operation operators/vocab.py doesn't cover:
vocab.py INDUCES a frequency vocabulary and encodes token ids, but a
subword tokenizer must be TRAINED — the iterative merge algorithm of
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units", public), the procedure behind GPT-2/RoBERTa tokenizers.

Spark-first shape (each design point is a scale decision):

* **Word-level dedup with counts first** (``word_counts``): the ONLY
  corpus-sized job. Everything after runs on the distinct-word table —
  per-round cost is O(|vocab|), flat in corpus size (a 10x bigger corpus
  with the same vocabulary trains at the same per-round cost; see
  scripts/bpe_stress.py).
* **One shuffle per round**: adjacent-pair counts via a map-side-combined
  groupBy over the words table; the argmax pair is a bounded single-row
  collect (count DESC, then (a, b) lexicographic — deterministic
  tie-break, identical to the DuckDB twin's ORDER BY).
* **Re-segmentation is a narrow map, not a shuffle**: a word's
  segmentation is ONE string — symbols joined by a DOUBLE unit-separator
  with single-separator sentinels at both ends — so applying a merge is
  a built-in ``F.replace`` (JVM whole-stage codegen, no UDF):

      seg("hello") = "\\x1fh\\x1f\\x1fe\\x1f\\x1fl\\x1f\\x1fl\\x1f\\x1fo\\x1f"
      merge (l, l) = replace(seg, "\\x1fl\\x1f\\x1fl\\x1f", "\\x1fll\\x1f")

  The double separator makes the leftmost-first, non-overlapping
  semantics of string replace coincide EXACTLY with BPE's merge rule:
  boundaries can't false-match inside multi-char symbols (both ends of
  the pattern are anchored), and adjacent matches don't steal each
  other's shared boundary (each match consumes its own trailing
  separator pair member). ``replace`` has identical semantics in Spark
  and DuckDB, which is what makes the pure-SQL oracle possible.
* **Lineage control**: each round appends one projection; every
  ``checkpoint_every`` rounds the words frame is localCheckpoint-ed so a
  30k-merge training run can't accumulate an unbounded plan.

Token ids follow the standard convention: initial characters sorted
lexicographically get ids 0..C-1, merge i (1-based) gets id C+i-1; a
token produced by two different merges keeps the smaller id. Encoding
new text (``bpe_encode``) applies merges in rank order — the classic
property that greedy lowest-rank merging reproduces the training-time
segmentation — via an Arrow-batched mapInPandas with a broadcast rank
dict and per-batch word memoization (no F.* equivalent exists for a
data-dependent merge loop; this is the sanctioned Pandas-UDF seam).

No reference counterpart (the reference engine has no tokenizer ops);
this extends the LLM-pipeline surface per the project brief.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

SEP = "\x1f"  # unit separator: filtered out of words, never inside one
_WS = "[ \t\r\n]+"  # explicit class (not \s) so Spark/DuckDB agree exactly


# ------------------------------------------------------------------ corpus


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct words with occurrence counts — the corpus-sized dedup pass.

    (word, cnt, seg): seg is the initial character segmentation in the
    double-separator string form described in the module docstring."""
    w = (
        docs.select(F.explode(F.split(F.col(text_col), _WS)).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    seg = F.concat(
        F.lit(SEP), F.array_join(F.split(F.col("word"), ""), SEP + SEP), F.lit(SEP)
    )
    return w.withColumn("seg", seg)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count — one map-side-combined
    shuffle over the |vocab|-sized words table."""
    syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM seg)"), SEP + SEP)
    pairs = F.arrays_zip(
        F.slice(syms, 1, F.size(syms) - 1).alias("a"),
        F.slice(syms, 2, F.size(syms) - 1).alias("b"),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "cnt")
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("n"))
    )


def merge_pattern(a: str, b: str) -> tuple[str, str]:
    """(search, replacement) applying merge (a, b) to a seg string."""
    return SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP


# ------------------------------------------------------------------ training


def _select_disjoint(rows, k: int) -> list[tuple[str, str, int]]:
    """Greedy top-k mutually NON-INTERACTING pairs in rank order: a pair is
    selectable only if neither symbol, nor its merged token, collides with
    any symbol or merged token already selected this round — so the k
    replaces compose in one projection without affecting each other."""
    out: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for r in rows:
        a, b, n = r["a"], r["b"], int(r["n"])
        if a in used or b in used or (a + b) in used:
            continue
        out.append((a, b, n))
        used.update((a, b, a + b))
        if len(out) >= k:
            break
    return out


def bpe_train(
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
    merges_per_round: int = 1,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Iterative merge training over a (word, cnt, seg) table.

    Returns (merges, final_words): merges as [(a, b, pair_count), ...] in
    rank order; final_words carries each distinct word's final ``seg``.
    Stops early if no pair remains. Per round: one aggregation job over
    |vocab| rows + a bounded collect; the re-segment step is a narrow
    ``replace`` projection (no shuffle).

    merges_per_round=1 (default) is EXACT sequential BPE. Higher values
    are the documented APPROXIMATION for tokenizer-scale vocabularies
    (30k merges = 30k Spark rounds at ~0.2 s/round otherwise): each round
    takes the top-k mutually non-interacting pairs by round-start counts
    and applies them in rank order in one projection. Non-interaction
    (no shared symbols / merged tokens) makes the k replaces commute
    textually, but counts are not re-evaluated between them — a merge
    may rank differently than exact sequential training would have
    ranked it. Reported counts are round-start counts."""
    cur = words.persist()
    cur.count()
    merges: list[tuple[str, str, int]] = []
    retained = [cur]
    k = max(1, merges_per_round)
    try:
        rounds = 0
        while len(merges) < n_merges:
            want = min(k, n_merges - len(merges))
            top = (
                _pair_counts(cur)
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(max(4 * want, 16))
                .collect()
            )
            picked = _select_disjoint(top, want)
            if not picked:
                break
            merges.extend(picked)
            col = F.col("seg")
            for a, b, _ in picked:
                search, repl = merge_pattern(a, b)
                col = F.replace(col, F.lit(search), F.lit(repl))
            cur = cur.withColumn("seg", col)
            rounds += 1
            if rounds % checkpoint_every == 0:
                cur = cur.localCheckpoint(eager=True)
                while retained:
                    retained.pop().unpersist()
        # materialize the final state before releasing cached parents
        cur = cur.localCheckpoint(eager=True)
    finally:
        while retained:
            retained.pop().unpersist()
    return merges, cur


def bpe_train_docs(
    docs: DataFrame, n_merges: int, text_col: str = "text", **kw
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """word_counts + bpe_train in one call."""
    return bpe_train(word_counts(docs, text_col), n_merges, **kw)


# ------------------------------------------------------------------ vocab/ids


def bpe_vocab(words: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """(sym, id) table: initial characters of the training words sorted
    lexicographically get 0..C-1, merge i gets C+i-1; a token minted by
    two different merges keeps the smaller id. Bounded by |alphabet| +
    n_merges — always broadcastable."""
    spark = words.sparkSession
    chars = (
        words.select(F.explode(F.split("word", "")).alias("sym"))
        .distinct()
        .orderBy("sym")
    )
    # |alphabet| rows — bounded by the script's character set
    char_syms = [r["sym"] for r in chars.collect()]
    base = len(char_syms)
    ids: dict[str, int] = {s: i for i, s in enumerate(char_syms)}
    for i, (a, b, _) in enumerate(merges):
        ids.setdefault(a + b, base + i)
    return spark.createDataFrame(
        [(s, i) for s, i in ids.items()], "sym string, id long"
    )


def encode_words(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """(word, cnt, n_tokens, ids_csv) from trained segmentations: final
    symbols looked up in the (broadcast) vocab, order preserved via
    posexplode + in-group sort. OOV (impossible for training words) -> -1."""
    syms = F.split(F.expr(f"trim(BOTH '{SEP}' FROM seg)"), SEP + SEP)
    e = words.select(
        "word", "cnt", F.posexplode(syms).alias("pos", "sym")
    ).join(F.broadcast(vocab), "sym", "left")
    return (
        e.groupBy("word", "cnt")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", F.coalesce("id", F.lit(-1)).alias("id")))
                    ),
                    lambda s: s["id"].cast("string"),
                ),
                ",",
            ).alias("ids_csv"),
        )
    )


# ------------------------------------------------------------- persistence


def save_tokenizer(
    path: str, merges: list[tuple[str, str, int]], vocab: DataFrame
) -> None:
    """Persist a trained tokenizer as two parquet tables: <path>/merges
    (rank, a, b, n) and <path>/vocab (sym, id). Both are bounded by
    |alphabet| + n_merges — single-file artifacts, the train-once /
    encode-everywhere hand-off (same plain-parquet artifact style as the
    PQ codebooks, not the incremental UnitStore: a tokenizer is immutable
    once trained)."""
    spark = vocab.sparkSession
    mdf = spark.createDataFrame(
        [(i, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank long, a string, b string, n long",
    )
    mdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    vocab.coalesce(1).write.mode("overwrite").parquet(f"{path}/vocab")


def load_tokenizer(
    spark: SparkSession, path: str
) -> tuple[list[tuple[str, str, int]], dict[str, int]]:
    """(merges in rank order, sym -> id dict) from a saved tokenizer."""
    mdf = spark.read.parquet(f"{path}/merges").orderBy("rank")
    merges = [(r["a"], r["b"], int(r["n"])) for r in mdf.collect()]
    vdf = spark.read.parquet(f"{path}/vocab")
    ids = {r["sym"]: int(r["id"]) for r in vdf.collect()}
    return merges, ids


# ------------------------------------------------------------------ encoding


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    vocab_ids: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode NEW text with a trained merge list: per word, greedily apply
    the lowest-rank applicable merge (leftmost-first within a rank) — the
    classic decode-time algorithm that reproduces training segmentations.
    Arrow-batched; words memoized per batch. OOV symbols -> -1."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    import re

    ws = re.compile(_WS)

    def segment(word: str) -> list[int]:
        syms = list(word)
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            a, b = merges[best_rank][0], merges[best_rank][1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return [vocab_ids.get(s, -1) for s in syms]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[int]] = {}
        for pdf in batches:
            ids_col = []
            for text in pdf[text_col].astype(object):
                ids: list[int] = []
                for w in ws.split(text or ""):
                    if not w or SEP in w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = segment(w)
                    ids.extend(got)
                ids_col.append(ids)
            yield pd.DataFrame({id_col: pdf[id_col], "ids": ids_col})

    out_schema = f"{id_col} long, ids array<long>"
    return docs.select(id_col, text_col).mapInPandas(run, out_schema)


# ------------------------------------------------------------------ SQL twin


def bpe_train_sql(
    n_merges: int, table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of train+vocab+encode for the oracle: n_merges chained
    CTE rounds (pair-count -> argmax -> replace re-segment), then the same
    sym/merge/word rows the Spark sub-check emits. Generated SQL grows
    linearly with n_merges — meant for oracle-scale merge counts."""
    S = "chr(31)"
    sql = [
        f"""WITH w0 AS MATERIALIZED (
    SELECT word, cnt,
           {S} || array_to_string(string_split(word, ''), {S}||{S}) || {S} AS seg
    FROM (
        SELECT word, COUNT(*) AS cnt FROM (
            SELECT unnest(regexp_split_to_array({text_col}, '{_WS}')) AS word
            FROM {table}
        ) WHERE word <> '' AND strpos(word, {S}) = 0
        GROUP BY word
    )
)"""
    ]
    for i in range(1, n_merges + 1):
        p = i - 1
        sql.append(
            f"""p{i} AS MATERIALIZED (
    SELECT a, b, n FROM (
        SELECT l[j] AS a, l[j+1] AS b, SUM(cnt) AS n
        FROM (SELECT string_split(trim(BOTH {S} FROM seg), {S}||{S}) AS l, cnt
              FROM w{p}),
             UNNEST(range(1, len(l))) AS u(j)
        GROUP BY a, b
    ) ORDER BY n DESC, a, b LIMIT 1
),
w{i} AS MATERIALIZED (
    SELECT w.word, w.cnt,
           COALESCE(replace(w.seg, {S}||p.a||{S}||{S}||p.b||{S}, {S}||p.a||p.b||{S}),
                    w.seg) AS seg
    FROM w{p} w LEFT JOIN p{i} p ON TRUE
)"""
        )
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT 'merge' AS kind, {i} AS k, a, b, CAST(n AS BIGINT) AS n FROM p{i}"
        for i in range(1, n_merges + 1)
    )
    sql.append(
        f"""chars AS (
    SELECT DISTINCT unnest(string_split(word, '')) AS sym FROM w0
),
char_ids AS (
    SELECT sym, ROW_NUMBER() OVER (ORDER BY sym) - 1 AS id FROM chars
),
nchars AS (SELECT COUNT(*) AS c FROM chars),
merge_rows AS (
    {merge_rows}
),
vocab AS (
    SELECT sym, id FROM char_ids
    UNION ALL
    SELECT a || b AS sym, MIN((SELECT c FROM nchars) + k - 1) AS id
    FROM merge_rows GROUP BY a || b
),
final_syms AS (
    SELECT word, cnt, l[u.pos] AS sym, u.pos FROM (
        SELECT word, cnt,
               string_split(trim(BOTH {S} FROM seg), {S}||{S}) AS l
        FROM w{n_merges}
    ), UNNEST(range(1, len(l) + 1)) AS u(pos)
),
word_rows AS (
    SELECT f.word, f.cnt, COUNT(*) AS n_tokens,
           string_agg(CAST(COALESCE(v.id, -1) AS VARCHAR), ',' ORDER BY f.pos)
               AS ids_csv
    FROM final_syms f LEFT JOIN vocab v ON v.sym = f.sym
    GROUP BY f.word, f.cnt
)
SELECT kind, k, a, b, n FROM merge_rows
UNION ALL
SELECT 'sym', id, sym, '', 0 FROM vocab
UNION ALL
SELECT 'word', n_tokens, word, ids_csv, CAST(cnt AS BIGINT) FROM word_rows"""
    )
    return ",\n".join(sql)
