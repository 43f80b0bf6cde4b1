"""Token-window document chunking (DataFrame in -> DataFrame out).

An LLM training/retrieval pipeline slices long documents into fixed-size
token windows with overlap before embedding or packing. The reference
engine has no equivalent (its unit of work is the CSV row); this is one of
the scale-path additions a training-data pipeline needs.

All JVM-side column expressions: tokenize once per row, then an index
explode over the window count and an array slice per window — a narrow
row-multiplying projection with no shuffle, fully parallel at any scale.
Window math is pure integer arithmetic so any engine (and the DuckDB
oracle) reproduces the exact chunk boundaries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def chunk_token_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text): whitespace-token windows of
    `size` tokens advancing by `size - overlap`.

    A document with n tokens yields 1 + ceil(max(n - size, 0) / step)
    chunks; the final chunk is short rather than padded, and a document
    shorter than `size` yields exactly one chunk. Blank documents are
    dropped (there is nothing to chunk).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    step = size - overlap
    d = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks")
    )
    n = F.size("toks")
    # integer ceil((max(n-size,0)) / step): exact in any engine's arithmetic
    n_chunks = 1 + F.floor((F.greatest(n - size, F.lit(0)) + (step - 1)) / step).cast("int")
    c = d.select(
        "id",
        "toks",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * step + 1
    length = F.least(F.lit(size), F.col("n") - start + 1)
    chunk = F.slice("toks", start, length)
    return c.select(
        "id",
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    id_col: str = "id",
    order_col: str = "chunk_idx",
    tokens_col: str = "n_tokens",
    budget: int = 64,
) -> DataFrame:
    """Assign each chunk to a training-sequence bin of ~`budget` tokens:
    bin = floor(tokens_before_this_chunk / budget), packing a document's
    chunks contiguously in order. Streaming-cut semantics: a chunk that
    straddles a budget boundary stays in the earlier bin (bins can overflow
    by at most one chunk), which keeps the rule a pure windowed cumulative
    sum — per-document window, so the sort parallelizes per doc and there
    is NO global single-partition ordering at any scale. True greedy
    repacking (reset remainder per bin) is inherently sequential; this is
    the distributed-friendly form a packing job actually ships.

    Adds bin_idx and bin_offset (token offset of the chunk inside its bin).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(order_col)
    before = F.coalesce(
        F.sum(tokens_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return chunks.select(
        "*",
        F.floor(before / budget).cast("int").alias("bin_idx"),
        (before % budget).cast("int").alias("bin_offset"),
    )


def pack_chunks_sql(
    inner_sql: str,
    id_expr: str = "doc_id",
    order_expr: str = "chunk_idx",
    tokens_expr: str = "n_tokens",
    budget: int = 64,
) -> str:
    """DuckDB twin of pack_chunks over a chunk-producing subquery."""
    before = (
        f"COALESCE(SUM({tokens_expr}) OVER (PARTITION BY {id_expr} ORDER BY {order_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
    )
    return f"""
    SELECT *,
           CAST(FLOOR({before} / {budget}) AS INT) AS bin_idx,
           CAST({before} % {budget} AS INT) AS bin_offset
    FROM ({inner_sql}) chunks
    """


def chunk_token_windows_sql(
    table: str, id_expr: str, text_expr: str, size: int = 32, overlap: int = 8
) -> str:
    """DuckDB twin of chunk_token_windows — identical window math so chunk
    boundaries match bit-for-bit."""
    step = size - overlap
    return f"""
    WITH t AS (
        SELECT {id_expr} AS id, regexp_split_to_array(trim({text_expr}), '\\s+') AS toks
        FROM {table} WHERE LENGTH(trim({text_expr})) > 0
    ),
    nc AS (
        SELECT id, toks, len(toks) AS n,
               1 + CAST(FLOOR((GREATEST(len(toks) - {size}, 0) + {step - 1}) / {step}) AS INT) AS n_chunks
        FROM t
    ),
    c AS (
        SELECT id, toks, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        FROM nc
    )
    SELECT id, chunk_idx,
           len(toks[chunk_idx*{step}+1 : LEAST(chunk_idx*{step}+{size}, n)]) AS n_tokens,
           array_to_string(toks[chunk_idx*{step}+1 : LEAST(chunk_idx*{step}+{size}, n)], ' ') AS chunk_text
    FROM c
    """
