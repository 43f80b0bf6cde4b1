"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

At 100 TB, a scan's cost is decided before the first task runs: by which
files (and row groups) min/max statistics let the reader SKIP. Sorting by
one column clusters that column only; interleaving the bits of several
quantized columns (a Morton / Z-order key) clusters ALL of them at once,
so a predicate on any subset of the dimensions touches a small fraction
of files — the same layout step as Delta's OPTIMIZE ZORDER BY, expressed
as plain Spark: quantize -> interleave -> repartitionByRange on the key
-> sortWithinPartitions. Everything is exact integer bit math, so the key
is reproducible in any engine (the DuckDB oracle recomputes it
bit-for-bit) and stable under retries/partitioning.

Reference parity note: the reference engine has no layout optimizer (it
streams CSV row-by-row); this operator is part of the beyond-reference
scale toolkit, like the dedup/ANN families.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def zorder_key(cols: list[Column | str], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of already-quantized non-negative
    integer columns into one Morton key (column i owns bit positions
    ``b * n + i``). Pure bitwise expression tree — whole-stage-codegen'd,
    no shuffle, no UDF. ``len(cols) * bits`` must fit in 63 bits."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    out: Column | None = None
    for i, c in enumerate(cols):
        cl = (F.col(c) if isinstance(c, str) else c).cast("long")
        for b in range(bits):
            piece = F.shiftleft(F.shiftright(cl, b).bitwiseAND(F.lit(1)), b * n + i)
            out = piece if out is None else out.bitwiseOR(piece)
    return out


def zorder_key_sql(exprs: list[str], bits: int = 8) -> str:
    """DuckDB twin of zorder_key over already-quantized integer SQL
    expressions (same bit positions, same integer ops)."""
    n = len(exprs)
    parts = [
        f"(((CAST({e} AS BIGINT) >> {b}) & 1) << {b * n + i})"
        for i, e in enumerate(exprs)
        for b in range(bits)
    ]
    return " | ".join(parts)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 8,
    key_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional skipping: quantize each listed
    integer column against its observed min/max (one tiny agg, broadcast
    back — no driver action), interleave into a Morton key, range-partition
    on the key, and sort within partitions.

    After a parquet write, each file's min/max footer stats for EVERY listed
    column cover a small hyper-rectangle instead of the full range, so
    predicate pushdown skips most files for selective multi-dim filters.
    The range exchange on the key is the operator's single shuffle — the
    same one any global clustering needs.
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"__lo_{c}"))
        aggs.append(F.max(c).cast("long").alias(f"__hi_{c}"))
    bounds = df.agg(*aggs)
    j = df.crossJoin(F.broadcast(bounds))
    # exact integer quantization ((x - lo) * 2^bits) div (hi - lo + 1):
    # no float rounding, so any engine agrees on every bucket edge
    quantized = [
        F.expr(
            f"((CAST({c} AS BIGINT) - __lo_{c}) * {1 << bits}L) div (__hi_{c} - __lo_{c} + 1)"
        )
        for c in cols
    ]
    keyed = j.withColumn(key_col, zorder_key(quantized, bits=bits)).drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )
    return (
        keyed.repartitionByRange(num_partitions, key_col)
        .sortWithinPartitions(key_col)
    )


def write_sized(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    sample_rows: int = 1_000,
    mode: str = "overwrite",
) -> int:
    """Write `df` as parquet with files near `target_mb` each — the
    small-files lever: a stream of tiny batches or an over-partitioned
    shuffle otherwise leaves thousands of KB-scale files whose per-file
    open/footer costs dominate later scans.

    Sizing: draw ~`sample_rows` rows ONCE with a seeded Bernoulli sample —
    spread over every partition, so a frame whose leading rows are
    unrepresentative (header-ish short rows, a sorted-by-size layout)
    still estimates honestly; first-N would read only the first split.
    Measure the sample's in-memory footprint, scale to the full count,
    divide by target. Both the count and the sample are one job each; an
    estimate off by 2x still yields healthy file sizes (64-256 MB for the
    128 MB default). Returns the partition count used."""
    n = df.count()
    if n == 0:
        df.write.mode(mode).parquet(path)
        return 1
    if n <= sample_rows:
        sample = df.toPandas()
    else:
        # slight over-draw so the estimate rarely lands on a near-empty
        # sample; deterministic under the fixed seed
        frac = min(1.0, 1.2 * sample_rows / n)
        sample = df.sample(fraction=frac, seed=42).limit(sample_rows).toPandas()
    if len(sample) == 0:
        sample = df.limit(min(sample_rows, n)).toPandas()
    per_row = max(1, int(sample.memory_usage(deep=True).sum() / max(len(sample), 1)))
    # parquet compresses the in-memory estimate substantially; 3x is the
    # conservative middle of the 2-5x range text/numeric mixes show
    est_bytes = n * per_row // 3
    n_files = max(1, -(-est_bytes // (target_mb << 20)))
    df.repartition(n_files).write.mode(mode).parquet(path)
    return n_files
