"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative pattern Spark ships in MLlib, re-expressed on the DataFrame
API so the whole per-iteration pass is one narrow scoring projection plus
one (cell, dim)-keyed aggregate:

- centroids live on the driver between iterations (k × dim doubles — tiny
  metadata, the ONLY driver-side state) and enter each pass as broadcast
  plan literals;
- assignment is an argmin over k sequential decimal folds (bit-identical
  in any engine: each (x-c)² is a single-rounded IEEE double, the fold
  accumulates in exact DECIMAL(38,12), ties break on cell id);
- the update step aggregates per (cell, dim) with exact decimal sums and
  rounds the new means to 6 decimals — so the next iteration's literals
  are identical no matter which engine (or partition order) computed them.

That rounding is what makes an ITERATIVE algorithm oracle-checkable: a
DuckDB twin unrolled to the same number of iterations reproduces every
assignment and centroid bit-for-bit (see queries/similarity.py).

Scale: each iteration scans the corpus once (k·dim fused multiply-adds per
row, no shuffle for scoring) and shuffles only k·dim aggregate rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DDEC = "decimal(38,12)"


def _sqdist(vec_col, centroid):
    """Exact-decimal squared L2 distance between an array<double> column
    and a centroid (python list → literal array, or an array<double>
    Column from a broadcast codebook): sequential fold, each term
    singly-rounded — identical element order either way, so results are
    bit-identical between the literal and data-driven forms."""
    if isinstance(centroid, list):
        centroid = F.array(*[F.lit(float(c)) for c in centroid])
    terms = F.zip_with(vec_col, centroid, lambda x, c: ((x - c) * (x - c)).cast(_DDEC))
    # decimal + decimal widens to (39,12); re-cast each merge so the fold
    # keeps the accumulator's exact type (values are ≪ the 38,12 range)
    return F.aggregate(terms, F.lit(0).cast(_DDEC), lambda acc, v: (acc + v).cast(_DDEC))


def assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest centroid by squared L2, ties to the lower cell.

    The centroid list rides in a one-row broadcast frame
    (array<array<double>>), NOT as plan literals, so plan size and
    analysis time are O(1) in k — a k=10^4 coarse-quantizer training run
    compiles exactly like k=8. argmin via array_position(arr,
    array_min(arr)): the distance array is built once, so the per-row
    work is linear in k — a when-chain that threads `best_d` through
    nested whens duplicates every earlier fold twice per step (2^k
    blow-up; measured 20+ s of analysis at k=8)."""
    v = F.col(vec_col).cast("array<double>")
    cb = df.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in centroids],)],
        "__kmeans_cents array<array<double>>",
    )
    darr = F.transform(F.col("__kmeans_cents"), lambda c: _sqdist(v, c))
    best = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    return df.crossJoin(F.broadcast(cb)).select(
        F.col(id_col).alias("id"), best.alias("cell")
    )


def init_centroids(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "first",
) -> list[list[float]]:
    """Deterministic init, components rounded to 6 decimals (same contract
    as the update step).

    init="first": the k vectors with the smallest ids — the oracle-twinned
    default (trivially unrollable in SQL).
    init="hash": the k vectors with the smallest md5(id) — a deterministic
    uniform spread over the corpus regardless of how ids correlate with
    position in space. The retrain-on-drift seeding: first-k ids all come
    from the pre-drift region and leave a drifted cluster with one
    codeword; hash order samples every region proportionally."""
    sel = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    if init == "hash":
        sel = sel.orderBy(F.md5(F.col("id").cast("string")), "id")
    elif init == "first":
        sel = sel.orderBy("id")
    else:
        raise ValueError(f"unknown init strategy {init!r}")
    rows = sel.limit(k).collect()
    return [[_round6(x) for x in r["v"]] for r in rows]


def _round6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def update(
    df: DataFrame,
    assignments: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """New means per (cell, dim): exact decimal sums, rounded to 6 decimals
    with the engine-stable floor trick. A cell that lost every vector keeps
    a zero centroid (deterministic; standard Lloyd's edge case)."""
    joined = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).join(assignments, "id")
    comps = joined.select(
        "cell", F.posexplode("v").alias("dim", "x")
    )
    m = 1_000_000
    means = (
        comps.groupBy("cell", "dim")
        .agg(
            (
                F.floor(
                    (F.sum(F.col("x").cast(_DDEC)).cast("double") / F.count(F.lit(1)))
                    * m
                    + F.lit(0.5)
                )
                / m
            ).alias("mean")
        )
        .collect()
    )
    dim = max(r["dim"] for r in means) + 1 if means else 0
    out = [[0.0] * dim for _ in range(k)]
    for r in means:
        out[r["cell"]][r["dim"]] = r["mean"]
    return out


def lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "first",
) -> tuple[DataFrame, list[list[float]]]:
    """Run `iters` Lloyd iterations; returns (final assignments, centroids)."""
    cents = init_centroids(df, k, id_col, vec_col, init=init)
    for _ in range(iters):
        a = assign(df, cents, id_col, vec_col)
        cents = update(df, a, k, id_col, vec_col)
    return assign(df, cents, id_col, vec_col), cents
