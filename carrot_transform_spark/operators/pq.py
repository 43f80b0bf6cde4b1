"""Product quantization: compress embeddings to m byte-codes and search
with asymmetric distance computation (ADC).

The memory half of the IVF-PQ recipe (operators/similarity.py is the
routing half): each vector splits into m subvectors, each subvector maps
to its nearest centroid in a per-subspace codebook (k_sub codewords), and
the stored corpus is just m small ints per vector — 8 bytes instead of
4·dim. A query scores candidates WITHOUT decompression: per subspace,
d(query_sub, codeword) is precomputed into an m × k_sub lookup table,
broadcast as plan literals, and the approximate distance is m array
lookups + adds per corpus row — a narrow projection, no shuffle beyond
the final top-k window.

Training reuses the deterministic Lloyd iterations from
operators/kmeans.py per subspace (driver holds m·k_sub·(dim/m) floats —
the codebook is metadata-sized). Everything downstream of training is
pure column expressions; like IVF, the quality/recall trade is the point,
so tests assert recall against the exact brute force, not equality.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _subvec(vec, m: int, dim: int, j: int):
    """j-th of m equal slices of an array<double> column."""
    d = dim // m
    return F.slice(vec, j * d + 1, d)


def train_codebooks(
    df: DataFrame,
    m: int,
    k_sub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "first",
) -> list[list[list[float]]]:
    """Per-subspace codebooks via deterministic Lloyd iterations:
    codebooks[j][c] = centroid c of subspace j. init="hash" seeds each
    subspace's Lloyd from a deterministic uniform spread over the corpus
    (kmeans.init_centroids) — use it when retraining on a drifted corpus,
    where first-k-id seeds all come from the pre-drift region."""
    from carrot_transform_spark.operators.kmeans import lloyd

    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    v = F.col(vec_col).cast("array<double>")
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = df.select(F.col(id_col).alias("sid"), _subvec(v, m, dim, j).alias("sv"))
        _, cents = lloyd(sub, k=k_sub, iters=iters, id_col="sid", vec_col="sv", init=init)
        books.append(cents)
    return books


def encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code): code[j] = nearest codeword of subspace j (exact-decimal
    argmin, ties to the lower index — same contract as kmeans.assign).

    The m codebooks ride in a one-row broadcast frame
    (array<array<array<double>>>, outer index = subspace), not as plan
    literals: plan size is O(1) in m·k_sub, so byte-code PQ (k_sub=256)
    compiles exactly like the 16-codeword test shape. Per-subspace argmin
    uses the same exact-decimal zip_with fold as the old literal form —
    bit-identical codes."""
    from carrot_transform_spark.operators.kmeans import _sqdist

    m = len(codebooks)
    d = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    cb = df.sparkSession.createDataFrame(
        [([[[float(x) for x in cw] for cw in book] for book in codebooks],)],
        "__pq_books array<array<array<double>>>",
    )

    def best_cw(book, j):
        sv = F.slice(v, j * d + F.lit(1), d)
        darr = F.transform(book, lambda cw: _sqdist(sv, cw))
        return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")

    code = F.transform(F.col("__pq_books"), best_cw)
    return df.crossJoin(F.broadcast(cb)).select(
        F.col(id_col).alias("id"), code.alias("code")
    )


def adc_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 5,
) -> DataFrame:
    """(neighbor_id, approx_dist, rnk): top-k smallest approximate squared
    L2 to the query, scored from codes alone via per-subspace lookup
    tables (plan literals — m element_at calls per row)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    tables = []
    for j, book in enumerate(codebooks):
        q_sub = query_vec[j * d : (j + 1) * d]
        tables.append(
            F.array(
                *[
                    F.lit(float(sum((x - c) ** 2 for x, c in zip(q_sub, cw))))
                    for cw in book
                ]
            )
        )
    dist = None
    for j in range(m):
        term = F.element_at(tables[j], F.element_at("code", j + 1) + 1)
        dist = term if dist is None else dist + term
    w = Window.orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        codes.select(F.col("id").alias("neighbor_id"), dist.alias("approx_dist"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
