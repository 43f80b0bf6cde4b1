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


def adc_topk_batch(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_cells: DataFrame | None = None,
    cell_col: str = "cell",
) -> DataFrame:
    """(query_id, neighbor_id, approx_dist, rnk): set-oriented ADC top-k —
    the batch form of adc_topk, which is one-query-per-call because its
    lookup tables are plan literals.

    Per query, the m x k_sub table of d(query_sub, codeword)^2 is computed
    DISTRIBUTEDLY from the broadcast codebook frame (one array<double>
    fold per subspace x codeword — the table is m.k_sub scalars per query,
    metadata-sized), then the query frame (id, tables[, cells]) broadcasts
    onto the codes: approximate distance is m element_at lookups + adds
    per (code row x query) candidate. With `query_cells`
    (query_id, cell[, probe_rank] — e.g. similarity.probe_cells output)
    the join keys on the code's cell column, so candidates are the probed
    cells only — the IVF-PQ batch search; without it every code row is a
    candidate (exhaustive ADC rerank).

    At 100 TB the codes dataset is cell-partitioned parquet: the
    broadcast-hash join on `cell` after partition pruning touches only
    probed cells' files, and the per-query top-k window holds k rows per
    query."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb = codes.sparkSession.createDataFrame(
        [([[[float(x) for x in cw] for cw in book] for book in codebooks],)],
        "__pq_books array<array<array<double>>>",
    )
    v = F.col(vec_col).cast("array<double>")

    def table_for(book, j):
        sub = F.slice(v, j * d + F.lit(1), d)
        return F.transform(
            book,
            lambda cw: F.aggregate(
                F.zip_with(sub, cw, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        )

    q = (
        queries.crossJoin(F.broadcast(cb))
        .select(
            F.col(id_col).alias("query_id"),
            F.transform(F.col("__pq_books"), table_for).alias("__qtables"),
        )
    )
    if query_cells is not None:
        qc = query_cells.select(
            F.col("query_id").alias("__qc_id") if "query_id" in query_cells.columns
            else F.col("id").alias("__qc_id"),
            F.col(cell_col).alias("__qc_cell"),
        ).distinct()
        q = q.join(qc, F.col("query_id") == F.col("__qc_id")).drop("__qc_id")
        cond = F.col(cell_col) == F.col("__qc_cell")
        joined = codes.join(F.broadcast(q), cond).drop("__qc_cell")
    else:
        joined = codes.crossJoin(F.broadcast(q))
    dist = None
    for j in range(m):
        term = F.element_at(
            F.element_at("__qtables", j + 1), F.element_at("code", j + 1) + 1
        )
        dist = term if dist is None else dist + term
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        joined.select(
            "query_id", F.col("id").alias("neighbor_id"), dist.alias("approx_dist")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
