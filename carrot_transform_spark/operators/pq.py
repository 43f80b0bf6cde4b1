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
    impl: str = "fold",
) -> DataFrame:
    """(id, code): code[j] = nearest codeword of subspace j (exact-decimal
    argmin, ties to the lower index — same contract as kmeans.assign).

    impl="fold" (default): the m codebooks ride in a one-row broadcast
    frame (array<array<array<double>>>, outer index = subspace), not as
    plan literals: plan size is O(1) in m·k_sub, so byte-code PQ
    (k_sub=256) compiles exactly like the 16-codeword test shape.
    Per-subspace argmin uses the same exact-decimal zip_with fold as the
    old literal form — bit-identical codes, and the form every oracle
    comparison pins.

    impl="arrow": mapInArrow over numpy codebooks in the task closure —
    one ||x-c||^2 = ||x||^2 - 2x·c + ||c||^2 matmul per (batch, subspace),
    the same BLAS trade as similarity.assign_cells' arrow path (the heavy
    fold at the 100 TB encode scale: m sub-quantizations per vector).
    np.argmin keeps the first minimum, matching the fold's lower-index
    tie-break; scores differ only in summation order, so codes can differ
    solely on near-exact ties between distinct codewords."""
    if impl == "arrow":
        return _encode_arrow(df, codebooks, id_col, vec_col)
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


def _encode_arrow(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Vectorized PQ encode: per subspace, argmin over -2 X Cᵀ + ||c||²
    (the ||x||² term is constant per row and cannot change the argmin)."""
    import numpy as np

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d = books[0].shape[1]
    dim = m * d
    cn = [np.sum(b * b, axis=1) for b in books]  # ||c||^2 per codeword

    src = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    id_type = src.schema["id"].dataType.simpleString()

    def quantize(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            flat = batch.column(1).flatten()
            V = flat.to_numpy(zero_copy_only=False).reshape(-1, dim)
            n = V.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                S = V[:, j * d : (j + 1) * d]
                codes[:, j] = np.argmin(S @ (-2.0 * books[j].T) + cn[j], axis=1)
            off = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
            code_arr = pa.ListArray.from_arrays(
                off, pa.array(codes.reshape(-1), pa.int32())
            )
            yield pa.RecordBatch.from_arrays([ids, code_arr], ["id", "code"])

    return src.mapInArrow(quantize, f"id {id_type}, code array<int>")


def quantization_distortion(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean per-vector quantization error under ``codebooks``: the average
    over rows of sum_j min_c ||sub_j - codeword_c||^2 — exactly the
    residual ADC scores against, so it is THE drift metric for a PQ store:
    when a corpus shifts away from the training distribution, every
    subvector's nearest codeword gets farther and this number rises. One
    narrow aggregation (single-row collect); codebooks broadcast as data
    like encode()."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    v = F.col(vec_col).cast("array<double>")
    cb = df.sparkSession.createDataFrame(
        [([[[float(x) for x in cw] for cw in book] for book in codebooks],)],
        "__pq_books array<array<array<double>>>",
    )

    def sub_err(book, j):
        sv = F.slice(v, j * d + F.lit(1), d)
        darr = F.transform(
            book,
            lambda cw: F.aggregate(
                F.zip_with(sv, cw, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        )
        return F.array_min(darr)

    total = F.aggregate(
        F.transform(F.col("__pq_books"), sub_err), F.lit(0.0), lambda a, t: a + t
    )
    row = df.crossJoin(F.broadcast(cb)).agg(F.avg(total)).first()
    return float(row[0]) if row[0] is not None else 0.0


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


def _adc_tables_arrow(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, __qtables): per-query ADC lookup tables, vectorized —
    table[j][c] = ||q_sub_j - codeword_c||², computed per Arrow batch as
    ||q||² - 2 Q Cᵀ + ||c||² (one matmul per subspace)."""
    import numpy as np

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d = books[0].shape[1]
    k_sub = books[0].shape[0]
    dim = m * d
    cn = [np.sum(b * b, axis=1) for b in books]

    src = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    id_type = src.schema["query_id"].dataType.simpleString()

    def tables(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            flat = batch.column(1).flatten()
            V = flat.to_numpy(zero_copy_only=False).reshape(-1, dim)
            n = V.shape[0]
            T = np.empty((n, m, k_sub), dtype=np.float64)
            for j in range(m):
                S = V[:, j * d : (j + 1) * d]
                T[:, j, :] = (
                    np.sum(S * S, axis=1)[:, None] + S @ (-2.0 * books[j].T) + cn[j]
                )
            inner_off = pa.array(np.arange(0, (n * m + 1) * k_sub, k_sub, dtype=np.int32))
            inner = pa.ListArray.from_arrays(
                inner_off, pa.array(T.reshape(-1), pa.float64())
            )
            outer_off = pa.array(np.arange(0, (n + 1) * m, m, dtype=np.int32))
            outer = pa.ListArray.from_arrays(outer_off, inner)
            yield pa.RecordBatch.from_arrays([ids, outer], ["query_id", "__qtables"])

    return src.mapInArrow(
        tables, f"query_id {id_type}, __qtables array<array<double>>"
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
    impl: str = "fold",
    max_broadcast_bytes: int = 64 << 20,
) -> DataFrame:
    """(query_id, neighbor_id, approx_dist, rnk): set-oriented ADC top-k —
    the batch form of adc_topk, which is one-query-per-call because its
    lookup tables are plan literals.

    Per query, the m x k_sub table of d(query_sub, codeword)^2 is computed
    DISTRIBUTEDLY from the broadcast codebook frame (one array<double>
    fold per subspace x codeword — the table is m.k_sub scalars per query;
    impl="arrow" computes the same tables with one BLAS matmul per batch,
    the fast path when the query batch or k_sub is large — table VALUES
    may differ from the fold in last-ulp summation order, which can only
    reorder near-exact distance ties), then the query frame
    (id, tables[, cells]) joins onto the codes: approximate distance is m
    element_at lookups + adds per (code row x query) candidate. With
    `query_cells` (query_id, cell[, probe_rank] — e.g.
    similarity.probe_cells output) the join keys on the code's cell
    column, so candidates are the probed cells only — the IVF-PQ batch
    search; without it every code row is a candidate (exhaustive ADC
    rerank).

    The query side is broadcast only while its estimated table payload
    (rows x m x k_sub doubles) stays under ``max_broadcast_bytes`` — a
    10^5+-query batch at m=16, k_sub=256 is gigabytes of lookup tables,
    which would OOM the driver under an unconditional broadcast hint;
    above the bound the hint is dropped and the planner picks a shuffle
    join keyed on the cell. Sizing costs one count() of the (pruned)
    query frame.

    At 100 TB the codes dataset is cell-partitioned parquet: the
    broadcast-hash join on `cell` after partition pruning touches only
    probed cells' files, and the per-query top-k window holds k rows per
    query."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    if impl == "arrow":
        q = _adc_tables_arrow(queries, codebooks, id_col, vec_col)
    else:
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
    k_sub = len(codebooks[0])
    per_row = m * k_sub * 8
    if query_cells is not None:
        qc = query_cells.select(
            F.col("query_id").alias("__qc_id") if "query_id" in query_cells.columns
            else F.col("id").alias("__qc_id"),
            F.col(cell_col).alias("__qc_cell"),
        ).distinct()
        q = q.join(qc, F.col("query_id") == F.col("__qc_id")).drop("__qc_id")
        # qc.count() is column-pruned — the per-query tables are never
        # computed for the sizing pass
        small = qc.count() * per_row <= max_broadcast_bytes
        cond = F.col(cell_col) == F.col("__qc_cell")
        joined = codes.join(F.broadcast(q) if small else q, cond).drop("__qc_cell")
    else:
        small = queries.count() * per_row <= max_broadcast_bytes
        joined = codes.crossJoin(F.broadcast(q) if small else q)
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
