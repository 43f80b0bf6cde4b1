"""Similarity-search operators over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a (small, broadcastable)
  query set — the correctness baseline.
- ``ivf_topk``: candidates restricted to the query's coarse cell
  (nearest-centroid id column) — the scale path; at 100 TB the corpus is
  partitioned/bucketed by cell so a probe touches n_probe partitions.
- ``assign_cells``: a k-means-free coarse quantizer: nearest of a given
  centroid list by cosine. The codebook travels as DATA (a one-row
  broadcast frame holding array<struct<cell,cvec,cnorm>>), not as plan
  literals — plan size and codegen stay O(1) in the cell count, so a
  10^4–10^5-cell IVF coarse codebook (the 100 TB shape) compiles exactly
  like an 8-cell one. Scoring is the same per-centroid zip_with/aggregate
  fold as before, so results are bit-identical to the literal form.
- ``neardup_pairs``: threshold variant for embedding dedup.

All dot products are JVM-side zip_with/aggregate folds in double precision;
similarity outputs are rounded with the engine-stable ``fround`` (never
native ROUND, which diverges from DuckDB on '5'-terminated reprs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from carrot_transform_spark.functions.rounding import fround


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def _normed(df: DataFrame, id_col: str, vec_col: str, extra: list[str] | None = None) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col).alias("id"), v.alias("v"), norm(v).alias("nrm")]
    cols += [F.col(c) for c in (extra or [])]
    return df.select(*cols)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, cosine_sim, rnk): exact top-k by cosine.
    Queries are broadcast; scoring is a narrow map over the corpus; ranking
    is a per-query window."""
    n = _normed(corpus, id_col, vec_col)
    q = _normed(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = n.join(F.broadcast(q), F.col("id") != F.col("query_id")).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Top-k restricted to the query's coarse cell (IVF, n_probe=1)."""
    n = _normed(corpus, id_col, vec_col, extra=[cell_col])
    q = _normed(queries, id_col, vec_col, extra=[cell_col]).select(
        F.col("id").alias("query_id"),
        F.col(cell_col).alias("qcell"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = n.join(
        F.broadcast(q),
        (F.col(cell_col) == F.col("qcell")) & (F.col("id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
    )


def codebook_frame(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    """One-row frame carrying the whole codebook as
    array<struct<cell:int, cvec:array<double>, cnorm:double>>.

    Centroids are DATA, not plan literals: a broadcast-nested-loop join
    against this single row attaches the codebook to every vector row by
    reference, so plan text, analysis time, and codegen are O(1) in the
    cell count (10^5 cells x 64 dims ~ 50 MB — comfortably broadcastable;
    the old literal form blew up plan size linearly and capped out around
    hundreds of cells)."""
    entries = [
        (ci, [float(x) for x in c], float(sum(x * x for x in c) ** 0.5) or 1.0)
        for ci, c in enumerate(centroids)
    ]
    return spark.createDataFrame(
        [(entries,)],
        "__codebook array<struct<cell:int,cvec:array<double>,cnorm:double>>",
    )


def _neg_sim_entries(v: Column, nrm: Column, codebook: Column) -> Column:
    """array<struct<neg:double, cell:int>>: per-centroid (-cosine, cell).

    The per-centroid fold is the same dot()/norm sequence the plan-literal
    form used (left-to-right aggregate over zip_with), so scores — and
    therefore argmin cells — are bit-identical to the old implementation
    and to the sequential `+`-chain the DuckDB oracles compute."""
    return F.transform(
        codebook,
        lambda e: F.struct(
            (-(dot(v, e["cvec"]) / (nrm * e["cnorm"]))).alias("neg"),
            e["cell"].alias("cell"),
        ),
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "fold",
) -> DataFrame:
    """(id, cell): nearest centroid by cosine, codebook broadcast as data
    (see codebook_frame — O(1) plan size at any cell count).

    impl="fold" (default): JVM higher-order-function scoring, argmin via
    array_min over (-sim, cell) structs; struct ordering breaks exact ties
    toward the lower cell id (keep-first). Bit-identical to the sequential
    `+`-chain the DuckDB oracles compute — the correctness reference.

    impl="arrow": mapInArrow over a numpy codebook broadcast in the task
    closure — one BLAS matmul per Arrow batch, ~2 orders of magnitude
    faster at 10^3+ cells (the 100 TB quantization path). argmax of
    V @ normalized-codebookᵀ; np.argmax keeps the first maximum, matching
    the fold's lower-cell tie-break. Scores differ from the fold only in
    summation order (pairwise vs sequential), so assignments can differ
    solely on near-exact ties between distinct centroids — irrelevant to
    IVF routing quality, which is why the oracle-compared queries pin
    impl="fold"."""
    if impl == "arrow":
        return _assign_cells_arrow(df, centroids, id_col, vec_col)
    n = _normed(df, id_col, vec_col)
    cb = codebook_frame(df.sparkSession, centroids)
    return n.crossJoin(F.broadcast(cb)).select(
        F.col("id"),
        F.array_min(
            _neg_sim_entries(F.col("v"), F.col("nrm"), F.col("__codebook"))
        )["cell"].alias("cell"),
    )


def _assign_cells_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Vectorized coarse quantization: argmax(V @ Ĉᵀ) per Arrow batch."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0.0] = 1.0
    Cu = np.ascontiguousarray((C / norms[:, None]).T)  # dim x k
    dim = C.shape[1]

    src = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    id_type = src.schema["id"].dataType.simpleString()

    def quantize(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            lst = batch.column(1)
            if isinstance(lst, pa.ChunkedArray):  # pragma: no cover
                lst = lst.combine_chunks()
            flat = lst.flatten()
            V = flat.to_numpy(zero_copy_only=False).reshape(-1, dim)
            cells = np.argmax(V @ Cu, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(cells, pa.int32())], ["id", "cell"]
            )

    return src.mapInArrow(quantize, f"id {id_type}, cell int")


# auto hot-cell bounding: a cell is "hot" only when it exceeds BOTH the
# skew factor x median cell size AND the absolute floor — so small corpora
# and uniform layouts (every oracle/test corpus) never trigger and
# auto == uncapped there by construction
_AUTO_CAP_FLOOR = 4096
_AUTO_SKEW_FACTOR = 8
_AUTO_MAX_SHARDS = 32


def _auto_cap(n: DataFrame, cell_col: str) -> tuple[int | None, int]:
    """(cap, shards) derived from the observed cell-size distribution —
    the knob-free defaults VERDICT r8 task 3 asks for. One count-per-cell
    aggregation (|cells| rows, map-side combined, five-scalar collect).

    No cell hot (max <= _AUTO_SKEW_FACTOR x median, or everything under
    the floor) -> (None, 1): exactly the uncapped/unsalted plan.
    Hot -> cap near the top of the NORMAL size distribution so healthy
    cells are untouched: p99 cell size when p99 is itself normal, else
    (few cells, so the hot one IS the p99) 2 x median; floored at
    _AUTO_CAP_FLOOR. shards = the over-representation factor
    (diagnostics.skew_profile's salts_hint), clamped to _AUTO_MAX_SHARDS.
    percentile_approx makes the trigger data-dependent but
    margin-insensitive: it only engages at 8x skew, far beyond sketch
    error."""
    row = (
        n.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c"),
            F.expr("percentile_approx(c, 0.5)"),
            F.expr("percentile_approx(c, 0.99)"),
            F.sum("c"),
            F.count(F.lit(1)),
        )
        .first()
    )
    mx, med, p99, total, nkeys = row
    if mx is None:
        return None, 1
    med = max(int(med or 1), 1)
    if mx <= _AUTO_SKEW_FACTOR * med or mx <= _AUTO_CAP_FLOOR:
        return None, 1
    p99 = int(p99 or 0)
    normal_hi = p99 if p99 <= _AUTO_SKEW_FACTOR * med else 2 * med
    cap = max(normal_hi, _AUTO_CAP_FLOOR)
    shards = max(1, min(_AUTO_MAX_SHARDS, -(-int(mx) * int(nkeys) // int(total))))
    return cap, shards


def _resolve_cap(
    n: DataFrame, cell_col: str, cap: int | None | str
) -> tuple[int | None, int]:
    """Turn a max_cell_size knob ("auto" | int | None) into (cap, shards)."""
    if cap == "auto":
        return _auto_cap(n, cell_col)
    return cap, 1


def _cap_cell(n: DataFrame, cell_col: str, cap: int | None) -> DataFrame:
    """At most ``cap`` deterministic representatives per cell (None = all).

    The hot-cell bound for the same-cell self-joins below: without it one
    degenerate cell (a duplicate blob, a zero-vector sink) does |cell|^2
    work in a single straggler task. Selection is cap_per_group's pure
    hash-of-(id, salt) ranking — stable under retries, partitioning, and
    corpus growth, and exactly the identity when no cell exceeds the cap,
    so capped == uncapped on non-skewed data. Use
    diagnostics.skew_profile(df, cell_col) to choose the cap from the
    observed cell-size distribution."""
    if cap is None:
        return n
    from carrot_transform_spark.operators.sampling import cap_per_group

    return (
        cap_per_group(n, cell_col, "id", cap, salt="cellcap")
        .filter(F.col("kept") == 1)
        .drop("kept")
    )


def neardup_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_cell_size: int | None | str = "auto",
) -> DataFrame:
    """(id_a, id_b, cosine_sim >= threshold), blocked by a coarse column.

    ``max_cell_size`` bounds the per-cell pair work at cap^2: cells above
    the bound pair only their ``cap`` deterministic representatives (see
    _cap_cell); rows beyond the cap in a degenerate cell sit out pairing
    and survive any downstream dedup as singletons. Cells at or under the
    bound are untouched — identical output to the uncapped form. The
    default "auto" derives the cap from the observed cell sizes
    (_auto_cap: engages only past 8x-median skew above a 4096-row floor,
    so it is exactly the uncapped plan on healthy layouts); None means
    explicitly unbounded."""
    n = _normed(df, id_col, vec_col, extra=[block_col])
    cap, _ = _resolve_cap(n, block_col, max_cell_size)
    n = _cap_cell(n, block_col, cap)
    a = n.select(
        F.col("id").alias("id_a"), F.col(block_col).alias("ba"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("id").alias("id_b"), F.col(block_col).alias("bb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b"))).select(
        "id_a", "id_b", (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs")
    )
    return pairs.filter(F.col("cs") >= threshold).select(
        "id_a", "id_b", fround("cs").alias("cosine_sim")
    )


def neardup_pairs_multiprobe(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_cell_size: int | None | str = "auto",
    impl: str = "fold",
) -> DataFrame:
    """(id_a < id_b, cosine_sim >= threshold) with MULTI-PROBE blocking:
    candidates sit in their primary (nearest-centroid) cell, every vector
    also probes its n_probe nearest cells — so a near-dup pair straddling
    a cell boundary is found as soon as EITHER member probes the other's
    primary cell, the recall gap single-cell blocking (neardup_pairs over
    an assign_cells column) structurally cannot close. At n_probe =
    n_cells this is exactly the all-pairs threshold join.

    Shape matches knn_graph_multiprobe: candidate volume per vector is
    ~n_probe/n_cells of the corpus, never |corpus|; ``max_cell_size`` caps
    the candidate side per primary cell. A pair reachable from both sides
    (or through several probes) is computed more than once before the
    DISTINCT — both directions produce bit-identical rounded similarities
    (the dot/norm folds are commutative per element and summed in the
    same array order), so the dedup is exact."""
    primary = assign_cells(df, centroids, id_col, vec_col, impl=impl).withColumnRenamed(
        "id", "__pid"
    )
    n = (
        _normed(df, id_col, vec_col)
        .join(primary, F.col("id") == F.col("__pid"))
        .drop("__pid")
    )
    cap, _ = _resolve_cap(n, "cell", max_cell_size)
    b = _cap_cell(n, "cell", cap).select(
        F.col("id").alias("id_b"), F.col("cell").alias("cb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    probes = probe_cells(df, centroids, n_probe, id_col, vec_col, impl=impl).select(
        F.col("id").alias("__qid"), F.col("cell").alias("ca")
    )
    a = (
        _normed(df, id_col, vec_col)
        .join(probes, F.col("id") == F.col("__qid"))
        .drop("__qid")
        .select(F.col("id").alias("id_a"), "ca", F.col("v").alias("va"), F.col("nrm").alias("na"))
    )
    pairs = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("id_a") != F.col("id_b"))
    ).select(
        "id_a", "id_b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs"),
    )
    return (
        pairs.filter(F.col("cs") >= threshold)
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            fround("cs").alias("cosine_sim"),
        )
        .distinct()
    )


def knn_graph(
    df: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_cell_size: int | None | str = "auto",
    shards: int | str = "auto",
) -> DataFrame:
    """(id, neighbor_id, cosine_sim, rnk): every vector's top-k neighbors
    within its coarse cell — the k-NN graph that SemDeDup, graph clustering,
    and diversity filtering consume.

    Unlike cosine_topk (broadcast query set) this is symmetric over the
    whole corpus: a same-cell self-join (shuffle keyed on the cell — at
    100 TB the corpus is written bucketed by cell so the join is co-located
    and shuffle-free) followed by a per-node top-k window whose state is k
    rows per node. Recall is governed by the coarse quantizer exactly as in
    IVF search: neighbors outside the cell are unseen; raise recall by
    assigning the corpus to multiple probe cells (probe_cells) before the
    join, which multiplies candidate volume by n_probe, not by |corpus|.

    Hot-cell bounds: ``max_cell_size`` caps the CANDIDATE side per cell
    (every node still gets edges, scored against <= cap deterministic
    representatives — per-cell work |cell| x cap instead of |cell|^2);
    ``shards`` > 1 salts the node side by id and replicates the capped
    candidate side per shard, so a degenerate cell's scoring spreads over
    ``shards`` tasks instead of one straggler (result set identical —
    salting only repartitions the work). The defaults derive BOTH knobs
    from the observed cell-size distribution (_auto_cap): on healthy
    layouts they resolve to uncapped/unsalted; past 8x-median skew above
    the 4096-row floor, cap = p99 cell size and shards = the
    over-representation factor (clamped to 32). Pass ints or None to pin
    either knob."""
    n = _normed(df, id_col, vec_col, extra=[cell_col])
    if max_cell_size == "auto" or shards == "auto":
        a_cap, a_shards = _auto_cap(n, cell_col)
        if max_cell_size == "auto":
            max_cell_size = a_cap
        if shards == "auto":
            shards = a_shards if max_cell_size is not None else 1
    a = n.select(
        F.col("id"), F.col(cell_col).alias("ca"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = _cap_cell(n, cell_col, max_cell_size).select(
        F.col("id").alias("neighbor_id"), F.col(cell_col).alias("cb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    if shards > 1:
        a = a.withColumn("__shard_a", F.pmod(F.xxhash64(F.col("id")), F.lit(shards)))
        b = b.withColumn(
            "__shard_b", F.explode(F.sequence(F.lit(0), F.lit(shards - 1)).cast("array<long>"))
        )
        cond = (
            (F.col("ca") == F.col("cb"))
            & (F.col("__shard_a") == F.col("__shard_b"))
            & (F.col("id") != F.col("neighbor_id"))
        )
    else:
        cond = (F.col("ca") == F.col("cb")) & (F.col("id") != F.col("neighbor_id"))
    scored = a.join(b, cond).select(
        "id", "neighbor_id",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
    )


def knn_graph_multiprobe(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_cell_size: int | None | str = "auto",
    impl: str = "fold",
) -> DataFrame:
    """k-NN graph with node-side multi-probe: each node scores against the
    candidates of its n_probe nearest cells instead of only its primary
    cell — the recall lever knn_graph's docstring points at, packaged.

    Shape: candidates stay in their PRIMARY cell (one row each, optionally
    capped per cell); nodes fan out to n_probe (node, probe-cell) rows, so
    candidate volume is ~n_probe/n_cells of the corpus per node, never
    |corpus|. At n_probe = n_cells this IS the exact brute-force graph
    (asserted in tests). The probe fan-out also acts as built-in salting:
    a node's candidate scoring spreads over its n_probe join groups.
    impl="arrow" vectorizes both the primary assignment and the probe
    ranking for large corpora."""
    primary = assign_cells(df, centroids, id_col, vec_col, impl=impl).withColumnRenamed(
        "id", "__pid"
    )
    n = (
        _normed(df, id_col, vec_col)
        .join(primary, F.col("id") == F.col("__pid"))
        .drop("__pid")
    )
    cap, _ = _resolve_cap(n, "cell", max_cell_size)
    b = _cap_cell(n, "cell", cap).select(
        F.col("id").alias("neighbor_id"), F.col("cell").alias("cb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
    )
    probes = probe_cells(df, centroids, n_probe, id_col, vec_col, impl=impl).select(
        F.col("id").alias("__qid"), F.col("cell").alias("ca")
    )
    a = (
        _normed(df, id_col, vec_col)
        .join(probes, F.col("id") == F.col("__qid"))
        .drop("__qid")
        .select("id", "ca", F.col("v").alias("va"), F.col("nrm").alias("na"))
    )
    scored = a.join(
        b, (F.col("ca") == F.col("cb")) & (F.col("id") != F.col("neighbor_id"))
    ).select(
        "id", "neighbor_id",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
    )


def probe_cells(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "fold",
) -> DataFrame:
    """(id, cell, probe_rank): each vector's n_probe nearest centroids by
    cosine, rank 0 = primary cell. The multi-probe side of an IVF query:
    the corpus stays in its primary cell, queries fan out to n_probe cells.
    Codebook broadcast as data (codebook_frame); sort_array over
    (−sim, cell) structs, no UDF, O(1) plan size in the cell count.
    impl="arrow" ranks with one numpy matmul + argsort per Arrow batch —
    same fold-vs-BLAS trade as assign_cells (ties can differ only on
    near-exact score ties); use it when quantizing large query batches
    against 10^3+ cells."""
    if impl == "arrow":
        return _probe_cells_arrow(df, centroids, n_probe, id_col, vec_col)
    n = _normed(df, id_col, vec_col)
    cb = codebook_frame(df.sparkSession, centroids)
    ranked = F.slice(
        F.sort_array(_neg_sim_entries(F.col("v"), F.col("nrm"), F.col("__codebook"))),
        1,
        n_probe,
    )
    return (
        n.crossJoin(F.broadcast(cb))
        .select("id", F.posexplode(ranked).alias("probe_rank", "e"))
        .select("id", F.col("e.cell").alias("cell"), "probe_rank")
    )


def _probe_cells_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Vectorized multi-probe ranking: top-n_probe of V @ Ĉᵀ per batch.
    np.argsort over the negated scores is stable, so exact ties break
    toward the lower cell id — the fold path's keep-first contract."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0.0] = 1.0
    Cu = np.ascontiguousarray((C / norms[:, None]).T)  # dim x k
    dim, n_cells = C.shape[1], C.shape[0]
    take = min(n_probe, n_cells)

    src = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    id_type = src.schema["id"].dataType.simpleString()

    def rank(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0)
            flat = batch.column(1).flatten()
            V = flat.to_numpy(zero_copy_only=False).reshape(-1, dim)
            order = np.argsort(-(V @ Cu), axis=1, kind="stable")[:, :take]
            n = order.shape[0]
            out_ids = ids.take(pa.array(np.repeat(np.arange(n), take)))
            cells = pa.array(order.reshape(-1).astype(np.int32), pa.int32())
            ranks = pa.array(np.tile(np.arange(take), n).astype(np.int32), pa.int32())
            yield pa.RecordBatch.from_arrays(
                [out_ids, cells, ranks], ["id", "cell", "probe_rank"]
            )

    return src.mapInArrow(rank, f"id {id_type}, cell int, probe_rank int")


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    corpus_cell_col: str | None = None,
    normed_corpus: bool = False,
) -> DataFrame:
    """IVF top-k with query-side multi-probe: corpus vectors live in their
    primary cell; each query probes its n_probe nearest cells. Recall
    approaches brute force as n_probe grows; candidate volume stays
    ~n_probe/n_cells of the corpus. At 100 TB the corpus is written
    bucketed by primary cell, so each probe is a bucket-pruned scan.

    Pass corpus_cell_col when the corpus already carries its cell id (an
    IVF store maintains one) — quantizing a stored corpus again on every
    query batch is the dominant cost of a small search. normed_corpus=True
    goes further: the corpus IS the store frame (id, v, nrm, cell), so
    neither the cells nor the O(dim) norm folds are recomputed."""
    if normed_corpus:
        n = corpus.select("id", "v", "nrm", "cell")
    elif corpus_cell_col is not None:
        n = _normed(corpus, id_col, vec_col, extra=[corpus_cell_col])
        if corpus_cell_col != "cell":
            n = n.withColumnRenamed(corpus_cell_col, "cell")
    else:
        corpus_cells = assign_cells(corpus, centroids, id_col, vec_col).withColumnRenamed(
            "id", "__cid"
        )
        n = _normed(corpus, id_col, vec_col).join(
            corpus_cells, F.col("id") == F.col("__cid")
        ).drop("__cid")
    qcells = probe_cells(queries, centroids, n_probe, id_col, vec_col).withColumnRenamed(
        "id", "__qid"
    )
    q = (
        _normed(queries, id_col, vec_col)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
        .join(qcells, F.col("query_id") == F.col("__qid"))
        .select("query_id", "qv", "qn", F.col("cell").alias("qcell"))
    )
    scored = n.join(
        F.broadcast(q),
        (F.col("cell") == F.col("qcell")) & (F.col("id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cs"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", fround("cs").alias("cosine_sim"), "rnk")
    )
