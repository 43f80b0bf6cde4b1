"""Similarity-search operators over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k for a (small, broadcastable)
  query set — the correctness baseline.
- ``ivf_topk``: candidates restricted to the query's coarse cell
  (nearest-centroid id column) — the scale path; at 100 TB the corpus is
  partitioned/bucketed by cell so a probe touches n_probe partitions.
- ``assign_cells``: a k-means-free coarse quantizer: nearest of a given
  centroid list by cosine (driver-supplied centroids, broadcast as
  literals) — enough to build an IVF layout without MLlib.
- ``neardup_pairs``: threshold variant for embedding dedup.

All dot products are JVM-side zip_with/aggregate folds in double precision.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


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
        .select("query_id", "neighbor_id", F.round("cs", 4).alias("cosine_sim"), "rnk")
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
        .select("query_id", "neighbor_id", F.round("cs", 4).alias("cosine_sim"), "rnk")
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest centroid by cosine; centroids are literals in the
    plan (fine for hundreds of cells — the usual IVF coarse codebook).

    Implemented as array_min over (-sim, cell) structs — a WIDE expression,
    not a nested when-chain: chained whens grow the tree depth linearly in
    the cell count and overflow Spark's column-conversion stack around ~64
    cells, while the flat array converts and codegens at any realistic
    codebook size. Struct ordering breaks exact ties toward the lower cell
    id, matching the keep-first semantics of the old chain."""
    n = _normed(df, id_col, vec_col)
    entries = []
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        sim = dot(F.col("v"), carr) / (F.col("nrm") * F.lit(cn))
        entries.append(F.struct((-sim).alias("neg"), F.lit(ci).alias("cell")))
    return n.select(F.col("id"), F.array_min(F.array(*entries))["cell"].alias("cell"))


def neardup_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, cosine_sim >= threshold), blocked by a coarse column."""
    n = _normed(df, id_col, vec_col, extra=[block_col])
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
        "id_a", "id_b", F.round("cs", 4).alias("cosine_sim")
    )


def knn_graph(
    df: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
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
    join, which multiplies candidate volume by n_probe, not by |corpus|."""
    n = _normed(df, id_col, vec_col, extra=[cell_col])
    a = n.select(
        F.col("id"), F.col(cell_col).alias("ca"),
        F.col("v").alias("va"), F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("id").alias("neighbor_id"), F.col(cell_col).alias("cb"),
        F.col("v").alias("vb"), F.col("nrm").alias("nb"),
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
        .select("id", "neighbor_id", F.round("cs", 4).alias("cosine_sim"), "rnk")
    )


def probe_cells(
    df: DataFrame,
    centroids: list[list[float]],
    n_probe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, probe_rank): each vector's n_probe nearest centroids by
    cosine, rank 0 = primary cell. The multi-probe side of an IVF query:
    the corpus stays in its primary cell, queries fan out to n_probe cells.
    All plan literals — sort_array over (−sim, cell) structs, no UDF."""
    n = _normed(df, id_col, vec_col)
    entries = []
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        cn = float(sum(x * x for x in c) ** 0.5) or 1.0
        sim = dot(F.col("v"), carr) / (F.col("nrm") * F.lit(cn))
        entries.append(F.struct((-sim).alias("neg"), F.lit(ci).alias("cell")))
    ranked = F.slice(F.sort_array(F.array(*entries)), 1, n_probe)
    return (
        n.select("id", F.posexplode(ranked).alias("probe_rank", "e"))
        .select("id", F.col("e.cell").alias("cell"), "probe_rank")
    )


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
        .select("query_id", "neighbor_id", F.round("cs", 4).alias("cosine_sim"), "rnk")
    )
