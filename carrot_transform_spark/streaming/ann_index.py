"""Streaming IVF vector-index maintenance + incremental embedding near-dup.

The embedding twin of streaming/dedup_index.py, on the same UnitStore
commit substrate (protocol in streaming/maintenance.py): each micro-batch
of vectors is coarse-quantized to its nearest centroid cell
(operators/similarity.assign_cells — plan-literal centroids, no UDF),
near-dup pairs against the index-so-far plus the batch are emitted, and
the batch commits as one versioned unit of (id, v, nrm, cell) rows.

Invariant (tested): union of per-step pair outputs == the one-shot
cell-blocked neardup_pairs over the full corpus — a pair is discovered
exactly once, when its later member arrives.

Query-time search (`search_vector_store`) reads the committed units as the
IVF corpus, reusing BOTH the stored cell ids and the stored norms — only
the query batch is quantized and normed; at 100 TB each unit is
cell-partitioned parquet, so a probe is a partition-pruned scan of n_probe
cells per unit, and compaction (compact_every) restores one-dir-per-cell
locality without stopping ingest.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.operators.similarity import _normed, assign_cells, dot
from carrot_transform_spark.operators.unitstore import UnitStore
from carrot_transform_spark.streaming.maintenance import maintain_units

_DATASET = "vectors"


def vector_store(spark: SparkSession, path: str) -> UnitStore:
    return UnitStore(spark, path, (_DATASET,))


def ivf_corpus(spark: SparkSession, path: str) -> DataFrame:
    """(id, v, nrm, cell) over all committed units — the IVF search corpus."""
    return vector_store(spark, path).load(_DATASET)


def compact_vector_store(spark: SparkSession, path: str, vacuum: bool = True) -> str:
    """Fold all live units into ONE unit hive-partitioned by cell, so
    every probe becomes a partition-pruned scan: a filter or broadcast
    join on `cell` touches only the matching cell=… subdirs (static
    PartitionFilters / dynamic partition pruning) instead of every file.
    Run it when enough streamed units accumulate — the rewrite is exactly
    one shuffle-free pass plus the atomic commit. Returns the new unit
    name."""
    store = vector_store(spark, path)
    unit = store.fresh_unit("c")
    replaced = store.compact(unit, partition_by={_DATASET: ["cell"]})
    if vacuum:
        store.vacuum(replaced)
    return unit


def search_vector_store(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Multi-probe IVF top-k over the committed store, reusing the cell ids
    AND norms the maintainer already computed — only the (small) query
    batch is quantized. (query_id, neighbor_id, cosine_sim, rnk)."""
    from carrot_transform_spark.operators.similarity import ivf_topk_multiprobe

    return ivf_topk_multiprobe(
        ivf_corpus(spark, path), queries, centroids, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, k=k, normed_corpus=True,
    )


def _side(df: DataFrame, suffix: str) -> DataFrame:
    return df.select(
        F.col("id").alias(f"id_{suffix}"), F.col("cell").alias(f"c{suffix}"),
        F.col("v").alias(f"v{suffix}"), F.col("nrm").alias(f"n{suffix}"),
    )


def _cell_pairs(new: DataFrame, old: DataFrame, threshold: float) -> DataFrame:
    """Same-cell cosine pairs (id_a < id_b) touching `new`: each such pair
    exactly once — either its smaller id is new (p1: new vs old+new) or its
    smaller id is old and the larger is new (p2). Frames carry
    (id, v, nrm, cell)."""
    lt = (F.col("ca") == F.col("cb")) & (F.col("id_a") < F.col("id_b"))
    p1 = _side(new, "a").join(_side(old.unionByName(new), "b"), lt)
    p2 = _side(old, "a").join(_side(new, "b"), lt)
    pairs = p1.unionByName(p2).select(
        "id_a", "id_b",
        (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cs"),
    )
    return pairs.filter(F.col("cs") >= threshold).select(
        "id_a", "id_b", F.round("cs", 4).alias("cosine_sim")
    )


def maintain_vector_index(
    vectors: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    compact_every: int | None = None,
):
    """Start (and return) the streaming query maintaining the IVF store.

    `vectors` is a streaming DataFrame of (id_col, vec_col, ...). Each
    micro-batch appends one store unit `s<batch_id>` and one pairs dir
    `{pairs_dir}/s<batch_id>`; read all discovered pairs back with
    spark.read.parquet(f"{pairs_dir}/s*")."""
    spark = vectors.sparkSession

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        cells = assign_cells(batch_df, centroids, id_col, vec_col).withColumnRenamed(
            "id", "__cid"
        )
        new = (
            _normed(batch_df, id_col, vec_col)
            .join(cells, F.col("id") == F.col("__cid"))
            .drop("__cid")
            .localCheckpoint(eager=True)  # small batch; reused by pairs + commit
        )
        old = (
            store.load(_DATASET, units)
            if units
            else spark.createDataFrame([], new.schema)
        )
        pairs = _cell_pairs(new, old, threshold).localCheckpoint(eager=True)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        store.commit(unit, {_DATASET: new})

    return maintain_units(
        vectors,
        checkpoint_dir,
        lambda: vector_store(spark, store_dir),
        step,
        compact_every=compact_every,
    )
