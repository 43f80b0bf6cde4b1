"""Streaming near-dup index maintenance: keep a MinHash/LSH index current
as documents arrive, emitting the near-dup pairs each micro-batch exposes.

foreachBatch (via the shared streaming/maintenance.py protocol) drives the
SAME frame-level operators the offline path uses (operators/dedup.py):
batch-vs-index + batch-vs-batch candidates, exact Jaccard verify on
candidates only, then the batch commits into the store as one versioned
unit. Invariant (tested): after any split of a corpus into micro-batches,
the union of per-step pair outputs equals the from-scratch full-corpus
pair set — each pair is discovered exactly once, in the step where its
later member arrives.

Exactly-once, replay, and compaction semantics live in
streaming/maintenance.py; pairs are written before the unit commit.

At scale each step costs O(batch + bucket collisions): the corpus text is
never re-read, and the only index data touched are band rows sharing a
bucket with the batch and shingle rows of candidate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from carrot_transform_spark.operators.dedup import (
    incremental_candidate_pairs,
    minhash_index_frames,
    minhash_index_store,
    verify_incremental,
)
from carrot_transform_spark.streaming.maintenance import maintain_units


def neardup_step(
    spark,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.7,
    shingle_n: int = 3,
):
    """The per-batch step_fn (see streaming/maintenance.py): build the
    batch's frames, find+verify pairs against the pre-unit store view,
    write pairs, commit the unit."""

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        reg: list[DataFrame] = []
        b_bands, b_index = minhash_index_frames(
            batch_df.select(id_col, text_col), id_col, text_col,
            k=k, rows_per_band=rows_per_band, shingle_n=shingle_n,
            persist_registry=reg,
        )
        if units:
            base_bands = store.load("bands", units)
            base_index = store.load("shingles", units)
        else:  # first batch bootstraps the store: probe only itself
            base_bands = spark.createDataFrame([], b_bands.schema)
            base_index = spark.createDataFrame([], b_index.schema)
        cand = incremental_candidate_pairs(b_bands, base_bands).localCheckpoint(
            eager=True
        )
        pairs = verify_incremental(cand, b_index, base_index, threshold=threshold)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        store.commit(unit, {"bands": b_bands, "shingles": b_index})
        for df in reg:
            df.unpersist()

    return step


def maintain_neardup_index(
    docs: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.7,
    shingle_n: int = 3,
    compact_every: int | None = None,
):
    """Start (and return) the streaming query maintaining the index.

    `docs` is a streaming DataFrame of (id_col, text_col, ...). Each
    micro-batch appends one store unit `s<batch_id>` and one pairs dir
    `{pairs_dir}/s<batch_id>`; read all discovered pairs back with
    spark.read.parquet(f"{pairs_dir}/s*")."""
    spark = docs.sparkSession
    step = neardup_step(
        spark, pairs_dir, id_col=id_col, text_col=text_col, k=k,
        rows_per_band=rows_per_band, threshold=threshold, shingle_n=shingle_n,
    )
    return maintain_units(
        docs,
        checkpoint_dir,
        lambda: minhash_index_store(spark, store_dir),
        step,
        compact_every=compact_every,
    )


def simhash_step(
    spark,
    pairs_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 8,
    prefix_bits: int = 16,
    sim_bits: int = 64,
):
    """Per-batch step_fn for the SimHash signature store: the shared
    simhash_decide core, pairs written before the unit commit."""
    from carrot_transform_spark.operators.dedup import simhash_decide

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        b_sig, pairs = simhash_decide(
            batch_df.select(id_col, text_col), store, units, id_col, text_col,
            max_distance=max_distance, prefix_bits=prefix_bits, sim_bits=sim_bits,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        store.commit(unit, {"sigs": b_sig})

    return step


def maintain_simhash_index(
    docs: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 8,
    prefix_bits: int = 16,
    sim_bits: int = 64,
    compact_every: int | None = None,
):
    """Streaming maintainer for the SimHash signature store — the Hamming
    sibling of maintain_neardup_index, same exactly-once protocol
    (streaming/maintenance.py)."""
    from carrot_transform_spark.operators.dedup import simhash_index_store

    spark = docs.sparkSession
    return maintain_units(
        docs,
        checkpoint_dir,
        lambda: simhash_index_store(spark, store_dir),
        simhash_step(
            spark, pairs_dir, id_col=id_col, text_col=text_col,
            max_distance=max_distance, prefix_bits=prefix_bits, sim_bits=sim_bits,
        ),
        compact_every=compact_every,
    )
