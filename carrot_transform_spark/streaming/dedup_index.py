"""Streaming near-dup index maintenance: keep a MinHash/LSH index current
as documents arrive, emitting the near-dup pairs each micro-batch exposes.

foreachBatch drives the SAME frame-level operators the offline path uses
(operators/dedup.py): batch-vs-index + batch-vs-batch candidates, exact
Jaccard verify on candidates only, then the batch commits into the store
as one versioned unit. Invariant (tested): after any split of a corpus
into micro-batches, the union of per-step pair outputs equals the
from-scratch full-corpus pair set — each pair is discovered exactly once,
in the step where its later member arrives.

Exactly-once without a transactional sink: the store unit and the pairs
directory are both named by the micro-batch id, and the step writes pairs
BEFORE committing the store unit. A checkpoint replay therefore either
(a) finds the unit committed — the step was fully applied, including its
pairs write — and skips, or (b) recomputes against the identical
committed-unit set (the store listing is _SUCCESS-gated, so a half-written
unit from a crash is invisible) and overwrites the same pairs dir with the
same rows.

At scale each step costs O(batch + bucket collisions): the corpus text is
never re-read, and the only index data touched are band rows sharing a
bucket with the batch and shingle rows of candidate ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from carrot_transform_spark.operators.dedup import (
    incremental_candidate_pairs,
    load_minhash_index,
    minhash_index_frames,
    minhash_index_units,
    save_minhash_index,
    verify_incremental,
)


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
    spark.read.parquet(f"{pairs_dir}/s*").

    compact_every=N folds the store back to one unit whenever N live units
    accumulate (atomic — see UnitStore) and vacuums the replaced dirs;
    immediate vacuum assumes this maintainer is the store's only live
    reader between batches (hold GC separately if other readers attach)."""
    from carrot_transform_spark.operators.dedup import minhash_index_store

    spark = docs.sparkSession

    def step(batch_df: DataFrame, batch_id: int) -> None:
        unit = f"s{batch_id}"
        if unit in minhash_index_units(spark, store_dir):
            return  # replayed batch already fully applied (incl. its pairs)
        reg: list[DataFrame] = []
        b_bands, b_index = minhash_index_frames(
            batch_df.select(id_col, text_col), id_col, text_col,
            k=k, rows_per_band=rows_per_band, shingle_n=shingle_n,
            persist_registry=reg,
        )
        if minhash_index_units(spark, store_dir):
            base_bands, base_index = load_minhash_index(spark, store_dir)
        else:  # first batch bootstraps the store: probe only itself
            base_bands = spark.createDataFrame([], b_bands.schema)
            base_index = spark.createDataFrame([], b_index.schema)
        cand = incremental_candidate_pairs(b_bands, base_bands).localCheckpoint(
            eager=True
        )
        pairs = verify_incremental(cand, b_index, base_index, threshold=threshold)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        save_minhash_index(b_bands, b_index, store_dir, unit=unit)
        for df in reg:
            df.unpersist()
        store = minhash_index_store(spark, store_dir)
        if compact_every and len(store.units()) >= compact_every:
            store.vacuum(store.compact(store.fresh_unit("c")))

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
