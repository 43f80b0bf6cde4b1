"""Streaming exact-dup filtering: maintain the fingerprint store over a
document stream, emitting per-batch admit/reject decisions.

The exact-dup sibling of streaming/dedup_index.py, same exactly-once
recipe: decisions land in `{decisions_dir}/s<batch_id>` BEFORE the store
unit commits, a replayed batch recomputes against the pre-unit store
state, and a fully committed batch is skipped outright — so a crash at
any point replays into the identical end state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from carrot_transform_spark.operators.fingerprints import (
    _DATASET,
    admitted_fingerprints,
    decide_batch,
    fingerprint_store,
    load_existing,
)


def maintain_fingerprint_store(
    docs: DataFrame,
    store_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
):
    """Start (and return) the streaming query. Each micro-batch writes
    (id, fingerprint, dup_of) decisions to `{decisions_dir}/s<batch_id>`
    and commits admitted fingerprints as store unit `s<batch_id>`."""
    spark = docs.sparkSession

    def step(batch_df: DataFrame, batch_id: int) -> None:
        unit = f"s{batch_id}"
        store = fingerprint_store(spark, store_dir)
        units = store.units()
        if unit in units:
            return  # replayed batch already fully applied (incl. decisions)
        result = decide_batch(
            batch_df.select(id_col, text_col),
            load_existing(store, [u for u in units if u != unit]),
            id_col,
            text_col,
        )
        result.write.mode("overwrite").parquet(f"{decisions_dir}/{unit}")
        store.commit(unit, {_DATASET: admitted_fingerprints(result)})
        if compact_every and len(store.units()) >= compact_every:
            store.vacuum(store.compact(store.fresh_unit("c")))

    return (
        docs.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
