"""Streaming exact-dup filtering: maintain the fingerprint store over a
document stream, emitting per-batch admit/reject decisions.

The exact-dup sibling of streaming/dedup_index.py on the shared protocol
(streaming/maintenance.py): decisions land in `{decisions_dir}/s<batch_id>`
BEFORE the store unit commits, a replayed batch recomputes against the
pre-unit store state, and an applied batch (committed or since compacted)
is skipped outright — so a crash at any point replays into the identical
end state.
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
from carrot_transform_spark.streaming.maintenance import maintain_units


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

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        batch = batch_df.select(id_col, text_col)
        result = decide_batch(batch, load_existing(store, units, batch, id_col), id_col, text_col)
        result.write.mode("overwrite").parquet(f"{decisions_dir}/{unit}")
        store.commit(unit, {_DATASET: admitted_fingerprints(result)})

    return maintain_units(
        docs,
        checkpoint_dir,
        lambda: fingerprint_store(spark, store_dir),
        step,
        compact_every=compact_every,
    )
