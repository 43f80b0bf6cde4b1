"""Streaming edit-distance index maintenance: keep the frozen-rank prefix
index current as strings arrive, emitting each micro-batch's new
Levenshtein pairs.

The string-metric member of the streaming maintainer family
(dedup_index.py: MinHash/SimHash; ann_index.py: IVF; fingerprint_index.py:
exact). foreachBatch (via the shared streaming/maintenance.py protocol)
drives the SAME frame-level operator the offline path uses
(operators/editjoin.edit_join_incremental): new-vs-store + new-vs-new
candidates from the frozen-rank prefixes, exact levenshtein verify on
candidates only, then the batch commits into the store as one versioned
unit. Invariant (tested): after any split of a corpus into micro-batches,
the union of per-step pair outputs equals the from-scratch full-corpus
edit_join — each pair is discovered exactly once, in the step where its
later member arrives.

The gram-frequency ranks are FROZEN by the bootstrap batch (see the
frozen-rank rationale in operators/editjoin.py — a live frequency order
would invalidate every stored prefix on every batch) and committed as the
first unit's ``ranks`` table; later units commit an empty ranks frame so
the store-wide union is always exactly the frozen table, and compaction
folds it unchanged.

Exactly-once, replay, and compaction semantics live in
streaming/maintenance.py; pairs are written before the unit commit.

At scale each step costs O(batch + prefix collisions): stored strings are
never re-indexed, and the only store rows touched are index rows sharing
a (tier, gram) key with the batch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from carrot_transform_spark.operators.editjoin import (
    DEFAULT_K,
    DEFAULT_Q,
    edit_gram_ranks,
    edit_join_incremental,
)
from carrot_transform_spark.streaming.maintenance import maintain_units

_STRINGS_SCHEMA = "s string"
_INDEX_SCHEMA = "s string, tier int, gram string"


def edit_index_store(spark, path: str):
    """The UnitStore backing a persisted edit-join index at `path`."""
    from carrot_transform_spark.operators.unitstore import UnitStore

    return UnitStore(spark, path, ("strings", "index", "ranks"))


def edit_index_units(spark, path: str) -> list[str]:
    return edit_index_store(spark, path).units()


def load_edit_index(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Reopen a saved index: (strings, index, frozen ranks) over all
    committed units."""
    store = edit_index_store(spark, path)
    units = store.units()
    return (
        store.load("strings", units),
        store.load("index", units),
        store.load("ranks", units),
    )


def editjoin_step(
    spark,
    pairs_dir: str,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
):
    """The per-batch step_fn (see streaming/maintenance.py): dedup the
    batch against the store, find+verify the new strings' pairs against
    the pre-unit store view, write pairs, commit the unit."""

    def step(batch_df: DataFrame, store, units: list[str], unit: str) -> None:
        batch = batch_df.select(F.col(s_col).alias("s")).distinct()
        if units:
            ranks = store.load("ranks", units)
            s_str = store.load("strings", units)
            s_idx = store.load("index", units)
            commit_ranks = spark.createDataFrame([], ranks.schema)
        else:  # bootstrap: freeze the ranks from the first batch
            ranks = edit_gram_ranks(batch, "s", k, q).persist()
            ranks.count()
            s_str = spark.createDataFrame([], _STRINGS_SCHEMA)
            s_idx = spark.createDataFrame([], _INDEX_SCHEMA)
            commit_ranks = ranks
        reg: list[DataFrame] = []
        pairs, nidx = edit_join_incremental(
            s_idx, s_str, batch, ranks, "s", k, q, persist_registry=reg
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/{unit}")
        store.commit(
            unit,
            {
                "strings": nidx.select("s").distinct(),
                "index": nidx,
                "ranks": commit_ranks,
            },
        )
        for df in reg:
            df.unpersist()
        if not units:
            ranks.unpersist()

    return step


def maintain_edit_index(
    strings: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    s_col: str = "s",
    k: int = DEFAULT_K,
    q: int = DEFAULT_Q,
    compact_every: int | None = None,
):
    """Start (and return) the streaming query maintaining the index.

    `strings` is a streaming DataFrame with a string column `s_col`. Each
    micro-batch appends one store unit `s<batch_id>` and one pairs dir
    `{pairs_dir}/s<batch_id>`; read all discovered pairs back with
    spark.read.parquet(f"{pairs_dir}/s*")."""
    spark = strings.sparkSession
    step = editjoin_step(spark, pairs_dir, s_col=s_col, k=k, q=q)
    return maintain_units(
        strings,
        checkpoint_dir,
        lambda: edit_index_store(spark, store_dir),
        step,
        compact_every=compact_every,
    )
