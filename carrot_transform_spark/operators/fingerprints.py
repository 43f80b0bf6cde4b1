"""Incremental EXACT-duplicate filtering: a persisted fingerprint store.

The md5-fingerprint twin of the incremental MinHash index
(operators/dedup.py): the store holds one (fingerprint, canonical_id) row
per distinct document text ever admitted; each new batch is
- deduped within itself (first id per fingerprint wins, deterministically),
- anti-joined against the store (16-byte keys — the join never touches
  text),
and only genuinely new fingerprints commit as a unit. Returned batch rows
carry `dup_of` (the canonical id, or null if admitted) so callers can
drop, count, or audit the rejects.

Cost per step: one shuffle of the batch's fingerprints + one join against
the store's fingerprint column — O(batch + store-index), never O(corpus
text). At 100 TB the store is sorted parquet of 16-byte keys; compaction
(UnitStore.compact) keeps the unit count flat.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.operators.unitstore import UnitStore

_DATASET = "fingerprints"


def fingerprint_store(spark: SparkSession, path: str) -> UnitStore:
    return UnitStore(spark, path, (_DATASET,))


def fingerprint(text_col: str) -> F.Column:
    """Canonical text fingerprint (md5 of lower/trimmed text) — the same
    rule exact_dedup_groups uses, so store semantics match the batch op."""
    return F.md5(F.lower(F.trim(text_col)))


def _batch_canonical(batch_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp, canon_id): each batch row with its fingerprint and the
    batch's canonical (min) id for that fingerprint."""
    fp = batch_df.select(
        F.col(id_col).alias("id"), fingerprint(text_col).alias("fp")
    )
    canon = fp.groupBy("fp").agg(F.min("id").alias("canon_id"))
    return fp.join(canon, "fp")


def decide_batch(
    batch_df: DataFrame, existing: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, fingerprint, dup_of) for every batch row against `existing`
    (the stored (fingerprint, canonical_id) set): dup_of null iff admitted.
    Eagerly checkpointed — safe to write/commit in any order afterwards."""
    cand = _batch_canonical(batch_df, id_col, text_col)
    joined = cand.join(
        existing.select(F.col("fingerprint").alias("fp"), "canonical_id"),
        "fp",
        "left",
    )
    return joined.select(
        "id",
        F.col("fp").alias("fingerprint"),
        F.coalesce(
            "canonical_id",  # already in the store -> dup of the stored canon
            F.when(F.col("id") != F.col("canon_id"), F.col("canon_id")),
        ).alias("dup_of"),
    ).localCheckpoint(eager=True)


def admitted_fingerprints(result: DataFrame) -> DataFrame:
    """The store rows a decision frame admits (dup_of null). The id keeps
    its source type — a hard cast('long') would turn string ids into NULL
    canonical ids and silently re-admit their duplicates forever."""
    return result.filter(F.col("dup_of").isNull()).select(
        "fingerprint", F.col("id").alias("canonical_id")
    )


def load_existing(
    store: UnitStore, units: list[str], batch_df: DataFrame, id_col: str
) -> DataFrame:
    """The stored (fingerprint, canonical_id) view; an empty store yields an
    empty frame whose canonical_id matches the batch's id type."""
    if units:
        return store.load(_DATASET, units)
    id_type = dict(batch_df.dtypes)[id_col]
    return store.spark.createDataFrame(
        [], f"fingerprint string, canonical_id {id_type}"
    )


def update_fingerprint_store(
    path: str,
    batch_df: DataFrame,
    id_col: str,
    text_col: str,
    unit: str | None = None,
) -> DataFrame:
    """One maintenance step: returns (id, fingerprint, dup_of) for every
    batch row — dup_of null iff the row was admitted — then commits the
    admitted fingerprints as a new unit. Checkpointed before the commit."""
    spark = batch_df.sparkSession
    store = fingerprint_store(spark, path)
    units = store.units()
    if unit is None:
        unit = store.fresh_unit()
    # replay safety: a re-run with the same unit name must see the store as
    # it was BEFORE its first run — otherwise every batch row matches its
    # own prior commit, admitted comes out empty, and the overwrite WIPES
    # the unit (caught by test_replay_unit_is_idempotent)
    units = [u for u in units if u != unit]
    result = decide_batch(
        batch_df, load_existing(store, units, batch_df, id_col), id_col, text_col
    )
    store.commit(unit, {_DATASET: admitted_fingerprints(result)})
    return result
