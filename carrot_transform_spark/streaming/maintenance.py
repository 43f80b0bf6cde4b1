"""The shared exactly-once protocol for UnitStore-backed streaming
maintainers (LSH dedup index, IVF vector index, fingerprint store).

One place holds the rules every maintainer must follow identically:

- unit name = s<batch_id>, deterministic across replays;
- the replay guard is store.applied(unit) — committed OR since compacted
  away — never a liveness check (a retired name would slip a replay
  through against a store containing the batch's own data, corrupt the
  recomputed output, and then die re-committing the retired name);
- step_fn sees the PRE-unit store view (its own unit excluded) and must
  write its query-able outputs BEFORE committing the unit, so a crash at
  any point replays into the identical end state;
- optional compaction runs AFTER the commit, folding the store whenever
  compact_every live units accumulate; immediate vacuum assumes this
  maintainer is the store's only reader between batches.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from carrot_transform_spark.operators.unitstore import UnitStore


def make_step(
    make_store: Callable[[], UnitStore],
    step_fn: Callable[[DataFrame, UnitStore, list[str], str], None],
    compact_every: int | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function implementing the protocol above — exposed
    so tests can drive replays deterministically without the streaming
    engine (Spark's checkpoint manager flags out-of-band commit-log edits
    as concurrent access, which makes crash simulation through the engine
    itself unreliable)."""

    def step(batch_df: DataFrame, batch_id: int) -> None:
        unit = f"s{batch_id}"
        store = make_store()
        if store.applied(unit):
            return  # replayed batch already fully applied (incl. outputs)
        step_fn(batch_df, store, [u for u in store.units() if u != unit], unit)
        if compact_every and len(store.units()) >= compact_every:
            store.vacuum(store.compact(store.fresh_unit("c")))

    return step


def maintain_units(
    stream: DataFrame,
    checkpoint_dir: str,
    make_store: Callable[[], UnitStore],
    step_fn: Callable[[DataFrame, UnitStore, list[str], str], None],
    compact_every: int | None = None,
):
    """Start (and return) a foreachBatch query running
    ``step_fn(batch_df, store, pre_unit_view, unit)`` per micro-batch under
    the protocol above."""
    return (
        stream.writeStream.foreachBatch(make_step(make_store, step_fn, compact_every))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
