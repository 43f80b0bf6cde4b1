"""Dense sequential ID assignment — scalable row numbering.

The reference assigns ids with mutable driver-side counters in write order
(run.py:126-132, person_helpers.py:129-151). On Spark a naive equivalent is
``row_number() over (ORDER BY ...)`` — correct, but a single-partition sort
at scale. ``with_dense_ids`` keeps dense 1..N semantics without one:

1. range-repartition on the order columns (data ends up globally ordered
   across partitions),
2. per-partition row_number (narrow window — partition-local sort only),
3. per-partition row counts collected to the driver (one tiny job),
   turned into cumulative offsets and joined back as a broadcast map.

Inputs are persisted before the range exchange because repartitionByRange
SAMPLES its child (an unpersisted expensive lineage would run ~3x). Small
inputs (< ``small_threshold`` rows, known after the materialization count)
take a fast path — a plain global-order window over one partition — saving
the sampling pass and the per-partition bookkeeping; at real scale the
range path engages automatically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window

_PID = "__ctspark_pid"

SMALL_THRESHOLD = 2_000_000


def with_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str,
    offset: int = 0,
    num_partitions: int | None = None,
    small_threshold: int = SMALL_THRESHOLD,
    persist_registry: list[DataFrame] | None = None,
    size_bound: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = offset + dense rank 1..N in (order_cols) order.

    persist_registry: optional list the caller owns; every DataFrame this
    function leaves persisted is appended so the caller can unpersist after
    the result is materialized (otherwise caches live until LRU eviction).

    size_bound: caller-supplied UPPER bound on df's row count (e.g. from
    parquet footer metadata). When it fits the small path, the persist +
    count pass that normally sizes the path is skipped entirely and the
    window goes straight into the plan — one pass over the data instead of
    two. An over-estimate is safe (worst case: a single-partition sort of a
    larger-than-ideal input); correctness never depends on it.
    """
    if size_bound is not None and size_bound <= small_threshold:
        w = Window.orderBy(*order_cols)
        return df.withColumn(id_col, (F.row_number().over(w) + F.lit(offset)).cast("long"))

    src = df.persist(StorageLevel.MEMORY_AND_DISK)
    n_rows = src.count()  # materializes the cache; also sizes the fast path

    if n_rows <= small_threshold:
        # one global window; a single sort of a cached small dataset is
        # cheaper than sampling + range exchange + offset bookkeeping
        if persist_registry is not None:
            persist_registry.append(src)
        w = Window.orderBy(*order_cols)
        return src.withColumn(id_col, (F.row_number().over(w) + F.lit(offset)).cast("long"))

    n_parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    ranged = (
        src.repartitionByRange(int(n_parts), *[F.col(c) for c in order_cols])
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = ranged.groupBy(_PID).count().orderBy(_PID).collect()
    src.unpersist()  # ranged is materialized by the count job above
    if persist_registry is not None:
        persist_registry.append(ranged)
    offsets: dict[int, int] = {}
    acc = offset
    for row in counts:
        offsets[row[_PID]] = acc
        acc += row["count"]
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col(_PID),
    ) if offsets else F.lit(offset)
    out = (
        ranged.withColumn(id_col, (F.row_number().over(w) + offset_expr).cast("long"))
        .drop(_PID)
    )
    return out
