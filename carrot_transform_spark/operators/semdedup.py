"""Semantic deduplication over embedding columns (SemDeDup-style).

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication") prunes a corpus by clustering
embeddings coarsely, finding high-cosine pairs WITHIN each cluster, and
keeping one representative per duplicate group. This module composes it
from the engine's existing primitives:

  1. coarse blocking  — a given cell column, or ``assign_cells`` over
     literal centroids (operators/similarity.py);
  2. candidate pairs  — ``neardup_pairs``: within-cell cosine >= threshold
     (never doc x doc across cells — the 100 TB guarantee);
  3. grouping         — ``connected_components`` (min-label propagation;
     ``connected_components_star`` for adversarial diameters);
  4. keep-list        — min-id per component is kept, the rest are marked
     as drops with their canonical representative.

Scale posture: the only row-multiplying stage is the within-cell pair join,
bounded by the largest cell (choose k so cells stay ~1/k of the corpus; at
100 TB the corpus is written bucketed by cell so the join is co-located).
The component loop shuffles only (id, label) rows. Nothing here is
quadratic in the corpus.

The reference engine (Health-Informatics-UoN/carrot-transform) has no
embedding operators; this is part of the beyond-parity LLM-pipeline family
the project brief calls for.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from carrot_transform_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)
from carrot_transform_spark.operators.similarity import (
    assign_cells,
    neardup_pairs,
    neardup_pairs_multiprobe,
)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    centroids: list[list[float]] | None = None,
    threshold: float = 0.9,
    star: bool = False,
    max_cell_size: int | None | str = "auto",
    n_probe: int = 1,
) -> DataFrame:
    """(id, component_id, keep) for every row of ``df``.

    ``keep`` = 1 for the minimum-id member of each near-duplicate group
    (singletons keep themselves); ``component_id`` is the canonical
    representative a dropped row duplicates. Exactly one row per input row,
    so ``filter(keep = 1)`` IS the deduplicated corpus and the drops carry
    their provenance.

    Blocking comes from ``cell_col`` if given, else from nearest-centroid
    assignment over ``centroids``. With centroids, ``n_probe`` > 1 switches
    the pair stage to multi-probe blocking
    (similarity.neardup_pairs_multiprobe): near-dups that straddle a cell
    boundary — invisible to single-cell blocking by construction — are
    found when either member probes the other's primary cell, at
    ~n_probe x the candidate volume (never all-pairs). ``star=True`` swaps
    the component step to the large-star/small-star variant (O(log n)
    rounds on any diameter). ``max_cell_size`` bounds the within-cell pair
    join at cap^2 per cell (similarity._cap_cell): a degenerate cell pairs
    only its cap deterministic representatives, the remainder survive as
    singletons; cells at or under the bound behave exactly as uncapped.
    """
    if cell_col is None:
        if centroids is None:
            raise ValueError("semantic_dedup needs cell_col or centroids")
        if n_probe > 1:
            pairs = neardup_pairs_multiprobe(
                df,
                centroids,
                n_probe=n_probe,
                id_col=id_col,
                vec_col=vec_col,
                threshold=threshold,
                max_cell_size=max_cell_size,
            )
            return _keep_list(df, id_col, pairs, star)
        cells = assign_cells(df, centroids, id_col, vec_col).withColumnRenamed(
            "id", "__cid"
        )
        blocked = df.join(cells, F.col(id_col) == F.col("__cid")).drop("__cid")
        cell_col = "cell"
    else:
        if n_probe > 1:
            raise ValueError("n_probe > 1 requires centroids (probe ranking)")
        blocked = df

    pairs = neardup_pairs(
        blocked,
        cell_col,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        max_cell_size=max_cell_size,
    )
    return _keep_list(df, id_col, pairs, star)


def _keep_list(df: DataFrame, id_col: str, pairs: DataFrame, star: bool) -> DataFrame:
    """pairs -> components -> one (id, component_id, keep) row per input."""
    cc = connected_components_star if star else connected_components
    comps = cc(pairs, id_a="id_a", id_b="id_b")

    ids = df.select(F.col(id_col).alias("id"))
    out = ids.join(comps, "id", "left").select(
        "id", F.coalesce("component_id", F.col("id")).alias("component_id")
    )
    return out.withColumn(
        "keep", (F.col("component_id") == F.col("id")).cast("int")
    )
