"""Mergeable KLL quantile sketches (Karnin-Lang-Liberty, FOCS 2016).

The third sketch shape a 100 TB pipeline maintains incrementally, next to
"how many distinct" (operators/cardinality.py, HLL) and "how often"
(operators/freqitems.py, CMS): "what does the distribution look like".
Spark's built-in `approx_percentile` answers a one-shot query but its
sketch is not exposed — it cannot be persisted, merged across days, or
maintained by a stream. This module makes rank/quantile estimation a
first-class incremental operator: per-key sketches are O(k log(n/k))
doubles regardless of corpus size, and sketches built over ANY
partitioning of the data merge into one whose rank estimates carry the
same O(1/k) error bound (compaction error is additive over merges exactly
as over inserts).

Design (idiomatic Spark, no driver-sized collects):

* ``kll_build``: one mapInPandas pass — each task streams its Arrow
  batches through a dict of per-key compactor stacks (bounded memory:
  |keys| x sketch size per task) and emits its partial sketches as plain
  rows (key, level, items, n). The shuffle carries sketch rows, never
  values.
* ``kll_merge_partials``: groupBy(key).applyInPandas over those rows —
  per key the group is (#partials x #levels) tiny rows; level-wise
  concatenation + recompaction is the KLL merge.
* ``kll_quantiles``: rank queries on the merged rows (weight of a level-h
  item is 2^h; answer = smallest item whose cumulative weight reaches
  q * W).
* ``kll_rank_check``: the verification shape used by the oracle-twinned
  sub-check — broadcast-join the (tiny) estimates back against the data
  and compute each estimate's EXACT rank in one aggregation; a flag pins
  |exact_rank/n - q| <= eps. A broken sketch errs far beyond any eps the
  flag allows, and the exact anchors (counts, min/max) are value-hashed.

Determinism: compaction "coin flips" alternate per compactor (the
deterministic variant of KLL; Karnin et al. §2.2 note randomness is only
needed against adversarial orders). Given the same input partitioning the
whole pipeline is bit-reproducible, which the tests pin.

No reference counterpart (the reference has no sketching); streaming
maintenance lives in streaming/quantiles.py.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_K = 200  # rank error ~2.3%/sqrt within whp bounds; ~1-2 KB/key
_CAP_DECAY = 2.0 / 3.0

SKETCH_SCHEMA = "key string, level int, items array<double>, n long"


class KLL:
    """A single KLL compactor stack over float64 values."""

    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = DEFAULT_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._coin = 0

    # -- capacities -----------------------------------------------------
    def _cap(self, h: int) -> int:
        # top level holds k items; capacities decay geometrically below
        top = len(self.levels) - 1
        return max(2, int(math.ceil(self.k * (_CAP_DECAY ** (top - h)))))

    # -- updates --------------------------------------------------------
    def update(self, values: np.ndarray | Sequence[float]) -> None:
        arr = np.asarray(values, dtype=np.float64)
        arr = arr[~np.isnan(arr)]
        if arr.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], arr])
        self.n += int(arr.size)
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) < self._cap(h):
                h += 1
                continue
            buf = np.sort(self.levels[h])
            m2 = len(buf) - (len(buf) & 1)
            off = self._coin & 1
            self._coin += 1
            promoted = buf[off:m2:2]
            self.levels[h] = buf[m2:]  # odd leftover stays at level h
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            # capacities depend on the top level: restart from the bottom
            h = 0

    # -- merge ----------------------------------------------------------
    def merge(self, other: "KLL") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, items in enumerate(other.levels):
            if items.size:
                self.levels[h] = np.concatenate([self.levels[h], items])
        self.n += other.n
        self._compress()

    # -- queries --------------------------------------------------------
    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items = [lvl for lvl in self.levels if lvl.size]
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        w = [np.full(lvl.size, 1 << h, dtype=np.int64)
             for h, lvl in enumerate(self.levels) if lvl.size]
        vals = np.concatenate(items)
        wts = np.concatenate(w)
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        vals, wts = self._weighted()
        if vals.size == 0:
            return float("nan")
        cum = np.cumsum(wts)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(vals[min(idx, vals.size - 1)])

    def quantiles(self, qs: Iterable[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- (de)serialisation ----------------------------------------------
    def to_rows(self, key: str) -> list[tuple[str, int, list[float], int]]:
        """One row per level; level 0 is always present and carries n
        (higher levels carry 0) so merged totals are a plain SUM."""
        rows = [(key, 0, [float(x) for x in self.levels[0]], self.n)]
        for h in range(1, len(self.levels)):
            if self.levels[h].size:
                rows.append((key, h, [float(x) for x in self.levels[h]], 0))
        return rows

    @classmethod
    def from_level_rows(
        cls, rows: Iterable[tuple[int, Sequence[float], int]], k: int
    ) -> "KLL":
        """Rebuild + merge from any bag of (level, items, n) rows (several
        partials' rows may be interleaved — concatenation per level IS the
        merge, followed by one recompaction)."""
        sk = cls(k)
        n = 0
        for level, items, part_n in rows:
            level = int(level)
            while len(sk.levels) <= level:
                sk.levels.append(np.empty(0, dtype=np.float64))
            arr = np.asarray(list(items), dtype=np.float64)
            if arr.size:
                sk.levels[level] = np.concatenate([sk.levels[level], arr])
            n += int(part_n)
        sk.n = n
        sk._compress()
        return sk


# ---------------------------------------------------------------------------
# Spark-side operators
# ---------------------------------------------------------------------------


def kll_build(
    df: DataFrame,
    val_col: str,
    key_col: str | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Per-task partial sketches: (key, level, items, n) rows.

    One mapInPandas pass; each task's memory is |keys| x sketch size. With
    key_col=None a single global sketch is built under key '_all'.
    """
    key = F.col(key_col) if key_col else F.lit("_all")
    src = df.select(
        key.cast("string").alias("key"),
        F.col(val_col).cast("double").alias("v"),
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[str, KLL] = {}
        for pdf in batches:
            for key_val, grp in pdf.groupby("key", sort=False, dropna=False):
                state.setdefault(key_val, KLL(k)).update(grp["v"].to_numpy())
        rows = [r for key_val, sk in state.items() for r in sk.to_rows(key_val)]
        yield pd.DataFrame(rows, columns=["key", "level", "items", "n"])

    return src.mapInPandas(build, SKETCH_SCHEMA)


def kll_merge_partials(partials: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Merge partial-sketch rows into ONE sketch per key (the KLL merge:
    level-wise concatenation + recompaction). The per-key group is sketch
    rows only — tiny regardless of data volume."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLL.from_level_rows(
            zip(pdf["level"], pdf["items"], pdf["n"]), k
        )
        return pd.DataFrame(
            sk.to_rows(pdf["key"].iloc[0]), columns=["key", "level", "items", "n"]
        )

    return partials.groupBy("key").applyInPandas(merge, SKETCH_SCHEMA)


def kll_sketch(
    df: DataFrame,
    val_col: str,
    key_col: str | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Build + merge: one (key, level, items, n) sketch per key."""
    return kll_merge_partials(kll_build(df, val_col, key_col, k), k)


def kll_quantiles(
    sketches: DataFrame, qs: Sequence[float], k: int = DEFAULT_K
) -> DataFrame:
    """(key, q, est, n) rank estimates from merged sketch rows."""
    qlist = [float(q) for q in qs]

    def query(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = KLL.from_level_rows(zip(pdf["level"], pdf["items"], pdf["n"]), k)
        key_val = pdf["key"].iloc[0]
        return pd.DataFrame(
            [(key_val, q, sk.quantile(q), sk.n) for q in qlist],
            columns=["key", "q", "est", "n"],
        )

    return sketches.groupBy("key").applyInPandas(
        query, "key string, q double, est double, n long"
    )


def kll_rank_check(
    df: DataFrame,
    val_col: str,
    estimates: DataFrame,
    eps: float,
    key_col: str | None = None,
) -> DataFrame:
    """(key, q, n_rows, in_bound): each estimate's EXACT rank, computed in
    one aggregation over the data joined with the broadcast estimates —
    in_bound pins |rank/n - q| <= eps, with +1/n slack ONLY when
    n < 1/eps. The 1/n term absorbs exact-rank granularity: a key with
    fewer than ~1/eps rows cannot place ANY value within eps of q (rank
    steps by 1/n > eps), so the plain bound would flag a perfect sketch
    on small or skewed keys — but granting that slack to LARGE keys would
    weaken the gate (an estimate one exact rank outside eps would pass),
    so it is gated on the granularity regime it was added for."""
    key = F.col(key_col) if key_col else F.lit("_all")
    src = df.select(
        key.cast("string").alias("key"),
        F.col(val_col).cast("double").alias("v"),
    )
    j = src.join(F.broadcast(estimates), "key")
    return (
        j.groupBy("key", "q")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v") <= F.col("est"), 1).otherwise(0)).alias("rank"),
        )
        .select(
            "key",
            "q",
            "n_rows",
            (
                F.abs(F.col("rank") / F.col("n_rows") - F.col("q"))
                <= F.lit(eps)
                + F.when(
                    F.col("n_rows") < F.lit(1.0 / eps),
                    F.lit(1.0) / F.col("n_rows"),
                ).otherwise(F.lit(0.0))
            ).alias("in_bound"),
        )
    )
