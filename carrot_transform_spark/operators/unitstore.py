"""Versioned-unit parquet store: the commit substrate for incrementally
maintained indexes (MinHash/LSH dedup index, IVF vector index).

Layout: ``{path}/{dataset}/u-{unit}/`` parquet dirs, one per (dataset,
unit). A unit is visible only when the FIRST dataset (the marker) carries
Spark's ``_SUCCESS``; commit() writes the marker last, so the marker's
_SUCCESS is the atomic commit point for the whole unit across datasets.
Consequences:

- a crash mid-commit leaves the unit invisible (reads see only whole
  units — never a mix of half-written part files, which plain
  ``mode("append")`` into a live directory cannot guarantee);
- re-running a commit with the same unit name overwrites the same dirs —
  the idempotent-replay property streaming maintainers key on;
- listing goes through the Hadoop FileSystem for the path's scheme, so
  file:// and object-store URLs behave identically.

At 100 TB each unit is one batch's output written by a normal distributed
Spark job; readers union committed unit dirs, so compaction is just
"rewrite k units as one and commit, then drop the old ones".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class UnitStore:
    def __init__(self, spark: SparkSession, path: str, datasets: tuple[str, ...]):
        if not datasets:
            raise ValueError("datasets must name at least one dataset")
        self.spark = spark
        self.path = path.rstrip("/")
        self.datasets = tuple(datasets)

    # -- listing ----------------------------------------------------------
    def units(self) -> list[str]:
        """Committed unit names (sorted), _SUCCESS-gated on the marker."""
        jvm = self.spark._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        marker_dir = f"{self.path}/{self.datasets[0]}"
        jpath = jvm.org.apache.hadoop.fs.Path(marker_dir)
        fs = jpath.getFileSystem(hconf)
        if not fs.exists(jpath):
            return []
        units = []
        for st in fs.listStatus(jpath):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.startswith("u-") and fs.exists(
                jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
            ):
                units.append(name[2:])
        return sorted(units)

    # -- writing ----------------------------------------------------------
    def commit(self, unit: str, frames: dict[str, DataFrame]) -> None:
        """Write one unit across all datasets; marker dataset last."""
        if set(frames) != set(self.datasets):
            raise ValueError(f"commit needs exactly {self.datasets}, got {sorted(frames)}")
        for name in self.datasets[1:]:
            frames[name].write.mode("overwrite").parquet(self._dir(name, unit))
        frames[self.datasets[0]].write.mode("overwrite").parquet(
            self._dir(self.datasets[0], unit)
        )

    # -- reading ----------------------------------------------------------
    def load(self, dataset: str, units: list[str] | None = None) -> DataFrame:
        """Union of the dataset over the given (default: all committed)
        units. Raises FileNotFoundError on an empty store."""
        if dataset not in self.datasets:
            raise ValueError(f"unknown dataset {dataset!r}; have {self.datasets}")
        units = self.units() if units is None else units
        if not units:
            raise FileNotFoundError(f"no committed units under {self.path}")
        return self.spark.read.parquet(*[self._dir(dataset, u) for u in units])

    def _dir(self, dataset: str, unit: str) -> str:
        return f"{self.path}/{dataset}/u-{unit}"
