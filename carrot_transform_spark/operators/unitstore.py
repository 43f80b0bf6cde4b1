"""Versioned-unit parquet store: the commit substrate for incrementally
maintained indexes (MinHash/LSH dedup index, IVF vector index).

Layout: ``{path}/{dataset}/u-{unit}/`` parquet dirs, one per (dataset,
unit), plus two tiny store-owned files per unit under the FIRST dataset
(the marker):

- ``_COMMIT``   — written last; its existence is the atomic commit point
  for the whole unit across datasets.
- ``_COMPACTS`` — optional, written before _COMMIT; names older units this
  unit replaces. units() excludes any unit named by a committed compactor,
  so the instant a compacted unit commits, its inputs vanish from every
  listing — readers can never double-count. Old dirs become garbage,
  reclaimed by vacuum() at leisure.
- ``_meta-*`` — optional caller-owned sidecar files (e.g. the PQ
  codebooks a retrain encoded its unit under), written before _COMMIT so
  they switch atomically WITH the unit's data, and carried forward by
  compact() so folding units never orphans the metadata from the codes
  it describes.

Consequences:

- a crash mid-commit leaves the unit invisible (reads see only whole
  units — never a mix of half-written part files, which plain
  ``mode("append")`` into a live directory cannot guarantee);
- re-running a commit with the same unit name overwrites the same dirs —
  the idempotent-replay property streaming maintainers key on;
- compaction (rewrite k units as one, commit with compacts=[...]) is
  atomic and can run concurrently with readers; only vacuum() needs the
  compacted unit to be committed first, which it checks;
- listing goes through the Hadoop FileSystem for the path's scheme, so
  file:// and object-store URLs behave identically.

At 100 TB each unit is one batch's output written by a normal distributed
Spark job; readers union committed unit dirs, so small-file pressure is a
compact() call away without stopping ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_COMMIT = "_COMMIT"
_COMPACTS = "_COMPACTS"


class UnitStore:
    def __init__(self, spark: SparkSession, path: str, datasets: tuple[str, ...]):
        if not datasets:
            raise ValueError("datasets must name at least one dataset")
        self.spark = spark
        self.path = path.rstrip("/")
        self.datasets = tuple(datasets)

    # -- filesystem plumbing ----------------------------------------------
    def _fs(self):
        jvm = self.spark._jvm
        hconf = self.spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        return jpath.getFileSystem(hconf), jvm

    def _jp(self, jvm, *parts: str):
        return jvm.org.apache.hadoop.fs.Path("/".join((self.path,) + parts))

    def _write_file(self, rel_parts: tuple[str, ...], body: str) -> None:
        fs, jvm = self._fs()
        out = fs.create(self._jp(jvm, *rel_parts), True)
        try:
            out.write(body.encode("utf-8"))
        finally:
            out.close()

    def _read_file(self, fs, jvm, rel_parts: tuple[str, ...]) -> str:
        # commons-io rides on Spark's classpath; py4j can't mutate a Python
        # bytearray through InputStream.read(byte[]), so read JVM-side
        inp = fs.open(self._jp(jvm, *rel_parts))
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(inp, "UTF-8")
        finally:
            inp.close()

    # -- listing ----------------------------------------------------------
    def _scan(self) -> tuple[list[str], set[str], set[str]]:
        """(committed units, compacted-away names, every u-* dir name)."""
        fs, jvm = self._fs()
        marker_dir = self._jp(jvm, self.datasets[0])
        if not fs.exists(marker_dir):
            return [], set(), set()
        committed: list[str] = []
        replaced: set[str] = set()
        on_disk: set[str] = set()
        for st in fs.listStatus(marker_dir):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if not name.startswith("u-"):
                continue
            unit = name[2:]
            on_disk.add(unit)
            if not fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), _COMMIT)):
                continue
            committed.append(unit)
            cpath = jvm.org.apache.hadoop.fs.Path(st.getPath(), _COMPACTS)
            if fs.exists(cpath):
                body = self._read_file(fs, jvm, (self.datasets[0], name, _COMPACTS))
                replaced.update(u for u in body.split("\n") if u)
        return committed, replaced, on_disk

    def units(self) -> list[str]:
        """Committed, not-compacted-away unit names (sorted)."""
        committed, replaced, _ = self._scan()
        return sorted(u for u in committed if u not in replaced)

    def applied(self, unit: str) -> bool:
        """True if `unit` was ever fully committed — live OR since folded
        into a compactor. Replay guards must use this, not `units()`:
        after an in-flight compaction retires a batch's unit name, a
        liveness check misses, the replay recomputes against a store that
        already contains the batch's own data (corrupt output), and the
        re-commit of the retired name raises — killing the stream on every
        restart."""
        committed, replaced, _ = self._scan()
        return unit in replaced or unit in committed

    def fresh_unit(self, prefix: str = "b") -> str:
        """A unit name never used in this store — compacted-away names are
        permanently retired (a committed _COMPACTS hides them forever), so
        auto-naming must skip every name on disk, live or not."""
        _, replaced, on_disk = self._scan()
        taken = replaced | on_disk
        n = 0
        while f"{prefix}{n}" in taken:
            n += 1
        return f"{prefix}{n}"

    # -- writing ----------------------------------------------------------
    def commit(
        self,
        unit: str,
        frames: dict[str, DataFrame],
        compacts: list[str] | None = None,
        partition_by: dict[str, list[str]] | None = None,
        sidecar_files: dict[str, str] | None = None,
    ) -> None:
        """Write one unit across all datasets and commit it atomically.
        `compacts` names older units this unit replaces — they disappear
        from listings the instant this commit lands. `partition_by` maps a
        dataset name to hive-partition columns for its write: readers get
        the column back through partition discovery, and filters/joins on
        it prune to matching subdirs (static PartitionFilters or dynamic
        partition pruning) — the file-level locality lever for probe-heavy
        datasets like an IVF corpus partitioned by cell. `sidecar_files`
        maps ``_meta-*`` names to bodies written into the marker-dataset
        unit dir before _COMMIT, so unit-scoped metadata (PQ codebooks, …)
        becomes visible atomically with the data it describes."""
        for name in sidecar_files or ():
            if not name.startswith("_meta-"):
                raise ValueError(f"sidecar files must be named _meta-*, got {name!r}")
        if set(frames) != set(self.datasets):
            raise ValueError(f"commit needs exactly {self.datasets}, got {sorted(frames)}")
        _, replaced, _ = self._scan()
        if unit in replaced:
            raise ValueError(
                f"unit name {unit!r} was compacted away and is retired; "
                "use fresh_unit() for auto-naming"
            )
        # Offline RE-commit of an already-committed unit (idempotent replay
        # after a bad batch, a manual repair, ...): retract the commit point
        # BEFORE touching any dataset dir. The marker dataset is rewritten
        # last, so without this a crash mid-rewrite leaves the old _COMMIT
        # in place over half-overwritten secondary datasets — a unit that
        # LISTS as committed but isn't whole. With the marker gone first,
        # any crash leaves the unit invisible and the next replay self-heals.
        fs, jvm = self._fs()
        marker = self._jp(jvm, self.datasets[0], f"u-{unit}", _COMMIT)
        if fs.exists(marker):
            fs.delete(marker, False)

        def write(name: str) -> None:
            w = frames[name].write.mode("overwrite")
            cols = (partition_by or {}).get(name)
            if cols:
                w = w.partitionBy(*cols)
            w.parquet(self._dir(name, unit))

        for name in self.datasets[1:]:
            write(name)
        write(self.datasets[0])
        if compacts:
            self._write_file(
                (self.datasets[0], f"u-{unit}", _COMPACTS), "\n".join(compacts)
            )
        for name, body in (sidecar_files or {}).items():
            self._write_file((self.datasets[0], f"u-{unit}", name), body)
        self._write_file((self.datasets[0], f"u-{unit}", _COMMIT), "")

    def sidecars(self, unit: str) -> dict[str, str]:
        """The unit's ``_meta-*`` sidecar files as {name: body}."""
        fs, jvm = self._fs()
        udir = self._jp(jvm, self.datasets[0], f"u-{unit}")
        out: dict[str, str] = {}
        if not fs.exists(udir):
            return out
        for st in fs.listStatus(udir):
            name = st.getPath().getName()
            if st.isFile() and name.startswith("_meta-"):
                out[name] = self._read_file(
                    fs, jvm, (self.datasets[0], f"u-{unit}", name)
                )
        return out

    def compact(
        self,
        unit: str,
        units: list[str] | None = None,
        partition_by: dict[str, list[str]] | None = None,
        frames: dict[str, DataFrame] | None = None,
        sidecar_files: dict[str, str] | None = None,
    ) -> list[str]:
        """Rewrite the given (default: all live) units as ONE unit named
        `unit` and commit it atomically over them. Returns the replaced
        unit names (pass to vacuum() to reclaim their dirs). partition_by
        re-clusters datasets during the rewrite — compaction is exactly
        when restoring physical locality is cheap.

        `frames` substitutes a dataset's content during the fold (the
        retrain hook: re-encode the corpus under new codebooks in the
        same atomic replace-everything transition); datasets not named
        keep the plain union of the inputs. `sidecar_files` attaches
        ``_meta-*`` metadata to the new unit; input units' sidecars are
        carried forward automatically (explicit names win) so a routine
        compaction never orphans metadata from the data it describes."""
        src = self.units() if units is None else units
        if not src:
            raise FileNotFoundError(f"nothing to compact under {self.path}")
        if unit in src:
            raise ValueError(f"compacted unit name {unit!r} collides with an input")
        carried: dict[str, str] = {}
        for u in sorted(src):  # later units win on (unexpected) collisions
            carried.update(self.sidecars(u))
        carried.update(sidecar_files or {})
        # retirement must be TRANSITIVE: if an input is itself a compactor,
        # carry the names it retired into the new unit's _COMPACTS. Without
        # this, vacuuming the input deletes its _COMPACTS and applied()
        # forgets its grandchildren — a replayed grandchild batch would then
        # pass the guard and recommit over a store containing its own data.
        # Inductively complete: every live compactor carries its full set.
        fs, jvm = self._fs()
        closure = set(src)
        for u in src:
            cpath = self._jp(jvm, self.datasets[0], f"u-{u}", _COMPACTS)
            if fs.exists(cpath):
                body = self._read_file(fs, jvm, (self.datasets[0], f"u-{u}", _COMPACTS))
                closure.update(n for n in body.split("\n") if n)
        self.commit(
            unit,
            {
                name: frames[name]
                if frames is not None and name in frames
                else self.load(name, src)
                for name in self.datasets
            },
            compacts=sorted(closure),
            partition_by=partition_by,
            sidecar_files=carried or None,
        )
        return src

    def vacuum(self, replaced: list[str]) -> None:
        """Delete the dirs of units that a COMMITTED compactor replaced.
        Safe any time after the compacting commit; refuses live units."""
        live = set(self.units())
        bad = live.intersection(replaced)
        if bad:
            raise ValueError(f"refusing to vacuum live units: {sorted(bad)}")
        fs, jvm = self._fs()
        for u in replaced:
            for name in self.datasets:
                p = self._jp(jvm, name, f"u-{u}")
                if fs.exists(p):
                    fs.delete(p, True)

    # -- reading ----------------------------------------------------------
    def load(self, dataset: str, units: list[str] | None = None) -> DataFrame:
        """Union of the dataset over the given (default: all live) units.
        Raises FileNotFoundError on an empty store."""
        if dataset not in self.datasets:
            raise ValueError(f"unknown dataset {dataset!r}; have {self.datasets}")
        units = self.units() if units is None else units
        if not units:
            raise FileNotFoundError(f"no committed units under {self.path}")
        # one read per unit dir, unioned by NAME: units written with
        # different partition_by layouts (a cell-partitioned compacted unit
        # next to flat streamed ones) discover their partition columns
        # independently — a single multi-path read would look for one
        # common partition structure and lose the dir-encoded columns
        frames = [self.spark.read.parquet(self._dir(dataset, u)) for u in units]
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def _dir(self, dataset: str, unit: str) -> str:
        return f"{self.path}/{dataset}/u-{unit}"
