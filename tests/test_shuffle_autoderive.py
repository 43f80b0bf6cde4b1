"""Auto-derived spark.sql.shuffle.partitions from input leaf-file stats.

VERDICT r9 task 5: sf1/sf10 sweeps needed hand-set SWEEP_SHUFFLE; the
derivation in session.derive_shuffle_partitions replaces that.  These tests
pin the sizing function itself (synthetic dirs, exact byte counts) and the
real-testdata floor case, so a scale jump never needs tuning again.
"""

from __future__ import annotations

import os
from pathlib import Path

from carrot_transform_spark.session import (
    DEFAULT_SHUFFLE_PARTITIONS,
    derive_shuffle_partitions,
)

MB = 1024 * 1024


def _sparse(p: Path, size: int) -> None:
    with open(p, "wb") as f:
        f.truncate(size)  # st_size without allocating blocks


def _mk(dirpath: Path, name: str, size: int, as_dir: bool = False) -> None:
    if as_dir:
        d = dirpath / f"{name}.parquet"
        d.mkdir()
        # two part files summing to `size`, like gen_sf_big's big layout
        _sparse(d / "part-0.parquet", size // 2)
        _sparse(d / "part-1.parquet", size - size // 2)
    else:
        _sparse(dirpath / f"{name}.parquet", size)


def test_small_input_clamps_to_floor(tmp_path):
    _mk(tmp_path, "lineitem", 21 * MB)
    assert derive_shuffle_partitions(str(tmp_path), floor=32) == 32


def test_sf10_scale_rounds_to_64(tmp_path):
    # ~2.1 GB of parquet / 32 MB target = 66 raw -> nearest pow2 is 64,
    # matching the hand-tuned SWEEP_SHUFFLE=64 the sf10 sweep used
    _mk(tmp_path, "lineitem", 2100 * MB)
    assert derive_shuffle_partitions(str(tmp_path), floor=32) == 64


def test_sf100_scale_with_directory_layout(tmp_path):
    # 16 GB split across directory-layout tables (gen_sf_big factor>=100)
    _mk(tmp_path, "lineitem", 8000 * MB, as_dir=True)
    _mk(tmp_path, "orders", 4000 * MB, as_dir=True)
    _mk(tmp_path, "events", 4000 * MB)
    assert derive_shuffle_partitions(str(tmp_path), floor=32) == 512


def test_non_power_of_two_floor_survives_rounding(tmp_path):
    # rounding to a power of two must never land BELOW the floor — a
    # 48-CPU machine with tiny input keeps 48 partitions, not 32
    _mk(tmp_path, "lineitem", 1 * MB)
    assert derive_shuffle_partitions(str(tmp_path), floor=48) == 48
    assert derive_shuffle_partitions(str(tmp_path), floor=24) == 24


def test_cap_at_2048(tmp_path):
    _mk(tmp_path, "lineitem", 500_000 * MB)  # ~500 GB sparse file
    assert derive_shuffle_partitions(str(tmp_path), floor=32) == 2048


def test_env_override_wins(tmp_path, monkeypatch):
    _mk(tmp_path, "lineitem", 2100 * MB)
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "7")
    assert derive_shuffle_partitions(str(tmp_path), floor=32) == 7


def test_missing_dir_falls_back_to_default(tmp_path):
    assert (
        derive_shuffle_partitions(str(tmp_path / "nope"), floor=32)
        == DEFAULT_SHUFFLE_PARTITIONS
    )


def test_real_testdata_floor():
    # the driver's sf0.1 bench dir is tiny -> derivation lands on the floor,
    # i.e. exactly what the hand-tuned runs used
    sf = "/root/testdata/sf0.1"
    if not os.path.isdir(sf):
        return
    assert derive_shuffle_partitions(sf, floor=32) == 32
