"""scan_splits: driver-side split estimation replacing the RDD probe."""

from carrot_transform_spark.sources.registry import (
    CsvDirSource,
    JdbcSource,
    ParquetDirSource,
    _max_partition_bytes,
)


def test_max_partition_bytes_parses_forms(spark):
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        for raw, want in [("128MB", 128 << 20), ("134217728b", 128 << 20),
                          ("1g", 1 << 30), ("64k", 64 << 10)]:
            spark.conf.set("spark.sql.files.maxPartitionBytes", raw)
            assert _max_partition_bytes(spark) == want, raw
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_csv_source_estimates_one_split_for_tiny_file(spark, tmp_path):
    (tmp_path / "t.csv").write_text("a,b\n1,2\n")
    src = CsvDirSource(spark, tmp_path)
    assert src.scan_splits("t") == 1
    assert src.scan_splits("missing") is None


def test_csv_source_estimates_many_splits_for_large_file(spark, tmp_path):
    (tmp_path / "big.csv").write_text("a,b\n" + "1,2\n" * 1000)
    src = CsvDirSource(spark, tmp_path)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
        n = src.scan_splits("big")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert n is not None and n >= 3  # ~4000 bytes / 1 KiB splits


def test_jdbc_source_split_hints(spark):
    assert JdbcSource(spark, "jdbc:derby:x").scan_splits("t") == 1
    # numPartitions ALONE now parallelizes the read: read() derives
    # partitionColumn+bounds from the table's first numeric column
    # (_derive_partitioning), so the honest split count is n
    assert JdbcSource(spark, "jdbc:derby:x", {"numPartitions": "8"}).scan_splits("t") == 8
    part = {"numPartitions": "8", "partitionColumn": "id", "lowerBound": "1", "upperBound": "100"}
    assert JdbcSource(spark, "jdbc:derby:x", part).scan_splits("t") == 8
    bogus = dict(part, numPartitions="bogus")
    assert JdbcSource(spark, "jdbc:derby:x", bogus).scan_splits("t") is None


def test_parquet_source_split_hint(spark):
    src = ParquetDirSource(spark, "/root/testdata/sf0.001")
    assert src.scan_splits("orders") == 1  # tiny file, one split
    assert src.scan_splits("nope") is None


def test_jsonl_source_sums_directory_part_files(spark, tmp_path):
    """A .jsonl DIRECTORY of part files must size by the sum of its files,
    not the directory inode's own few-KB stat."""
    from carrot_transform_spark.sources.registry import JsonlDirSource

    d = tmp_path / "t.jsonl"
    d.mkdir()
    for i in range(4):
        (d / f"part-{i}.jsonl").write_text('{"a": "1"}\n' * 100)
    src = JsonlDirSource(spark, tmp_path)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
        n = src.scan_splits("t")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert n is not None and n >= 4  # 4 x 1.1 KB of parts / 1 KiB splits


def test_csv_source_sums_extensionless_directory(spark, tmp_path):
    d = tmp_path / "t"
    d.mkdir()
    for i in range(3):
        (d / f"part-{i}.csv").write_text("a,b\n" + "1,2\n" * 300)
    src = CsvDirSource(spark, tmp_path)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024b")
        n = src.scan_splits("t")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert n is not None and n >= 3
