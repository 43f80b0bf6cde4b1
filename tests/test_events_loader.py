"""Loader contract: load(..., "events") always yields ts: timestamp.

The driver's testdata has shipped `ts` in different physical encodings
across rounds (TIMESTAMP(NANOS) -> timestamp[us]); a loader assuming one
encoding zeroed an entire round. This pins the contract for every encoding
the testdata has used or could plausibly use:

  - timestamp[ns] (no tz)  -> Spark needs nanosAsLong; truncate to micros
  - timestamp[us] (no tz)  -> Spark reads TIMESTAMP_NTZ; cast to timestamp
  - timestamp[us] UTC-adjusted -> Spark reads TIMESTAMP; passthrough
  - int64 nanos (pre-flattened) -> same truncation as the [ns] case

All four must come back as `timestamp` with identical micro values, and an
events read must not leave session confs mutated.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from carrot_transform_spark.queries import load

EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_789]
EXPECTED = [
    datetime.datetime(2023, 11, 14, 22, 13, 20),
    datetime.datetime(2023, 11, 14, 22, 15, 23, 456789),
]


def _write_events(tmp_path, name, ts_array):
    d = tmp_path / name
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"a":1}', '{"b":2}']),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


ENCODINGS = {
    "nanos": pa.array([us * 1000 for us in EPOCH_US], pa.timestamp("ns")),
    "micros_ntz": pa.array(EPOCH_US, pa.timestamp("us")),
    "micros_utc": pa.array(EPOCH_US, pa.timestamp("us", tz="UTC")),
    "int64_nanos": None,  # handled below: plain int64 column of epoch-nanos
}


@pytest.mark.parametrize("enc", list(ENCODINGS))
def test_ts_normalized_to_timestamp(spark, tmp_path, enc):
    arr = ENCODINGS[enc]
    if arr is None:
        arr = pa.array([us * 1000 for us in EPOCH_US], pa.int64())
    sf_dir = _write_events(tmp_path, enc, arr)

    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{enc}: got {dict(df.dtypes)['ts']}"
    got = [r.ts for r in df.orderBy("event_id").select("ts").collect()]
    assert got == EXPECTED, f"{enc}: {got}"


def test_load_does_not_leak_session_conf(spark, tmp_path):
    # Non-nanos reads must not touch nanosAsLong. (Two documented
    # exceptions exist: the nanos branch sets nanosAsLong because the scan
    # consults it at execution time and it only affects otherwise-unreadable
    # TIMESTAMP(NANOS) columns; and load() pins inferTimestampNTZ=false,
    # the engine-wide temporal contract also set by session.py.)
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key, None)
    sf_dir = _write_events(tmp_path, "leak", ENCODINGS["micros_ntz"])
    load(spark, sf_dir, "events").collect()
    assert spark.conf.get(key, None) == before
    assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"


def test_real_testdata_contract(spark):
    df = load(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.limit(1).count() == 1


def test_orders_lineitem_temporal_contract(spark):
    # the same drift exposure exists for the other timestamp-bearing
    # tables; load() normalizes them too
    for table, col in [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        df = load(spark, "/root/testdata/sf0.001", table)
        assert dict(df.dtypes)[col] == "timestamp", table


def test_undeclared_nanos_column_fails_loudly(spark, tmp_path):
    """Once a nanos retry has set nanosAsLong session-wide, a later table
    with a TIMESTAMP(NANOS) column NOT declared in _TEMPORAL_COLS would
    silently read as bigint epoch-nanos; load() must refuse instead."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        sf_dir = _write_events(tmp_path, "n1", ENCODINGS["nanos"])
        load(spark, sf_dir, "events").collect()
        assert spark.conf.get(key) == "true"

        d = tmp_path / "docs"
        d.mkdir()
        table = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "created": pa.array([EPOCH_US[0] * 1000], pa.timestamp("ns")),
            }
        )
        pq.write_table(table, str(d / "documents.parquet"))
        with pytest.raises(RuntimeError, match="_TEMPORAL_COLS"):
            load(spark, str(d), "documents")
    finally:
        spark.conf.unset(key)
