"""Stateful streaming sessionization vs the batch sessionizer.

Feeds the events table through applyInPandasWithState in event-time order
(two chronological micro-batch files) and checks the CLOSED sessions agree
with the batch lag+running-sum sessionization for every user whose final
session also closed (i.e. all but sessions still open at end-of-stream,
which only flush on a later watermark tick).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from carrot_transform_spark.queries import all_queries, load
from carrot_transform_spark.streaming import events as sev
from carrot_transform_spark.streaming.sessions import sessionize_stream


@pytest.fixture(scope="module")
def chrono_files(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sess_stream")
    batch = load(spark, sf_dir, "events")
    # two chronological halves -> watermark advances between micro-batches
    mid = batch.selectExpr("percentile(cast(ts as long), 0.5) p").collect()[0]["p"]
    batch.filter(F.col("ts").cast("long") <= mid).coalesce(1).write.parquet(str(d / "b0"))
    batch.filter(F.col("ts").cast("long") > mid).coalesce(1).write.parquet(str(d / "b1"))
    flat = tmp_path_factory.mktemp("sess_flat")
    import os
    import shutil
    import time

    # distinct, increasing mtimes: the file stream source orders batches by
    # modification time, and equal mtimes make the pickup order (and thus
    # watermark progression) nondeterministic — the newer half first would
    # drop the older half as late data
    base = time.time() - 1000
    i = 0
    for sub in ["b0", "b1"]:
        for f in sorted((d / sub).glob("*.parquet")):
            dest = flat / f"{i:02d}_{f.name}"
            shutil.copy(f, dest)
            os.utime(dest, (base + i * 10, base + i * 10))
            i += 1
    return str(flat), batch


def test_stateful_sessionize_matches_batch(spark, chrono_files):
    path, batch = chrono_files
    stream = sev.read_event_stream(spark, path)
    out = sessionize_stream(stream, watermark="30 minutes")
    sev.run_to_memory_sink(out, "t_sessions")
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in spark.table("t_sessions").collect()
    }
    assert got, "stream produced no closed sessions"

    expect_rows = all_queries()["ev_sessionize"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    # batch numbers sessions 1..N; the stream numbers 0..N-1
    expect = {
        (r["user_id"], r["session_id"] - 1): (r["n_events"], r["session_start"], r["session_end"])
        for r in expect_rows
    }
    mismatches = []
    for key, val in got.items():
        if key not in expect or expect[key] != val:
            mismatches.append((key, val, expect.get(key)))
    assert not mismatches, f"first mismatches: {mismatches[:5]}"
    # closed-session count should be a large subset of batch sessions
    assert len(got) >= len(expect) * 0.5
