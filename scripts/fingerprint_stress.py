#!/usr/bin/env python
"""Exact-dedup fingerprint-store stress: one maintenance step for a large
batch against a much larger stored canon.

Usage: python scripts/fingerprint_stress.py [n_store] [n_batch] [dup_pct]

The store holds n_store distinct fingerprints; the batch contains
dup_pct duplicates of stored texts (same md5 inputs) plus fresh texts.
Validates reject counts exactly, reports batch docs/s.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from carrot_transform_spark.operators.fingerprints import update_fingerprint_store  # noqa: E402
from carrot_transform_spark.session import get_spark  # noqa: E402


def texts(spark, ids):
    # text is a pure function of the SEED column so duplicates are exact
    return ids.select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body "), F.col("seed").cast("string"), F.lit(" tail")).alias("text"),
    )


def main() -> None:
    n_store = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    dup_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2

    spark = get_spark(app_name="fingerprint-stress")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="fp_stress_")
    path = f"{tmp}/fp"

    base = texts(spark, spark.range(n_store).withColumn("seed", F.col("id")))
    t0 = time.perf_counter()
    update_fingerprint_store(path, base, "doc_id", "text", unit="base")
    t_base = time.perf_counter() - t0

    n_dup = int(n_batch * dup_pct)
    batch = texts(
        spark,
        spark.range(n_store, n_store + n_batch).withColumn(
            "seed",
            # first n_dup rows re-use a stored seed -> exact dup of the store
            F.when(F.col("id") < n_store + n_dup, F.col("id") - n_store)
            .otherwise(F.col("id")),
        ),
    )
    t1 = time.perf_counter()
    result = update_fingerprint_store(path, batch, "doc_id", "text")
    n_rejected = result.filter(F.col("dup_of").isNotNull()).count()
    t_step = time.perf_counter() - t1

    print(
        json.dumps(
            {
                "n_store": n_store,
                "n_batch": n_batch,
                "base_build_sec": round(t_base, 1),
                "step_sec": round(t_step, 1),
                "batch_docs_per_sec": int(n_batch / t_step),
                "rejected": n_rejected,
                "rejected_expected": n_dup,
            }
        )
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
