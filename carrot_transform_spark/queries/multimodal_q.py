"""Multimodal + sketch queries.

The multimodal payloads are synthesized deterministically from the
documents table (utf-8 bytes of the text), so the mapInPandas decode
plumbing runs on real distributed binary data every round.

Both entries are oracle-gated as of round 6. The sketch entry emits exact
aggregates plus error-bound flags (the sketch values themselves aren't SQL
twins). The multimodal entry's oracle reproduces the DETERMINISTIC FAKE
codec (operators/multimodal.fake_decode derives dimensions from the md5 of
the payload, and DuckDB's md5(VARCHAR) hashes the same utf-8 bytes Spark
encodes) — with a real image/audio codec the entry would revert to
rows-only, which is why the decode seam stays pluggable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from carrot_transform_spark.queries import load, register


@register(
    "sketch_approx_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS hll_ok,
           TRUE AS median_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("sketch",),
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct + approximate quantiles — the sketch-based
    scale path (exact twins are oracle-gated in ev_user_stats /
    stat_percentiles).

    Partial oracle: the sketch values themselves aren't SQL-reproducible, so
    the query emits the EXACT aggregates (oracle-checked by DuckDB) plus
    error-bound assertions on the sketches — hll_ok pins the HLL++ estimate
    within 6% relative error (3x the configured rsd=0.02: rsd is a standard
    error, so a bound must leave sigma headroom — the original 2.5% pin was
    1.3 sigma and sf10's 150k-distinct draw deterministically erred 2.63%,
    while a BROKEN sketch errs far beyond 6%), median_ok pins
    approx_percentile within 5% of the exact median. A sketch regression
    flips a flag to false and hash-mismatches."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.expr("approx_percentile(value, 0.5)").alias("approx_median"),
        F.expr("percentile(value, 0.5)").alias("exact_median"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.06)
        ).alias("hll_ok"),
        (
            F.abs(F.col("approx_median") - F.col("exact_median"))
            <= F.greatest(F.abs(F.col("exact_median")) * F.lit(0.05), F.lit(1e-9))
        ).alias("median_ok"),
    ).orderBy("event_type")


@register(
    "mm_pipeline",
    oracle="""
    WITH d AS (
        SELECT doc_id AS id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS h
        FROM documents
    ), f AS (
        SELECT id,
               1 + ((strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)) % 8
               AS n_frames
        FROM d
    ), fr AS (
        SELECT id, unnest(range(0, n_frames, 2)) AS idx FROM f
    )
    SELECT 'decode' AS part, id, 0 AS idx, n_bytes FROM d
    UNION ALL
    SELECT 'frames' AS part, id, CAST(idx AS INTEGER) AS idx,
           CAST(32 AS BIGINT) AS n_bytes
    FROM fr
    ORDER BY part, id, idx
    """,
    tags=("multimodal",),
)
def mm_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched multimodal plumbing as one entry: decode-stats over
    binary image payloads + video frame-sampling fan-out (variable rows per
    input), both via mapInPandas with the codec stubbed deterministically
    (see operators/multimodal.py). Canonical (part, id, idx, n_bytes) rows.

    Oracle: the fake codec is a pure function of md5(payload bytes) —
    fake_decode width/height/n_frames come from digest bytes, the sampled
    frame payload is a 32-byte sha256 — and the payload is the utf-8
    encoding of documents.text, which DuckDB's md5(VARCHAR) hashes
    identically. n_frames needs digest byte 2 = hex chars 5-6 of the md5
    string; frame rows are range(0, n_frames, every_n=2). So the whole
    mapInPandas fan-out has an exact SQL twin, and the driver hash-checks
    the Arrow plumbing end-to-end (1,736 rows at sf0.01)."""
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        decode_stats,
        sample_frames,
    )

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("raw")
    )
    img = attach_payload_meta(d, "raw", modality="image", fmt="jpeg")
    vid = attach_payload_meta(d, "raw", modality="video", fmt="mp4")
    decoded = decode_stats(img).select(
        F.lit("decode").alias("part"),
        "id",
        F.lit(0).alias("idx"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )
    frames = sample_frames(vid, every_n=2).select(
        F.lit("frames").alias("part"),
        "id",
        F.col("frame_idx").alias("idx"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    return decoded.unionByName(frames).orderBy("part", "id", "idx")
