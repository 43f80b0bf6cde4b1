"""Multimodal column operators: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with a
typed metadata struct, exactly how a 100 TB training-data pipeline carries
them (payload bytes in parquet, decode at the edges). The Spark-side
plumbing here — schemas, Arrow-batched mapInPandas, partition sizing — is
real and tested; the codec calls themselves are STUBBED behind
``NotImplementedError`` (this container ships no image/audio libs) with a
deterministic fake used by tests and the synthetic pipeline.

Operators:
- ``attach_payload_meta``  : wrap raw bytes + declared modality into the
                             standard (payload, meta) column pair
- ``decode_stats``         : per-record byte stats via mapInPandas (Arrow
                             batches, no per-row Python)
- ``resize_images``        : stubbed decode->resize->re-encode; plumbing
                             (schema, batch shape) real, codec faked
- ``sample_frames``        : stubbed video frame sampler emitting one row
                             per sampled frame (fan-out via mapInPandas)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("modality", StringType()),  # image | audio | video | other
        StructField("format", StringType()),  # e.g. jpeg, wav, mp4
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def attach_payload_meta(
    df: DataFrame, payload_col: str, modality: str, fmt: str
) -> DataFrame:
    """Standardize a raw binary column into (payload, meta)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("checksum"),
        ),
    ).withColumnRenamed(payload_col, "payload")


def real_decode(payload: bytes, fmt: str) -> dict:
    """Real dependency-free image decode (operators/codecs.py: BMP, 8-bit
    PNG with all five scanline filters, binary PGM/PPM — pure numpy +
    stdlib zlib). Returns the same stat dict shape as fake_decode so the
    mapInPandas plumbing is identical; ``pixels`` carries the decoded
    array for downstream transforms. Video/audio and compressed formats
    beyond zlib-PNG raise NotImplementedError inside decode_image — the
    one remaining seam."""
    from carrot_transform_spark.operators.codecs import decode_image

    px = decode_image(payload, fmt)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "n_frames": 1,
        "pixels": px,
    }


def fake_decode(payload: bytes, fmt: str) -> dict:
    """Deterministic stand-in for a decoder: derives stable pseudo-dimensions
    from the payload hash so tests are reproducible without codec libs."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 64,
        "height": 64 + h[1] % 64,
        "n_frames": 1 + h[2] % 8,
    }


def decode_stats(df: DataFrame, decoder=fake_decode) -> DataFrame:
    """Per-record decode statistics via Arrow-batched mapInPandas.

    Output: (id, modality, format, n_bytes, width, height, n_frames).
    Batch shape: the UDF sees pandas DataFrames of whole Arrow batches, so
    Python overhead is per-batch, not per-row.
    """
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("modality", StringType()),
            StructField("format", StringType()),
            StructField("n_bytes", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_frames", IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # zipped column iteration (not iterrows): one tuple unpack per row,
        # no per-row Series construction — codec cost dominates, the harness
        # shouldn't.
        for pdf in batches:
            rows = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                d = decoder(raw, meta["format"])
                rows.append(
                    (rid, meta["modality"], meta["format"], len(raw), d["width"], d["height"], d["n_frames"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select("id", "payload", "meta").mapInPandas(fn, schema=out_schema)


def resize_images(df: DataFrame, target: int = 224, decoder=fake_decode) -> DataFrame:
    """Decode -> resize -> re-encode inside Arrow batches.

    With the default fake decoder the 'resize' emits a deterministic
    payload (hash of input + target) so the DuckDB oracle can reproduce
    it. With decoder=real_decode the path is fully real: codecs.decode
    -> nearest-neighbor resize -> re-encode in the SAME format."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                d = decoder(raw, meta["format"])
                if "pixels" in d:
                    from carrot_transform_spark.operators.codecs import (
                        encode_image,
                        resize_nearest,
                        sniff_format,
                    )

                    px = resize_nearest(d["pixels"], target, target)
                    resized = encode_image(px, sniff_format(raw) or meta["format"])
                else:
                    resized = hashlib.sha256(raw + str(target).encode()).digest()
                rows.append((rid, resized, target, target))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select("id", "payload", "meta").mapInPandas(fn, schema=out_schema)


def sample_frames(df: DataFrame, every_n: int = 2, decoder=fake_decode) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (row fan-out
    inside mapInPandas, the supported way to emit variable rows per input)."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload, meta in zip(pdf["id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                d = decoder(raw, meta["format"])
                for i in range(0, d["n_frames"], every_n):
                    fake_frame = hashlib.sha256(raw + bytes([i])).digest()
                    rows.append((rid, i, fake_frame))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select("id", "payload", "meta").mapInPandas(fn, schema=out_schema)
