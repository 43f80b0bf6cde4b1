"""Multimodal column operators: opaque binary payloads + typed metadata.

Images / audio / video ride through the engine as ``binary`` columns with a
typed metadata struct, exactly how a 100 TB training-data pipeline carries
them (payload bytes in parquet, decode at the edges). The Spark-side
plumbing — schemas, Arrow-batched mapInPandas, partition sizing — is real
and tested, and so are the codecs for the dependency-free formats
(operators/codecs.py: BMP / 8-bit PNG / PGM-PPM / JPEG incl. progressive
/ GIF incl. animation, PCM+float WAV audio, YUV4MPEG2 + MJPEG-AVI
video). Formats still without a dependency-free decoder (mp3/mp4/webp/
...) raise ``NotImplementedError`` from ``real_decode``; the
deterministic ``fake_decode`` keeps the plumbing testable for any
payload.

Operators:
- ``attach_payload_meta``  : wrap raw bytes + declared modality into the
                             standard (payload, meta) column pair
- ``decode_stats``         : per-record decode statistics via mapInPandas
                             (Arrow batches, no per-row Python)
- ``resize_images``        : decode->resize->re-encode in the same format
- ``sample_frames``        : video frame sampler emitting one row per
                             sampled frame (fan-out via mapInPandas); with
                             ``real_decode`` each row carries the frame as
                             a single-frame Y4M payload
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
    """Real dependency-free decode (operators/codecs.py). Returns the same
    stat dict shape as fake_decode so the mapInPandas plumbing is
    identical, plus modality-specific extras:

    - images (BMP / 8-bit PNG / PGM-PPM): width x height, n_frames=1,
      ``pixels`` = (H, W, C) uint8
    - audio (PCM / IEEE-float WAV): n_frames = SAMPLE count (the WAV term
      for per-channel sample groups), width = channels, height =
      sample_rate; ``samples`` = (n, channels), ``sample_rate``
    - video (YUV4MPEG2): width x height, n_frames = frame count;
      ``pixels`` = first frame (YUV, chroma upsampled), ``frame_at(i)`` =
      that frame re-encoded as a single-frame Y4M payload (O(1) header
      arithmetic, unsampled frames never materialised)

    Compressed formats raise NotImplementedError inside decode_image —
    the remaining out-of-scope set (no ffmpeg/PIL in this container)."""
    from carrot_transform_spark.operators import codecs as C

    sniffed = C.sniff_format(payload)
    if sniffed == "wav":
        samples, rate = C.decode_wav(payload)
        return {
            "width": int(samples.shape[1]),
            "height": int(rate),
            "n_frames": int(samples.shape[0]),
            "samples": samples,
            "sample_rate": rate,
        }
    if sniffed == "gif":
        from carrot_transform_spark.operators import codecs as CC
        from carrot_transform_spark.operators import gif as G

        gmeta = G.parse_gif(payload)
        gframes = G.decode_gif_frames(payload, gmeta)

        # animated GIFs behave like video: sampled frames come back as
        # standalone PNG payloads (lossless, dependency-free re-encode)
        def frame_at(i: int) -> bytes:
            return CC.encode_png(gframes[i])

        return {
            "width": gmeta["width"],
            "height": gmeta["height"],
            "n_frames": len(gframes),
            "pixels": gframes[0],
            "frame_at": frame_at,
        }
    if sniffed == "avi":
        from carrot_transform_spark.operators import avi as A

        ameta = A.parse_avi(payload)
        n = len(ameta["frames"])

        # sampled frames come back as REAL standalone JPEG payloads —
        # directly re-decodable by decode_image (unlike y4m, no
        # re-containerization is needed; MJPEG frames ARE images)
        def frame_at(i: int) -> bytes:
            return A.avi_frame_payload(payload, i, ameta)

        return {
            "width": ameta["width"],
            "height": ameta["height"],
            "n_frames": n,
            "pixels": A.decode_avi_frame(payload, 0, ameta) if n else None,
            "frame_at": frame_at,
        }
    if sniffed == "mp4":
        from carrot_transform_spark.operators import mp4 as M

        mmeta = M.parse_mp4(payload)
        n = mmeta["n_frames"]
        mjpeg = mmeta["codec"] in ("jpeg", "mjpa", "mjpb")

        # MJPEG tracks: sampled frames are REAL standalone JPEGs (same
        # contract as AVI); compressed codecs keep metadata + raw sample
        # extraction but pixel access is the documented NotImplemented seam
        def frame_at(i: int) -> bytes:
            return M.mp4_frame_payload(payload, i, mmeta)

        return {
            "width": mmeta["width"],
            "height": mmeta["height"],
            "n_frames": n,
            "pixels": M.decode_mp4_frame(payload, 0, mmeta) if (n and mjpeg) else None,
            "frame_at": frame_at,
            "codec": mmeta["codec"],
            "duration_s": mmeta["duration_s"],
            "fps": mmeta["fps"],
        }
    if sniffed == "mp3":
        from carrot_transform_spark.operators import mp3 as A3

        ameta = A3.parse_mp3(payload)
        # WAV convention: n_frames = per-channel PCM sample count,
        # width = channels, height = sample rate; no 'samples' key — PCM
        # decode is the documented NotImplemented seam
        return {
            "width": ameta["channels"],
            "height": ameta["samplerate"],
            "n_frames": ameta["n_samples"],
            "duration_s": ameta["duration_s"],
            "bitrate_kbps": ameta["bitrate_kbps"],
            "vbr": ameta["vbr"],
        }
    if sniffed == "y4m":
        meta = C.parse_y4m_header(payload)
        n = C.y4m_frame_count(payload, meta)

        def frame_at(i: int) -> bytes:
            fr = C.decode_y4m_frame(payload, i, meta)
            return C.encode_y4m(fr[None], fps=meta["fps"])

        return {
            "width": meta["width"],
            "height": meta["height"],
            "n_frames": n,
            "pixels": C.decode_y4m_frame(payload, 0, meta) if n else None,
            "frame_at": frame_at,
        }
    px = C.decode_image(payload, fmt)
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
                frame_at = d.get("frame_at")
                for i in range(0, d["n_frames"], every_n):
                    if frame_at is not None:
                        frame = frame_at(i)
                    else:
                        frame = hashlib.sha256(raw + bytes([i % 256])).digest()
                    rows.append((rid, i, frame))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select("id", "payload", "meta").mapInPandas(fn, schema=out_schema)
