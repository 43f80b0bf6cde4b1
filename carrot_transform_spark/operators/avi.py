"""Dependency-free MJPEG-AVI container codec (RIFF walk, pure stdlib).

With baseline JPEG real (operators/jpeg.py), Motion-JPEG in an AVI
container is the one compressed VIDEO format decodable without
ffmpeg: every frame is an ordinary baseline JFIF payload in a '00dc'
chunk. The RIFF/AVI layout is public (Microsoft "AVI RIFF File
Reference"); no reference-repo counterpart exists (the reference has no
multimodal layer).

Design mirrors the Y4M codec's O(1)-per-frame discipline: ``parse_avi``
walks the container ONCE and records frame (offset, size) pairs;
``avi_frame_payload`` slices a single frame's JPEG bytes without
touching the others, so sampling 1-in-N frames of a long clip decodes
only the sampled frames. Sampled frames come back as REAL standalone
JPEG payloads — directly consumable by decode_image / the image ops.

The encoder writes the minimal standards-shaped file (avih + one 'vids'
stream with MJPG fourcc + movi + idx1) so tests and pipelines can
produce real MJPEG-AVI bytes in-container."""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise AviError(msg)


def parse_avi(payload: bytes) -> dict:
    """One-pass RIFF walk -> {width, height, fps, codec, frames:[(off,sz)]}.

    Only the video stream's '..dc'/'..db' chunks are indexed; audio
    streams ('..wb') are skipped. Tolerates a missing idx1 (streams the
    movi LIST) and the OpenDML oddity of dwTotalFrames=0."""
    _expect(payload[:4] == b"RIFF" and payload[8:12] == b"AVI ", "not an AVI")
    width = height = 0
    fps = 25.0
    codec = ""
    frames: list[tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, fps, codec
        pos = start
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body0 = pos + 8
            if fourcc == b"LIST":
                ltype = payload[body0 : body0 + 4]
                if ltype in (b"hdrl", b"strl", b"movi", b"odml"):
                    walk(body0 + 4, body0 + size)
            elif fourcc == b"avih":
                (us_per_frame,) = struct.unpack("<I", payload[body0 : body0 + 4])
                if us_per_frame:
                    fps = 1_000_000.0 / us_per_frame
                width, height = struct.unpack(
                    "<II", payload[body0 + 32 : body0 + 40]
                )
            elif fourcc == b"strh":
                if payload[body0 : body0 + 4] == b"vids":
                    codec = payload[body0 + 4 : body0 + 8].decode("ascii", "replace").strip()
                    rate_scale = struct.unpack("<II", payload[body0 + 20 : body0 + 28])
                    if rate_scale[0] and rate_scale[1]:
                        fps = rate_scale[1] / rate_scale[0]
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append((body0, size))
            pos = body0 + size + (size & 1)  # chunks are word-aligned

    walk(12, len(payload))
    _expect(bool(frames), "AVI contains no video frame chunks")
    return {
        "width": int(width),
        "height": int(height),
        "fps": float(fps),
        "codec": codec,
        "frames": frames,
    }


def avi_frame_count(payload: bytes, meta: dict | None = None) -> int:
    return len((meta or parse_avi(payload))["frames"])


def avi_frame_payload(payload: bytes, index: int, meta: dict | None = None) -> bytes:
    """Frame `index`'s raw codec payload (a standalone JPEG for MJPEG) —
    a single O(1) slice, unsampled frames never touched."""
    meta = meta or parse_avi(payload)
    off, size = meta["frames"][index]
    return payload[off : off + size]


def decode_avi_frame(
    payload: bytes, index: int, meta: dict | None = None
) -> np.ndarray:
    """Frame `index` as (H, W, C) uint8 pixels (MJPEG only)."""
    meta = meta or parse_avi(payload)
    if meta["codec"] not in ("MJPG", "mjpg", "jpeg", ""):
        raise AviError(
            f"unsupported AVI codec {meta['codec']!r}; only MJPG is "
            "decodable without ffmpeg"
        )
    from carrot_transform_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(avi_frame_payload(payload, index, meta))


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: float = 25.0
) -> bytes:
    """Standalone JPEG payloads -> one MJPEG-AVI file."""
    if not jpeg_frames:
        raise AviError("need at least one frame")
    n = len(jpeg_frames)
    us_per_frame = int(round(1_000_000 / fps))
    max_size = max(len(f) for f in jpeg_frames)

    # 56-byte avih body: usPerFrame, maxBytesPerSec, padding, flags
    # (0x10 = HASINDEX), totalFrames, initialFrames, streams, bufSize,
    # width, height, reserved[4]
    avih = b"avih" + struct.pack("<I", 56) + struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )

    # 56-byte strh body: fccType, fccHandler, flags, priority+language,
    # initialFrames, scale, rate, start, length, bufSize, quality,
    # sampleSize, rcFrame(4xH)
    strh = b"strh" + struct.pack("<I", 56) + (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, int(round(fps)), 0, n,
                      max_size, 0xFFFFFFFF, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    bmih = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strf = b"strf" + struct.pack("<I", len(bmih)) + bmih
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_body = bytearray(b"movi")
    idx = bytearray()
    for f in jpeg_frames:
        chunk_off = len(movi_body)  # offset of the '00dc' fourcc within movi
        movi_body += b"00dc" + struct.pack("<I", len(f)) + f
        if len(f) & 1:
            movi_body += b"\x00"
        idx += b"00dc" + struct.pack("<III", 0x10, chunk_off, len(f))
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + idx

    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
