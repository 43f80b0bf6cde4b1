"""MJPEG-AVI container codec (operators/avi.py): with baseline JPEG real,
this is the one compressed VIDEO format decodable without ffmpeg.

Checks: RIFF structure byte-level round trip, O(1) frame slicing (the
sampled frame payload is the exact committed JPEG bytes), codec/ fps/
dims metadata, error paths, and the Spark sample_frames leg where each
sampled frame comes back as a REAL standalone JPEG payload that
decode_image can re-decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from carrot_transform_spark.operators.avi import (
    AviError,
    avi_frame_count,
    avi_frame_payload,
    decode_avi_frame,
    encode_avi_mjpeg,
    parse_avi,
)
from carrot_transform_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _clip(n=5, h=24, w=32):
    frames = []
    pixels = []
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        img = np.stack(
            [(xx * 6 + t * 40) % 256, (yy * 9) % 256, ((xx + yy) * 4 + t * 10) % 256],
            axis=-1,
        ).astype(np.uint8)
        pixels.append(img)
        frames.append(encode_jpeg(img, 90))
    return frames, pixels


def test_roundtrip_metadata_and_exact_frame_slices():
    frames, _ = _clip()
    data = encode_avi_mjpeg(frames, 32, 24, fps=10)
    meta = parse_avi(data)
    assert (meta["width"], meta["height"], meta["codec"]) == (32, 24, "MJPG")
    assert meta["fps"] == pytest.approx(10.0)
    assert avi_frame_count(data, meta) == 5
    # O(1) slicing returns the EXACT encoded payload, not a re-encode
    for i, f in enumerate(frames):
        assert avi_frame_payload(data, i, meta) == f


def test_decoded_frames_match_jpeg_decode():
    frames, pixels = _clip(n=3)
    data = encode_avi_mjpeg(frames, 32, 24)
    for i in range(3):
        px = decode_avi_frame(data, i)
        assert (px == decode_jpeg(frames[i])).all()
        assert np.abs(px.astype(int) - pixels[i].astype(int)).max() <= 12


def test_odd_sized_frames_word_align():
    # force an odd-length JPEG payload: word alignment must keep later
    # frames intact
    frames, _ = _clip(n=4, h=9, w=11)
    odd = [f + b"\xff\xd9"[:1] if len(f) % 2 == 0 else f for f in frames]
    data = encode_avi_mjpeg(odd, 11, 9)
    meta = parse_avi(data)
    for i, f in enumerate(odd):
        assert avi_frame_payload(data, i, meta) == f


def test_error_paths():
    with pytest.raises(AviError):
        parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(AviError):
        encode_avi_mjpeg([], 8, 8)
    frames, _ = _clip(n=1)
    data = bytearray(encode_avi_mjpeg(frames, 32, 24))
    # rewrite the stream fourcc to an unsupported codec
    at = data.index(b"MJPG")
    data[at : at + 4] = b"H264"
    with pytest.raises(AviError, match="H264"):
        decode_avi_frame(bytes(data), 0)


def test_header_layout_is_spec_shaped():
    frames, _ = _clip(n=2)
    data = encode_avi_mjpeg(frames, 32, 24, fps=12)
    # avih chunk body is 56 bytes and holds totalFrames/width/height
    at = data.index(b"avih")
    (sz,) = struct.unpack("<I", data[at + 4 : at + 8])
    assert sz == 56
    total, = struct.unpack("<I", data[at + 8 + 16 : at + 8 + 20])
    w, h = struct.unpack("<II", data[at + 8 + 32 : at + 8 + 40])
    assert (total, w, h) == (2, 32, 24)
    # idx1 present with one entry per frame
    at = data.index(b"idx1")
    (isz,) = struct.unpack("<I", data[at + 4 : at + 8])
    assert isz == 2 * 16


def test_sample_frames_real_decoder_spark(spark):
    """Video sampling over real MJPEG-AVI: every sampled row's payload is
    a standalone baseline JPEG, re-decodable by the image path."""
    from carrot_transform_spark.operators.codecs import decode_image, sniff_format
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        real_decode,
        sample_frames,
    )

    frames, _ = _clip(n=7)
    data = encode_avi_mjpeg(frames, 32, 24, fps=10)
    df = spark.createDataFrame([(1, data)], "id long, raw binary")
    df = attach_payload_meta(df, "raw", "video", "avi")
    out = sample_frames(df, every_n=3, decoder=real_decode).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 3, 6]
    for r in out:
        payload = bytes(r["payload"])
        assert payload == frames[r["frame_idx"]]  # exact slice, no re-encode
        assert sniff_format(payload) == "jpeg"
        assert decode_image(payload).shape == (24, 32, 3)
