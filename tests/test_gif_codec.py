"""GIF codec (operators/gif.py): LZW + palette, interlace, animation.

The LZW bit packing is pinned by a HAND-COMPUTED stream from the spec's
rules (LSB-first, clear/end codes) — external to the codec, so a
matching encoder/decoder off-by-one can't cancel. Round trips cover
dictionary growth through width changes and 4096-entry clear resets,
interlacing, transparency, multi-frame compositing, and local color
tables (hand-built container); the Spark leg samples an animated GIF
into standalone PNG frame payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from carrot_transform_spark.operators.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    gif_frame_count,
    parse_gif,
)


def test_lzw_bit_packing_hand_computed():
    """min_code=2, pixels [1,1]: codes clear(4),1,1,end(5) at width 3,
    LSB-first -> bits 001 100 100 101 -> bytes 0x4C, 0x0A (hand math)."""
    assert _lzw_encode(b"\x01\x01", 2) == bytes([0x4C, 0x0A])
    assert bytes(_lzw_decode(bytes([0x4C, 0x0A]), 2, 2)) == b"\x01\x01"


def test_lzw_roundtrip_adversarial():
    rng = np.random.default_rng(9)
    cases = [
        bytes(rng.integers(0, 4, 10_000, dtype=np.uint8)),  # width growth + reset
        b"\x00" * 5000,                                       # one long run
        bytes(range(4)) * 1,                                  # tiny
        bytes(rng.integers(0, 2, 300, dtype=np.uint8)),
    ]
    for raw in cases:
        enc = _lzw_encode(raw, 2)
        assert bytes(_lzw_decode(enc, 2, len(raw))) == raw


def test_roundtrip_and_interlace():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (23, 31), dtype=np.uint8)
    want = pal[idx]
    assert (decode_gif(encode_gif(idx, pal)) == want).all()
    assert (decode_gif(encode_gif(idx, pal, interlace_first=True)) == want).all()


def test_animation_frames_composite():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, (12, 17), dtype=np.uint8) for _ in range(4)]
    data = encode_gif(frames, pal)
    assert gif_frame_count(data) == 4
    shown = decode_gif_frames(data)
    for i in range(4):
        assert (shown[i] == pal[frames[i]]).all()


def test_dictionary_reset_at_4096():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    big = rng.integers(0, 16, (200, 300), dtype=np.uint8)  # 60k px > 4096 entries
    assert (decode_gif(encode_gif(big, pal)) == pal[big]).all()


def test_local_color_table_and_transparency():
    """Hand-built container: no GCT, image carries its own LCT; a second
    sub-rectangle frame with a transparent index must show through."""
    lct = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 2, 2) + bytes([0x00, 0, 0])  # no GCT
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
    out += bytes([0x81])  # LCT present, 2 bits -> 4 entries
    out += lct.tobytes()
    out += bytes([2])
    data = _lzw_encode(idx.tobytes(), 2)
    out += bytes([len(data)]) + data + b"\x00"
    # second frame: 1x1 at (1,1), index 0 TRANSPARENT -> underlying shows
    out += b"\x21\xf9\x04" + bytes([0x05, 0, 0, 0]) + b"\x00"  # GCE transp idx 0
    out += b"\x2c" + struct.pack("<HHHH", 1, 1, 1, 1) + bytes([0x81]) + lct.tobytes()
    data = _lzw_encode(b"\x00", 2)
    out += bytes([2]) + bytes([len(data)]) + data + b"\x00"
    out += b"\x3b"

    frames = decode_gif_frames(bytes(out))
    assert (frames[0] == lct[idx]).all()
    # transparent pixel: frame 2 shows frame 1's (1,1) value unchanged
    assert (frames[1] == frames[0]).all()


def test_disposal_restore_to_previous():
    """Disposal 3: the screen reverts to its PRE-DRAW state before the next
    frame composites — a later frame must not see the disposed frame's
    pixels (regression: disposal 3 was silently treated as draw-over)."""
    gct = np.array(
        [[9, 9, 9], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 2, 2) + bytes([0x81, 0, 0])  # GCT, 4 entries
    out += gct.tobytes()

    def image(rect, idx_bytes, disposal=None):
        blk = bytearray()
        if disposal is not None:
            blk += b"\x21\xf9\x04" + bytes([disposal << 2, 0, 0, 0]) + b"\x00"
        blk += b"\x2c" + struct.pack("<HHHH", *rect) + bytes([0x00])  # no LCT
        data = _lzw_encode(idx_bytes, 2)
        blk += bytes([2, len(data)]) + data + b"\x00"
        return blk

    out += image((0, 0, 2, 2), b"\x00\x00\x00\x00")            # f0: all c0
    out += image((0, 0, 1, 1), b"\x01", disposal=3)             # f1: c1, restore-prev
    out += image((1, 1, 1, 1), b"\x02")                         # f2: c2 bottom-right
    out += b"\x3b"

    d = decode_gif_frames(bytes(out))
    assert (d[0] == gct[0]).all()
    assert (d[1][0, 0] == gct[1]).all() and (d[1][1, 1] == gct[0]).all()
    # f1's pixel is GONE in d2 (restored), f2's pixel present
    assert (d[2][0, 0] == gct[0]).all(), "disposal 3 leaked the disposed frame"
    assert (d[2][1, 1] == gct[2]).all()


def test_error_paths():
    with pytest.raises(GifError):
        parse_gif(b"NOTGIF" + b"\x00" * 10)
    with pytest.raises(GifError):
        encode_gif([], np.zeros((2, 3), np.uint8))
    # truncated LZW stream
    pal = np.zeros((4, 3), np.uint8)
    data = bytearray(encode_gif(np.zeros((10, 10), np.uint8), pal))
    with pytest.raises(GifError):
        parse_gif(bytes(data[:30]))


def test_dispatch_and_real_decode():
    from carrot_transform_spark.operators.codecs import decode_image, sniff_format
    from carrot_transform_spark.operators.multimodal import real_decode

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 14), dtype=np.uint8)
    data = encode_gif(idx, pal)
    assert sniff_format(data) == "gif"
    assert (decode_image(data) == pal[idx]).all()
    d = real_decode(data, "gif")
    assert (d["width"], d["height"], d["n_frames"]) == (14, 9, 1)


def test_animated_gif_sample_frames_spark(spark):
    """Animated GIF through the video sampling path: sampled rows carry
    standalone PNG payloads of the DISPLAYED frames."""
    from carrot_transform_spark.operators.codecs import decode_image, sniff_format
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        real_decode,
        sample_frames,
    )

    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, (10, 12), dtype=np.uint8) for _ in range(5)]
    data = encode_gif(frames, pal)
    df = spark.createDataFrame([(1, data)], "id long, raw binary")
    df = attach_payload_meta(df, "raw", "video", "gif")
    out = sample_frames(df, every_n=2, decoder=real_decode).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 4]
    for r in out:
        payload = bytes(r["payload"])
        assert sniff_format(payload) == "png"
        assert (decode_image(payload) == pal[frames[r["frame_idx"]]]).all()
