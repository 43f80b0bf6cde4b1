"""Real dependency-free image codec (operators/codecs.py) — VERDICT r9
task 3: the multimodal decode seam closed with a pure-numpy BMP / zlib-PNG /
netpbm decoder, value-checked (not rows-only) against committed tiny images
(tests/data/mm/ + golden.json, deterministic gradient patterns).

Independence of the checks:
- the hand-crafted BMP is built byte-by-byte in the test from the spec;
- PNG filter coverage builds FILTERED scanlines with an independent
  re-implementation of the five filter functions (the encoder only ever
  emits filter 0), so decode must invert real Sub/Up/Average/Paeth data;
- the committed goldens pin exact payload AND pixel checksums, so a codec
  regression (or silent re-encode drift) fails loudly.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from pathlib import Path

import numpy as np
import pytest

from carrot_transform_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_image,
    resize_nearest,
    sniff_format,
)

MM = Path(__file__).resolve().parent / "data" / "mm"
GOLDEN = json.loads((MM / "golden.json").read_text())


def _pattern(h, w, c):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 3 + y * 7 + ch * 11) % 256 for ch in range(c)], axis=-1).astype(
        np.uint8
    )


# ---------------------------------------------------------- hand-built BMP


def test_handcrafted_bmp_decodes_exactly():
    # 2x2 24-bit BMP, bottom-up, stride 8 (2*3 padded to 4 bytes), built
    # byte-by-byte from the spec — independent of encode_bmp.
    # target pixels (RGB): row0 = red, green ; row1 = blue, white
    bottom_row = bytes([255, 0, 0, 255, 255, 255]) + b"\0\0"  # BGR: blue, white
    top_row = bytes([0, 0, 255, 0, 255, 0]) + b"\0\0"  # BGR: red, green
    body = bottom_row + top_row  # bottom-up storage
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    px = decode_bmp(hdr + info + body)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    assert (px == expect).all()


def test_topdown_bmp():
    # negative height = top-down row order
    body = bytes([0, 0, 255, 0, 255, 0]) + b"\0\0" + bytes([255, 0, 0, 255, 255, 255]) + b"\0\0"
    info = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(body), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    px = decode_bmp(hdr + info + body)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    assert (px == expect).all()


# --------------------------------------------------- PNG filter differential


def _png_wrap(w, h, channels, raw_scanlines: bytes) -> bytes:
    color_type = {1: 0, 3: 2, 4: 6}[channels]

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw_scanlines))
        + chunk(b"IEND", b"")
    )


def _filter_line(ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Independent spec implementation of PNG filtering (encode side)."""
    n = len(line)
    out = np.zeros(n, dtype=np.int32)
    for x in range(n):
        left = int(line[x - bpp]) if x >= bpp else 0
        up = int(prev[x])
        ul = int(prev[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
        out[x] = (int(line[x]) - pred) & 0xFF
    return bytes([ftype]) + out.astype(np.uint8).tobytes()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_filters_roundtrip(ftype, channels):
    px = _pattern(6, 5, channels)
    flat = px.reshape(6, -1)
    raw = b""
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y in range(6):
        raw += _filter_line(ftype, flat[y], prev, channels)
        prev = flat[y]
    got = decode_png(_png_wrap(5, 6, channels, raw))
    assert (got == px).all()


def test_png_mixed_filters():
    channels = 3
    px = _pattern(5, 4, channels)
    flat = px.reshape(5, -1)
    raw = b""
    prev = np.zeros(flat.shape[1], dtype=np.uint8)
    for y, ftype in enumerate([4, 3, 1, 2, 0]):
        raw += _filter_line(ftype, flat[y], prev, channels)
        prev = flat[y]
    assert (decode_png(_png_wrap(4, 5, channels, raw)) == px).all()


# ------------------------------------------------------------- round trips


@pytest.mark.parametrize(
    "fmt,channels",
    [("bmp", 1), ("bmp", 3), ("bmp", 4), ("png", 1), ("png", 3), ("png", 4), ("pnm", 1), ("pnm", 3)],
)
def test_encode_decode_roundtrip(fmt, channels):
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(11, 7, channels), dtype=np.uint8)  # odd width
    payload = encode_image(px, fmt)
    assert sniff_format(payload) == fmt
    assert (decode_image(payload) == px).all()


def test_pnm_comments_and_whitespace():
    px = _pattern(3, 2, 3)
    payload = b"P6\n# a comment\n 2 # inline\n3\n255\n" + px.tobytes()
    assert (decode_pnm(payload) == px).all()


def test_pnm_crlf_after_maxval():
    # text-mode Windows writers end the header with \r\n; treat it as ONE
    # separator instead of shifting the whole raster by a byte
    px = _pattern(4, 3, 3)
    payload = b"P6\r\n3 4\r\n255\r\n" + px.tobytes()
    assert (decode_pnm(payload) == px).all()


def test_pnm_lone_cr_separator_keeps_0x0a_pixel():
    # spec-valid file: the single separator is '\r' and the FIRST RASTER
    # BYTE is 0x0A — the CRLF tolerance must not eat the pixel (it only
    # applies when the strict read would not yield an exact-length raster)
    import numpy as np

    px = _pattern(2, 2, 1)
    px[0, 0, 0] = 0x0A
    payload = b"P5\n2 2\n255\r" + px.tobytes()
    assert (decode_pnm(payload) == px).all()


def test_bmp_indexed_palette_maps_to_rgb():
    # 2x2 8-bit BMP with a non-gray palette: indices must map THROUGH the
    # BGRX color table, not decode as luminance
    pal = bytearray(256 * 4)
    pal[0:4] = bytes([255, 0, 0, 0])  # index 0 -> blue (BGR)
    pal[4:8] = bytes([0, 0, 255, 0])  # index 1 -> red
    body = bytes([0, 1, 0, 0]) + bytes([1, 0, 0, 0])  # stride 4, bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(body), 0, 0, 256, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 1024 + len(body), 0, 0, 14 + 40 + 1024)
    px = decode_bmp(hdr + info + bytes(pal) + body)
    assert px.shape == (2, 2, 3)
    expect = np.array(
        [[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8
    )
    assert (px == expect).all()


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x11GIF-ish unknown magic bytes")
    # a JPEG magic now dispatches to the real decoder; malformed payloads
    # raise its typed error (a ValueError), not NotImplementedError
    from carrot_transform_spark.operators.jpeg import JpegError

    with pytest.raises(JpegError):
        decode_image(b"\xff\xd8\xff\xe0 not really jpeg")


# ----------------------------------------------------------------- resize


def test_resize_nearest_exact_picks():
    px = _pattern(4, 4, 3)
    out = resize_nearest(px, 2, 2)
    # src idx = floor((i+0.5)*4/2) = {1, 3}
    assert (out == px[[1, 3]][:, [1, 3]]).all()


def test_resize_upscale_shape():
    px = _pattern(3, 3, 1)
    out = resize_nearest(px, 9, 6)
    assert out.shape == (6, 9, 1)
    # corners map to corners
    assert out[0, 0, 0] == px[0, 0, 0] and out[-1, -1, 0] == px[-1, -1, 0]


# ------------------------------------------- committed goldens, value-check


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_committed_golden_decodes(name):
    payload = (MM / name).read_bytes()
    g = GOLDEN[name]
    assert hashlib.md5(payload).hexdigest() == g["payload_md5"]
    px = decode_image(payload)
    assert px.shape == (g["height"], g["width"], g["channels"])
    assert hashlib.md5(px.tobytes()).hexdigest() == g["pixel_md5"]
    assert int(px.astype(np.int64).sum()) == g["pixel_sum"]
    pattern = _pattern(g["height"], g["width"], g["channels"])
    if g.get("lossy"):
        # JPEG: decode is deterministic (md5 above) but reconstruction is
        # approximate — bound the distance to the generating pattern
        err = np.abs(px.astype(np.int64) - pattern.astype(np.int64)).max()
        assert err <= g["max_err"], f"{name}: err {err} > {g['max_err']}"
    else:
        # the committed bytes ARE the deterministic gradient pattern
        assert (px == pattern).all()


# --------------------------------------------------- Spark end-to-end legs


def test_decode_stats_real_codec_spark(spark):
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        decode_stats,
        real_decode,
    )

    rows = [
        (i, name, (MM / name).read_bytes(), GOLDEN[name]["format"])
        for i, name in enumerate(sorted(GOLDEN))
    ]
    df = spark.createDataFrame(
        [(r[0], r[2], r[3]) for r in rows], "id long, raw binary, fmt string"
    )
    df = attach_payload_meta(df.withColumnRenamed("raw", "payload_raw"), "payload_raw", "image", "mixed")
    # attach real per-row format (attach_payload_meta writes a literal)
    got = {
        r["id"]: r
        for r in decode_stats(df, decoder=real_decode).collect()
    }
    for i, name in enumerate(sorted(GOLDEN)):
        g = GOLDEN[name]
        assert got[i]["width"] == g["width"], name
        assert got[i]["height"] == g["height"], name
        assert got[i]["n_bytes"] == g["n_bytes"], name
        assert got[i]["n_frames"] == 1


def test_resize_images_real_codec_spark(spark):
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        real_decode,
        resize_images,
    )

    name = "grad_13x6_rgb.png"
    payload = (MM / name).read_bytes()
    df = spark.createDataFrame([(1, payload)], "id long, raw binary")
    df = attach_payload_meta(df, "raw", "image", "png")
    out = resize_images(df, target=4, decoder=real_decode).collect()[0]
    assert (out["width"], out["height"]) == (4, 4)
    resized = decode_image(bytes(out["payload"]))
    expect = resize_nearest(decode_image(payload), 4, 4)
    assert sniff_format(bytes(out["payload"])) == "png"  # same format back
    assert (resized == expect).all()


# ------------------------------------------------------------- WAV codec


def _wav_mod():
    from carrot_transform_spark.operators import codecs as C

    return C


def test_wav_roundtrip_dtypes():
    C = _wav_mod()
    rng = np.random.RandomState(7)
    for dt, channels in ((np.uint8, 1), (np.int16, 2), (np.int32, 3), (np.float32, 2)):
        if dt == np.float32:
            s = rng.randn(120, channels).astype(np.float32)
        else:
            info = np.iinfo(dt)
            s = rng.randint(info.min, info.max, (120, channels)).astype(dt)
        payload = C.encode_wav(s, 44100)
        assert C.sniff_format(payload) == "wav"
        d, sr = C.decode_wav(payload)
        assert sr == 44100 and d.dtype == dt and (d == s).all()


def test_wav_chunk_walk_skips_unknown_and_odd_sizes():
    C = _wav_mod()
    s = (np.arange(10, dtype=np.int16) * 100).reshape(-1, 1)
    base = C.encode_wav(s, 8000)
    # splice an ODD-sized LIST chunk (with its pad byte) between fmt and data
    fmt_end = 12 + 8 + 16
    alien = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"  # 5 odd -> pad
    payload = base[:fmt_end] + alien + base[fmt_end:]
    payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
    d, sr = C.decode_wav(payload)
    assert sr == 8000 and (d == s).all()


def test_wav_24bit_sign_extension():
    C = _wav_mod()
    vals = [0x000001, 0x7FFFFF, 0x800000, 0xFFFFFF]  # +1, max, min, -1
    body = b"".join(struct.pack("<I", v)[:3] for v in vals)
    fmt_body = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    chunks = b"fmt " + struct.pack("<I", 16) + fmt_body
    chunks += b"data" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    d, sr = C.decode_wav(payload)
    assert d[:, 0].tolist() == [1, 0x7FFFFF, -0x800000, -1]


def test_wav_extensible_header_maps_to_pcm():
    C = _wav_mod()
    s = (np.arange(6, dtype=np.int16)).reshape(-1, 2)
    body = s.astype("<i2").tobytes()
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE) with PCM subformat tag in cbSize area
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 2, 16000, 16000 * 4, 4, 16)
    # cbSize=22, validBits=16, channelMask=3, then the SubFormat GUID whose
    # first 2 bytes are the real format tag (1 = PCM)
    fmt_body += struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + b"\0" * 14
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    d, sr = C.decode_wav(payload)
    assert sr == 16000 and (d == s).all()


# ------------------------------------------------------------- Y4M codec


def test_y4m_roundtrip_444_and_mono():
    C = _wav_mod()
    fr = _pattern(6, 8, 3)[None].repeat(4, axis=0)
    fr = (fr + np.arange(4)[:, None, None, None] * 5).astype(np.uint8)
    payload = C.encode_y4m(fr, fps=(30, 1))
    assert C.sniff_format(payload) == "y4m"
    dec, meta = C.decode_y4m(payload)
    assert meta["fps"] == (30, 1) and meta["subsampling"] == "444"
    assert (dec == fr).all()
    mono = fr[:, :, :, :1]
    dm, mm = C.decode_y4m(C.encode_y4m(mono))
    assert mm["subsampling"] == "mono" and (dm == mono).all()


def test_y4m_420_constant_blocks_exact_and_frame_slicing():
    C = _wav_mod()
    rng = np.random.RandomState(3)
    fr = rng.randint(0, 255, (5, 4, 6, 3), dtype=np.uint8)
    # make chroma constant over 2x2 blocks so 420 is lossless
    for ch in (1, 2):
        half = fr[:, ::2, ::2, ch]
        fr[:, :, :, ch] = np.repeat(np.repeat(half, 2, axis=1), 2, axis=2)
    payload = C.encode_y4m(fr, subsampling="420")
    dec, meta = C.decode_y4m(payload)
    assert meta["subsampling"] == "420" and (dec == fr).all()
    assert C.y4m_frame_count(payload) == 5
    for i in (0, 2, 4):
        assert (C.decode_y4m_frame(payload, i) == fr[i]).all()
    with pytest.raises(IndexError):
        C.decode_y4m_frame(payload, 5)


def test_y4m_header_params_and_frame_params_tolerated():
    C = _wav_mod()
    y = bytes(range(12)) * 2  # 24 bytes = 6x4 mono
    payload = (
        b"YUV4MPEG2 W6 H4 F25:1 Ip A128:117 Cmono XYSCSS=MONO\n"
        + b"FRAME Xsome=param\n"
        + y
    )
    dec, meta = C.decode_y4m(payload)
    assert meta["width"] == 6 and meta["height"] == 4
    assert dec.shape == (1, 4, 6, 1)
    assert dec[0, :, :, 0].tobytes() == y


# ------------------------------------------- audio/video through multimodal


def test_real_decode_wav_stats():
    from carrot_transform_spark.operators.multimodal import real_decode

    C = _wav_mod()
    s = (np.arange(400, dtype=np.int16)).reshape(-1, 2)
    d = real_decode(C.encode_wav(s, 22050), "wav")
    assert d["n_frames"] == 200  # WAV frames = per-channel sample groups
    assert d["width"] == 2 and d["height"] == 22050
    assert (d["samples"] == s).all()


def test_real_decode_y4m_frame_at():
    from carrot_transform_spark.operators.multimodal import real_decode

    C = _wav_mod()
    fr = _pattern(4, 4, 3)[None].repeat(6, axis=0)
    fr = (fr + np.arange(6)[:, None, None, None] * 3).astype(np.uint8)
    d = real_decode(C.encode_y4m(fr), "y4m")
    assert d["n_frames"] == 6 and d["width"] == 4 and d["height"] == 4
    assert (d["pixels"] == fr[0]).all()
    one = d["frame_at"](3)
    dec1, meta1 = C.decode_y4m(one)
    assert dec1.shape[0] == 1 and (dec1[0] == fr[3]).all()


def test_sample_frames_real_codec_spark(spark):
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        real_decode,
        sample_frames,
    )

    C = _wav_mod()
    fr = _pattern(4, 6, 3)[None].repeat(7, axis=0)
    fr = (fr + np.arange(7)[:, None, None, None] * 2).astype(np.uint8)
    payload = C.encode_y4m(fr, fps=(24, 1))
    df = spark.createDataFrame([(1, payload)], "id long, raw binary")
    df = attach_payload_meta(df, "raw", "video", "y4m")
    out = sample_frames(df, every_n=3, decoder=real_decode).collect()
    assert sorted(r["frame_idx"] for r in out) == [0, 3, 6]
    for r in out:
        dec, _ = C.decode_y4m(bytes(r["payload"]))
        assert dec.shape[0] == 1 and (dec[0] == fr[r["frame_idx"]]).all()


def test_decode_stats_audio_video_spark(spark):
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        decode_stats,
        real_decode,
    )

    C = _wav_mod()
    wav = C.encode_wav((np.arange(600, dtype=np.int16)).reshape(-1, 3), 16000)
    y4m = C.encode_y4m(_pattern(5, 7, 3)[None].repeat(2, axis=0))
    df = spark.createDataFrame([(1, wav), (2, y4m)], "id long, raw binary")
    df = attach_payload_meta(df, "raw", "av", "mixed")
    got = {r["id"]: r for r in decode_stats(df, decoder=real_decode).collect()}
    assert got[1]["n_frames"] == 200 and got[1]["width"] == 3
    assert got[2]["n_frames"] == 2 and (got[2]["width"], got[2]["height"]) == (7, 5)
