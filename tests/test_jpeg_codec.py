"""Baseline JPEG codec (operators/jpeg.py) — VERDICT r11 task 4: the one
compressed image format reachable without ffmpeg/PIL.

Verification strategy (no reference JPEG binary exists in the container):
- encode->decode round trips must land within quantization error of the
  source for smooth images, across quality levels, subsampling modes,
  restart intervals, grayscale, and non-multiple-of-8 sizes — the FDCT/
  Huffman-write and IDCT/Huffman-read paths check each other;
- the DCT basis is validated against numpy's direct O(N^4) DCT-II sum
  (independent math, no shared code path);
- committed fixtures in tests/data/mm/golden.json pin payload AND decoded
  pixel checksums (decode is deterministic even though lossy), so codec
  drift fails loudly (test_real_codec.test_committed_golden_decodes);
- byte-level container checks: stuffing (no bare 0xFF inside entropy
  data), marker layout, DRI emission;
- error paths: progressive SOF2, truncated payloads, garbage.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from carrot_transform_spark.operators.jpeg import (
    _A,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(h, w, c):
    y, x = np.mgrid[0:h, 0:w]
    chans = [
        np.clip(x * 255.0 / max(w - 1, 1), 0, 255),
        np.clip(y * 255.0 / max(h - 1, 1), 0, 255),
        np.clip((x + y) * 255.0 / max(h + w - 2, 1), 0, 255),
    ]
    return np.stack(chans[:c], axis=-1).astype(np.uint8)


# ------------------------------------------------------------- DCT basis


def test_dct_basis_matches_direct_sum():
    rng = np.random.default_rng(3)
    blk = rng.uniform(-128, 127, (8, 8))
    coef = _A @ blk @ _A.T
    direct = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            s = 0.0
            for yy in range(8):
                for xx in range(8):
                    s += (
                        blk[yy, xx]
                        * np.cos((2 * yy + 1) * u * np.pi / 16)
                        * np.cos((2 * xx + 1) * v * np.pi / 16)
                    )
            direct[u, v] = cu * cv * s
    assert np.abs(coef - direct).max() < 1e-9
    # orthonormal: IDCT inverts exactly
    assert np.abs(_A.T @ coef @ _A - blk).max() < 1e-9


# ----------------------------------------------------------- round trips


@pytest.mark.parametrize("quality,tol", [(95, 4), (85, 6), (60, 10)])
def test_roundtrip_rgb_444(quality, tol):
    img = _smooth(37, 53, 3)
    out = decode_jpeg(encode_jpeg(img, quality))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_roundtrip_420_and_restart():
    img = _smooth(35, 41, 3)  # not multiples of the 16px MCU
    for ri in (0, 2, 7):
        out = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri, subsampling="420"))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_roundtrip_grayscale_and_odd_sizes():
    for h, w in [(8, 8), (1, 1), (9, 17), (16, 5)]:
        img = _smooth(h, w, 3)[..., :1]
        out = decode_jpeg(encode_jpeg(img, 92))
        assert out.shape == (h, w, 1)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_flat_image_is_tiny_and_exact():
    img = np.full((24, 24, 3), 77, dtype=np.uint8)
    data = encode_jpeg(img, 85)
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    assert len(data) < 700  # all-EOB blocks compress to almost nothing


def test_noise_image_bounded_error():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, 95))
    # noise is the worst case; just bound the mean reconstruction error
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 16


# ------------------------------------------------------------- container


def test_entropy_stream_is_stuffed():
    data = encode_jpeg(_smooth(32, 32, 3), 90)
    sos = data.index(b"\xff\xda")
    scan = data[sos + 2 + struct.unpack(">H", data[sos + 2 : sos + 4])[0] : -2]
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            assert scan[i + 1] in (0x00,) or 0xD0 <= scan[i + 1] <= 0xD7, (
                f"bare marker byte 0xFF{scan[i + 1]:02X} inside entropy data"
            )
            i += 2
        else:
            i += 1


def test_dri_marker_emitted_only_when_requested():
    img = _smooth(24, 24, 3)
    assert b"\xff\xdd" not in encode_jpeg(img, 90)
    data = encode_jpeg(img, 90, restart_interval=2)
    at = data.index(b"\xff\xdd")
    assert struct.unpack(">H", data[at + 4 : at + 6])[0] == 2
    assert any(bytes([0xFF, 0xD0 + k]) in data for k in range(8))


# ------------------------------------------------------------ error paths


def test_sof_marker_handling():
    img = _smooth(16, 16, 3)
    data = bytearray(encode_jpeg(img, 90))
    sof = data.index(b"\xff\xc0")
    # SOF2 (progressive) is a supported process now; a full-band single
    # scan under the SOF2 marker decodes identically to the SOF0 stream
    data[sof + 1] = 0xC2
    assert (decode_jpeg(bytes(data)) == decode_jpeg(bytes(encode_jpeg(img, 90)))).all()
    # lossless (SOF3) stays cleanly rejected
    data[sof + 1] = 0xC3
    with pytest.raises(JpegError, match="unsupported JPEG process"):
        decode_jpeg(bytes(data))


def test_garbage_and_truncation_rejected():
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg at all")
    data = encode_jpeg(_smooth(16, 16, 3), 90)
    with pytest.raises(JpegError):
        decode_jpeg(data[:20])  # headers cut off -> no scan


def test_malformed_segments_raise_jpegerror():
    """Every malformed-payload path raises JpegError — the type the
    decode-stats error columns classify on — never a bare StopIteration
    or struct.error (ADVICE r12)."""
    data = bytearray(encode_jpeg(_smooth(16, 16, 3), 90))

    # SOS referencing an undefined component id
    sos = bytes(data).index(b"\xff\xda")
    bad = bytearray(data)
    bad[sos + 5] = 0x77  # first scan component id -> unknown
    with pytest.raises(JpegError, match="undefined component id"):
        decode_jpeg(bytes(bad))

    # truncated SOF segment (length claims more than present)
    sof = bytes(data).index(b"\xff\xc0")
    bad = bytearray(data[: sof + 7])  # cut inside the SOF body
    with pytest.raises(JpegError):
        decode_jpeg(bytes(bad))

    # DRI with an empty body
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8" + b"\xff\xdd\x00\x02" + b"\xff\xd9")

    # SOS segment shorter than its component list claims
    bad = b"\xff\xd8" + bytes(data[sof : sos + 4]) + b"\x03" + b"\xff\xd9"
    with pytest.raises(JpegError):
        decode_jpeg(bytes(bad))


def test_unsupported_inputs_rejected():
    with pytest.raises(JpegError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
    with pytest.raises(JpegError):
        encode_jpeg(np.zeros((4, 4, 3), dtype=np.uint8), subsampling="422")


# ----------------------------------------------------- dispatch + Spark leg


def test_codecs_dispatch_jpeg():
    from carrot_transform_spark.operators.codecs import (
        decode_image,
        encode_image,
        sniff_format,
    )

    img = _smooth(12, 10, 3)
    data = encode_image(img, "jpeg")
    assert sniff_format(data) == "jpeg"
    out = decode_image(data)
    assert out.shape == img.shape
    # encode_image uses the default quality; a 10px-wide ramp is steep
    # (~28/px), so the bound is looser than the dedicated q-level tests
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 14


def test_jpeg_decode_stats_spark_leg(spark):
    """mapInPandas decode-stats over real JPEG payloads (the mm pipeline's
    fast path) — dims and byte counts come back exact per row."""
    from carrot_transform_spark.operators.multimodal import (
        attach_payload_meta,
        decode_stats,
        real_decode,
    )

    specs = [(1, 9, 14, 3, "444"), (2, 11, 16, 3, "420"), (3, 8, 12, 1, "444")]
    rows = []
    for i, h, w, c, ss in specs:
        payload = encode_jpeg(_smooth(h, w, c), 90, subsampling=ss)
        rows.append((i, payload))
    df = spark.createDataFrame(rows, "id long, raw binary")
    df = attach_payload_meta(df, "raw", "image", "jpeg")
    got = {r["id"]: r for r in decode_stats(df, decoder=real_decode).collect()}
    for i, h, w, _c, _ss in specs:
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert got[i]["n_frames"] == 1


# ---------------------------------------------------------- progressive


def _prog_pair(img, q=90):
    from carrot_transform_spark.operators.jpeg import encode_jpeg_progressive

    return (
        decode_jpeg(encode_jpeg_progressive(img, q)),
        decode_jpeg(encode_jpeg(img, q)),
    )


@pytest.mark.parametrize(
    "shape", [(37, 53, 3), (8, 8, 3), (9, 17, 1), (16, 5, 3)]
)
def test_progressive_decode_matches_baseline_exactly(shape):
    """The strongest check available without an external codec: the
    progressive scan script (SA Al=1->0 + spectral splits) and the
    baseline single scan carry the SAME quantized coefficients, so the
    two decodes must be bit-identical."""
    h, w, c = shape
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(x * 7 + y * 3) % 256, (y * 5) % 256, ((x + y) * 11) % 256][:c], axis=-1
    ).astype(np.uint8)
    prog, base = _prog_pair(img)
    assert (prog == base).all()


def test_progressive_noise_and_sparse_exact():
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    prog, base = _prog_pair(noise, 92)
    assert (prog == base).all()  # heavy correction-bit + ZRL traffic
    sparse = np.zeros((32, 32, 3), np.uint8)
    sparse[5, 7] = 255
    sparse[20, 25] = 128
    prog, base = _prog_pair(sparse, 85)
    assert (prog == base).all()  # long zero runs: ZRL + per-block EOB


def test_progressive_reconstruction_quality():
    img = _smooth(37, 53, 3)
    from carrot_transform_spark.operators.jpeg import encode_jpeg_progressive

    out = decode_jpeg(encode_jpeg_progressive(img, 90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6


def test_progressive_eobrun_multiblock():
    """EOBRUN > 1 decoding (our encoder caps runs at one block because
    the Annex-K tables lack the run symbols, so this path needs a
    hand-crafted scan): a custom AC table with the 0x20 symbol encodes
    'four blocks end-of-band' in one token; all four blocks of the
    16x16 gray image must come back DC-only."""
    from carrot_transform_spark.operators.jpeg import (
        _BitWriter,
        _build_encode_table,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
    )

    # custom AC table: symbols 0x20 (EOBRUN, r=2) and 0x01 at short codes
    ac_bits = [0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x20, 0x01]
    dc_enc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _build_encode_table(ac_bits, ac_vals)

    out = bytearray(b"\xff\xd8")
    q = bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 16, 16, 1) + bytes([1, 0x11, 0])
    out += (
        b"\xff\xc4" + struct.pack(">H", 19 + len(DC_LUMA_VALS)) + b"\x00"
        + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    )
    out += (
        b"\xff\xc4" + struct.pack(">H", 19 + len(ac_vals)) + b"\x10"
        + bytes(ac_bits) + bytes(ac_vals)
    )
    # scan 1: DC first Al=0 — DC diffs 40, 0, 0, 0 (pred carries)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 0, 0x00])
    bw = _BitWriter()
    for diff in (40, 0, 0, 0):
        t = abs(diff).bit_length()
        code, ln = dc_enc[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out += bw.out
    # scan 2: AC first band 1..63 — ONE token: EOBRUN r=2 + 2 extension
    # bits (0b11) = (1<<2) + 3 = 7 >= 4 blocks, all end-of-band
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 1, 63, 0x00])
    bw = _BitWriter()
    code, ln = ac_enc[0x20]
    bw.write(code, ln)
    bw.write(0b11, 2)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"

    px = decode_jpeg(bytes(out))
    assert px.shape == (16, 16, 1)
    # DC 40 with q=1: spatial value = 40/8 + 128 = 133 everywhere
    assert (px == 133).all()
