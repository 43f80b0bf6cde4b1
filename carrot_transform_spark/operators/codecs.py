"""Dependency-free image codecs (pure numpy + stdlib zlib/struct).

Closes the one deliberately-stubbed seam in the multimodal family
(operators/multimodal.real_decode): this container ships no PIL/ffmpeg, but
three public uncompressed-or-zlib formats are decodable from first
principles, which is enough to make the decode -> feature-extract -> resize
plumbing REAL end-to-end:

- BMP   : BITMAPINFOHEADER, uncompressed 8 (gray) / 24 (BGR) / 32 (BGRA)
          bit, bottom-up or top-down, 4-byte row padding
- PGM/PPM (netpbm): binary P5/P6, maxval <= 255, whitespace + '#' comments
- PNG   : 8-bit-depth grayscale (0) / RGB (2) / RGBA (6), all five scanline
          filters (None/Sub/Up/Average/Paeth), single IDAT stream, no
          interlace

Everything operates on ``np.ndarray`` of shape (H, W, C) dtype uint8 with
C in {1, 3, 4}. Encoders exist for all three formats so pipelines can
re-emit what they decoded; the PNG encoder writes filter-0 scanlines (the
decoder handles all filters, which is what matters for reading foreign
files).

Video/audio formats remain out of scope — ``decode_image`` raises
``NotImplementedError`` for unknown magics, the single remaining seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- sniffing


def sniff_format(payload: bytes) -> str | None:
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    return None


# ------------------------------------------------------------------- netpbm


def _pnm_tokens(payload: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens, skipping '#' comments."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    # a single whitespace after maxval precedes the raster; tolerate CRLF
    # (text-mode Windows writers) as one separator — the strict-spec read
    # would take the \n as the first raster byte, which no real writer means
    if payload[i : i + 2] == b"\r\n":
        return vals, i + 2
    return vals, i + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    channels = 1 if magic == b"P5" else 3
    (w, h, maxval), off = _pnm_tokens(payload, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=off)
    return raster.reshape(h, w, channels).copy()


def encode_pnm(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    if c == 1:
        magic = b"P5"
    elif c == 3:
        magic = b"P6"
    else:
        raise ValueError("netpbm supports 1 or 3 channels")
    header = magic + f"\n{w} {h}\n255\n".encode()
    return header + pixels.astype(np.uint8).tobytes()


# --------------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    channels = bpp // 8
    stride = (w * channels + 3) & ~3  # rows padded to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * channels]
    img = rows.reshape(h, w, channels)
    if not top_down:
        img = img[::-1]
    if channels >= 3:
        # stored BGR(A) -> RGB(A)
        img = img[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
        return np.ascontiguousarray(img)
    # 8-bit = palette-indexed: map indices through the BGRX color table
    # (between the headers and the raster). A grayscale-identity palette —
    # what encode_bmp writes — stays single-channel; anything else expands
    # to RGB so indexed-color exports decode to real pixel values
    n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
    pal_off = 14 + hdr_size
    pal = np.frombuffer(
        payload, dtype=np.uint8, count=n_colors * 4, offset=pal_off
    ).reshape(n_colors, 4)
    idx = img[:, :, 0]
    if n_colors == 256 and (pal[:, 0] == pal[:, 1]).all() and (
        pal[:, 1] == pal[:, 2]
    ).all() and (pal[:, 0] == np.arange(256)).all():
        return np.ascontiguousarray(idx[:, :, None])
    rgb = pal[idx][:, :, [2, 1, 0]]  # BGRX -> RGB lookup
    return np.ascontiguousarray(rgb)


def encode_bmp(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    if c == 3:
        raster = pixels[:, :, [2, 1, 0]]  # RGB -> BGR
    elif c == 4:
        raster = pixels[:, :, [2, 1, 0, 3]]
    elif c == 1:
        raster = pixels
    else:
        raise ValueError("BMP supports 1, 3 or 4 channels")
    stride = (w * c + 3) & ~3
    pad = stride - w * c
    body = bytearray()
    for row in raster[::-1]:  # bottom-up
        body += row.astype(np.uint8).tobytes() + b"\0" * pad
    palette = b""
    if c == 1:  # 8-bit needs a grayscale palette
        palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_offset = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, c * 8, 0, len(body), 2835, 2835,
        256 if c == 1 else 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", data_offset + len(body), 0, 0, data_offset)
    return file_hdr + info + palette + bytes(body)


# --------------------------------------------------------------------- PNG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"bit depth {bit_depth} not supported (8 only)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"color type {color_type} not supported")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            # exact vectorization: each channel lane is an independent
            # prefix sum mod 256 (Average/Paeth below stay per-byte — their
            # left-neighbor dependency doesn't reduce to a scan; foreign
            # PNGs using them decode correctly, just not at array speed)
            recon = (
                line.reshape(-1, bpp).cumsum(axis=0).reshape(stride) & 0xFF
            )
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = int(recon[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = recon.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError("PNG supports 1, 3 or 4 channels")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raster = pixels.astype(np.uint8)
    scanlines = b"".join(b"\0" + raster[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


# ------------------------------------------------------------ entry points


def decode_image(payload: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode to (H, W, C) uint8. Format sniffed from magic bytes; the
    declared ``fmt`` is only a fallback hint for headerless cases (none
    currently). Unknown formats raise NotImplementedError — the one
    remaining seam (video/audio and compressed image formats)."""
    sniffed = sniff_format(payload)
    if sniffed == "bmp":
        return decode_bmp(payload)
    if sniffed == "png":
        return decode_png(payload)
    if sniffed == "pnm":
        return decode_pnm(payload)
    raise NotImplementedError(
        f"no dependency-free decoder for format {fmt or 'unknown'!r}; "
        "supported: bmp, png (8-bit, non-interlaced), pgm/ppm"
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt in ("pnm", "pgm", "ppm"):
        return encode_pnm(pixels)
    raise NotImplementedError(f"no encoder for format {fmt!r}")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index mapping (no interpolation
    libs). Deterministic: source index = floor((i + 0.5) * in/out)."""
    h, w, _c = pixels.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[ys][:, xs]
