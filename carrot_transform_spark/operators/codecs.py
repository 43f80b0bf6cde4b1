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

Audio and video are covered by two more dependency-free formats:

- WAV : RIFF/WAVE PCM 8 (uint8) / 16 / 24 / 32-bit and IEEE float32,
        any channel count, proper chunk walk (word-aligned sizes, unknown
        chunks skipped) -> (n_samples, channels) array + sample rate
- Y4M : YUV4MPEG2 uncompressed video, C420* / C422 / C444 / Cmono
        subsampling, per-frame O(1) slicing (header arithmetic, no full
        materialisation) -> (H, W, 1|3) uint8 frames, chroma
        nearest-upsampled to full resolution

- JPEG: baseline sequential (SOF0/1) AND progressive (SOF2, spectral
        selection + successive approximation) via operators/jpeg.py —
        grayscale / 4:4:4 / 4:2:2 / 4:2:0, restart intervals, EOBRUN
- GIF : 87a/89a via operators/gif.py — LZW, global/local color tables,
        interlace, transparency, animation with frame compositing

``decode_image`` still raises ``NotImplementedError`` for unknown magics.
MP4 (ISO-BMFF walk, operators/mp4.py) and MP3 (frame-header walk,
operators/mp3.py) are metadata/container-level: duration, frame counts,
bitrates, and real MJPEG sample extraction from MP4 — but AVC/HEVC and
mp3 PCM pixel/sample decode raise NotImplementedError (the remaining
out-of-scope set: formats needing a full entropy/DSP stack).
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
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3":
        return "mp3"
    if len(payload) >= 4 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        # MPEG audio frame sync (11 set bits) with a valid layer field
        if (payload[1] >> 1) & 3 != 0:
            return "mp3"
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
    # i is the single whitespace separator preceding the raster; the caller
    # decides whether a following \r\n counts as one separator (CRLF
    # tolerance needs the raster length to disambiguate a lone-\r separator
    # whose first raster byte happens to be 0x0A)
    return vals, i


def _pnm_raster_offset(payload: bytes, sep: int, raster_len: int) -> int:
    """Offset of the raster after the separator at ``sep``.

    Spec: exactly ONE whitespace byte separates maxval from the raster.
    Text-mode Windows writers emit \\r\\n there; tolerate it as one
    separator — but only when the strict-spec read would NOT yield an
    exact-length raster, so a spec-valid file with a lone '\\r' separator
    and a first raster byte of 0x0A keeps its pixel."""
    if (
        payload[sep : sep + 2] == b"\r\n"
        and len(payload) - (sep + 1) != raster_len
    ):
        return sep + 2
    return sep + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    channels = 1 if magic == b"P5" else 3
    (w, h, maxval), sep = _pnm_tokens(payload, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    n = w * h * channels
    off = _pnm_raster_offset(payload, sep, n)
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
    if sniffed == "jpeg":
        from carrot_transform_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if sniffed == "gif":
        from carrot_transform_spark.operators.gif import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        f"no dependency-free decoder for format {fmt or 'unknown'!r}; "
        "supported: bmp, png (8-bit, non-interlaced), pgm/ppm, "
        "jpeg (baseline sequential)"
    )


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt in ("pnm", "pgm", "ppm"):
        return encode_pnm(pixels)
    if fmt in ("jpeg", "jpg"):
        from carrot_transform_spark.operators.jpeg import encode_jpeg

        return encode_jpeg(pixels)
    raise NotImplementedError(f"no encoder for format {fmt!r}")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index mapping (no interpolation
    libs). Deterministic: source index = floor((i + 0.5) * in/out)."""
    h, w, _c = pixels.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[ys][:, xs]


# --------------------------------------------------------------------- WAV


def _wav_chunks(payload: bytes):
    """Walk RIFF chunks: yields (fourcc, offset, size). Chunk sizes are
    word-aligned on disk (odd sizes carry a pad byte, RIFF spec)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while i + 8 <= end:
        fourcc = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)  # odd chunk sizes are padded to a word


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM / IEEE-float WAV to ((n_samples, channels), sample_rate).

    dtypes: 8-bit -> uint8 (unsigned per spec), 16/32-bit -> int16/int32,
    24-bit -> int32 (sign-extended), float -> float32. Unknown chunks
    (LIST, fact, cue, ...) are skipped by the chunk walk."""
    fmt = None
    data = None
    for fourcc, off, size in _wav_chunks(payload):
        if fourcc == b"fmt " and fmt is None:
            audio_format, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, off
            )
            bits = struct.unpack_from("<H", payload, off + 14)[0]
            if audio_format == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_format = struct.unpack_from("<H", payload, off + 24)[0]
            fmt = (audio_format, channels, sample_rate, bits)
        elif fourcc == b"data" and data is None:
            data = payload[off : off + size]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, bits = fmt
    if channels <= 0:
        raise ValueError("WAV with zero channels")
    if audio_format == 3:  # IEEE float
        if bits != 32:
            raise ValueError(f"float{bits} WAV not supported")
        arr = np.frombuffer(data, dtype="<f4")
    elif audio_format == 1:  # PCM
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8)
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2")
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4")
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8)
            raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3).astype(np.int32)
            arr = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            arr = (arr << 8) >> 8  # sign-extend bit 23
        else:
            raise ValueError(f"{bits}-bit PCM WAV not supported")
    else:
        raise ValueError(f"WAV audio format {audio_format} not supported")
    n = len(arr) - len(arr) % channels
    return arr[:n].reshape(-1, channels).copy(), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (n_samples, channels) to WAV. uint8 -> PCM8, int16 -> PCM16,
    int32 -> PCM32, float32 -> IEEE float."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    dt = samples.dtype
    if dt == np.uint8:
        audio_format, bits = 1, 8
        body = samples.astype(np.uint8).tobytes()
    elif dt == np.int16:
        audio_format, bits = 1, 16
        body = samples.astype("<i2").tobytes()
    elif dt == np.int32:
        audio_format, bits = 1, 32
        body = samples.astype("<i4").tobytes()
    elif dt == np.float32:
        audio_format, bits = 3, 32
        body = samples.astype("<f4").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {dt}")
    block_align = channels * bits // 8
    fmt_body = struct.pack(
        "<HHIIHH",
        audio_format,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# --------------------------------------------------------------------- Y4M


def parse_y4m_header(payload: bytes) -> dict:
    """Parse the YUV4MPEG2 stream header. Returns width/height/fps/
    subsampling/frame_size/data_offset (first FRAME marker)."""
    nl = payload.find(b"\n")
    if nl < 0 or payload[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps = (25, 1)
    sub = "420"
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == b"C":
            # C420jpeg/C420mpeg2/C420paldv share 2x2 chroma geometry
            sub = "420" if val.startswith("420") else val
        # Ip/A/X params don't affect the raster layout
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if sub == "420":
        frame_size = w * h + 2 * ((w + 1) // 2) * ((h + 1) // 2)
    elif sub == "422":
        frame_size = w * h + 2 * ((w + 1) // 2) * h
    elif sub == "444":
        frame_size = 3 * w * h
    elif sub == "mono":
        frame_size = w * h
    else:
        raise ValueError(f"Y4M chroma mode C{sub} not supported")
    return {
        "width": w,
        "height": h,
        "fps": fps,
        "subsampling": sub,
        "frame_size": frame_size,
        "data_offset": nl + 1,
    }


def _y4m_frame_offsets(payload: bytes, meta: dict):
    """Yield (frame_index, plane_data_offset). FRAME markers may carry
    parameters up to their own newline; frames are fixed-size after it."""
    i = meta["data_offset"]
    idx = 0
    size = meta["frame_size"]
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {i}")
        nl = payload.find(b"\n", i)
        if nl < 0:
            raise ValueError("truncated FRAME header")
        yield idx, nl + 1
        i = nl + 1 + size
        idx += 1


def y4m_frame_count(payload: bytes, meta: dict | None = None) -> int:
    meta = meta or parse_y4m_header(payload)
    return sum(1 for _ in _y4m_frame_offsets(payload, meta))


def _y4m_planes_to_frame(buf: np.ndarray, meta: dict) -> np.ndarray:
    """One frame's plane bytes -> (H, W, 1|3) uint8, chroma
    nearest-upsampled to full resolution."""
    w, h, sub = meta["width"], meta["height"], meta["subsampling"]
    y = buf[: w * h].reshape(h, w)
    if sub == "mono":
        return y[:, :, None].copy()
    if sub == "420":
        cw, ch = (w + 1) // 2, (h + 1) // 2
    elif sub == "422":
        cw, ch = (w + 1) // 2, h
    else:  # 444
        cw, ch = w, h
    u = buf[w * h : w * h + cw * ch].reshape(ch, cw)
    v = buf[w * h + cw * ch : w * h + 2 * cw * ch].reshape(ch, cw)
    if (cw, ch) != (w, h):
        # nearest-neighbor chroma upsample via integer index maps
        xi = (np.arange(w) * cw) // w
        yi = (np.arange(h) * ch) // h
        u = u[yi][:, xi]
        v = v[yi][:, xi]
    return np.stack([y, u, v], axis=2).copy()


def decode_y4m_frame(payload: bytes, index: int, meta: dict | None = None) -> np.ndarray:
    """O(frames-scanned) random access to one frame — header arithmetic +
    one plane reshape; nothing else is materialised."""
    meta = meta or parse_y4m_header(payload)
    for idx, off in _y4m_frame_offsets(payload, meta):
        if idx == index:
            buf = np.frombuffer(payload, dtype=np.uint8, count=meta["frame_size"], offset=off)
            return _y4m_planes_to_frame(buf, meta)
    raise IndexError(f"frame {index} out of range")


def decode_y4m(payload: bytes) -> tuple[np.ndarray, dict]:
    """All frames -> (n_frames, H, W, 1|3) uint8 + header meta."""
    meta = parse_y4m_header(payload)
    frames = [
        _y4m_planes_to_frame(
            np.frombuffer(payload, dtype=np.uint8, count=meta["frame_size"], offset=off),
            meta,
        )
        for _, off in _y4m_frame_offsets(payload, meta)
    ]
    if not frames:
        ch = 1 if meta["subsampling"] == "mono" else 3
        return np.zeros((0, meta["height"], meta["width"], ch), np.uint8), meta
    return np.stack(frames), meta


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), subsampling: str | None = None
) -> bytes:
    """Encode (n_frames, H, W, 1|3) uint8 -> Y4M. 1 channel -> Cmono;
    3 channels -> C444 by default or C420jpeg with 2x2 box-mean
    downsampling when subsampling='420' (exact for 2x2-constant chroma)."""
    n, h, w, c = frames.shape
    if c == 1:
        sub = "mono"
    elif subsampling in (None, "444"):
        sub = "444"
    elif subsampling == "420":
        sub = "420jpeg"
    else:
        raise ValueError(f"unsupported encode subsampling {subsampling!r}")
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{sub}\n".encode()
    out = bytearray(header)
    for f in frames.astype(np.uint8):
        out += b"FRAME\n"
        out += f[:, :, 0].tobytes()
        if c == 3:
            u, v = f[:, :, 1], f[:, :, 2]
            if sub == "420jpeg":
                # 2x2 box mean (pad odd edges by replication)
                if h & 1:
                    u = np.vstack([u, u[-1:]])
                    v = np.vstack([v, v[-1:]])
                if w & 1:
                    u = np.hstack([u, u[:, -1:]])
                    v = np.hstack([v, v[:, -1:]])
                u = u.reshape(u.shape[0] // 2, 2, u.shape[1] // 2, 2).mean((1, 3))
                v = v.reshape(v.shape[0] // 2, 2, v.shape[1] // 2, 2).mean((1, 3))
                u = np.round(u).astype(np.uint8)
                v = np.round(v).astype(np.uint8)
            out += u.tobytes() + v.tobytes()
    return bytes(out)
