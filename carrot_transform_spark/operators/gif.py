"""Dependency-free GIF codec (GIF87a/89a, LZW + palette) — pure stdlib
+ numpy.

Rounds out the image formats a web-scraped training corpus actually
contains (operators/codecs.py: BMP/PNG/netpbm/JPEG + this). Decode
covers global/local color tables, interlacing, transparency indices,
multi-frame animations with disposal methods 0/1 (draw-over), 2
(restore to background) and 3 (restore to previous — the pre-draw
screen is snapshotted and reinstated); frames composite onto the logical screen the
way a viewer would, so ``decode_gif_frames(payload)[i]`` is the i-th
DISPLAYED frame, not the raw sub-rectangle. LZW is the GIF variant
(LSB-first bit packing, variable 3..12-bit codes, clear/end codes,
4095-entry cap).

The encoder exists for tests and pipelines: indexed frames + palette ->
GIF89a with real LZW compression (dictionary + clear-code resets), so
round trips exercise the actual compressed path, and a hand-computed
stream in the tests pins the bit packing against the spec rather than
against this module's own inverse."""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


# ------------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first codes, width min_code+1..12."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    prev: bytes | None = None

    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte = bitpos >> 3
        code = int.from_bytes(data[byte : byte + 3], "little")
        code = (code >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise GifError("LZW stream ended before the frame was complete")
    return out[:n_pixels]


def _lzw_encode(indices: bytes, min_code: int) -> bytes:
    """GIF-variant LZW encoder (dictionary + clear-code reset at 4096)."""
    clear = 1 << min_code
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # 12-bit cap: never define code 4096
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------------- decode

_DEINTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def parse_gif(payload: bytes) -> dict:
    """One pass -> {width, height, frames:[{px_indices, palette, rect,
    transparent, disposal}], bg_index, global_palette}."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF")
    try:
        return _parse_gif_body(payload)
    except (IndexError, struct.error) as e:
        raise GifError(f"truncated or malformed GIF: {e}") from e


def _parse_gif_body(payload: bytes) -> dict:
    w, h = struct.unpack("<HH", payload[6:10])
    flags, bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    frames = []
    transparent = None
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                disposal = (data[0] >> 2) & 7
                transparent = data[3] if data[0] & 1 else None
            continue
        if b == 0x2C:  # image descriptor
            left, top, fw, fh = struct.unpack("<HHHH", payload[pos : pos + 8])
            iflags = payload[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise GifError("image has no color table")
            min_code = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            idx = np.frombuffer(
                _lzw_decode(data, min_code, fw * fh), np.uint8
            ).reshape(fh, fw)
            if iflags & 0x40:  # interlaced: reorder rows
                ordered = np.empty_like(idx)
                src = 0
                for start, step in _DEINTERLACE:
                    for row in range(start, fh, step):
                        ordered[row] = idx[src]
                        src += 1
                idx = ordered
            frames.append(
                {
                    "indices": idx,
                    "palette": pal,
                    "rect": (left, top, fw, fh),
                    "transparent": transparent,
                    "disposal": disposal,
                }
            )
            transparent = None
            disposal = 0
            continue
        raise GifError(f"unknown GIF block 0x{b:02X}")
    if not frames:
        raise GifError("GIF contains no image data")
    return {
        "width": int(w), "height": int(h), "frames": frames,
        "bg_index": bg, "global_palette": gct,
    }


def gif_frame_count(payload: bytes, meta: dict | None = None) -> int:
    return len((meta or parse_gif(payload))["frames"])


def decode_gif_frames(payload: bytes, meta: dict | None = None) -> list[np.ndarray]:
    """All frames as DISPLAYED (composited on the logical screen),
    each (H, W, 3) uint8."""
    meta = meta or parse_gif(payload)
    w, h = meta["width"], meta["height"]
    gct, bg = meta["global_palette"], meta["bg_index"]
    if gct is not None and bg < len(gct):
        screen = np.tile(gct[bg], (h, w, 1))
    else:
        screen = np.zeros((h, w, 3), np.uint8)
    out = []
    for fr in meta["frames"]:
        left, top, fw, fh = fr["rect"]
        pal, idx, tr = fr["palette"], fr["indices"], fr["transparent"]
        region = pal[np.minimum(idx, len(pal) - 1)]
        target = screen[top : top + fh, left : left + fw]
        if tr is not None:
            mask = (idx != tr)[..., None]
            region = np.where(mask, region, target)
        prev = screen if fr["disposal"] == 3 else None  # pre-draw snapshot
        screen = screen.copy()
        screen[top : top + fh, left : left + fw] = region
        out.append(screen.copy())
        if fr["disposal"] == 2:  # restore to background
            fill = gct[bg] if (gct is not None and bg < len(gct)) else 0
            screen[top : top + fh, left : left + fw] = fill
        elif fr["disposal"] == 3:  # restore to previous
            screen = prev
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """First displayed frame, (H, W, 3) uint8."""
    meta = parse_gif(payload)
    meta_first = dict(meta)
    meta_first["frames"] = meta["frames"][:1]
    return decode_gif_frames(payload, meta_first)[0]


# ----------------------------------------------------------------- encode


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    palette: np.ndarray,
    interlace_first: bool = False,
) -> bytes:
    """Indexed frames (each (H, W) uint8 into `palette` (N,3)) -> GIF89a.
    Multi-frame inputs become an animation (disposal 1, no delays)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise GifError("need at least one frame")
    h, w = frames[0].shape
    n_pal = len(palette)
    bits = max(1, (n_pal - 1).bit_length())
    table_n = 1 << bits
    pal_bytes = np.zeros((table_n, 3), np.uint8)
    pal_bytes[:n_pal] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag+size, bg=0, aspect
    out += pal_bytes.tobytes()

    min_code = max(2, bits)
    for fi, fr in enumerate(frames):
        if fr.shape != (h, w):
            raise GifError("all frames must share the logical screen size")
        out += b"\x21\xf9\x04" + bytes([0x04, 0, 0, 0]) + b"\x00"  # GCE disp=1
        iflags = 0x40 if (interlace_first and fi == 0) else 0
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
        idx = fr
        if iflags:  # write rows in interlace order
            rows = []
            for start, step in _DEINTERLACE:
                rows.extend(range(start, h, step))
            idx = fr[rows]
        out += bytes([min_code])
        data = _lzw_encode(idx.astype(np.uint8).tobytes(), min_code)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
