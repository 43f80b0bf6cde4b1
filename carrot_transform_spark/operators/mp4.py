"""Dependency-free ISO-BMFF (MP4/QuickTime) container walk — pure stdlib.

The container layer of the one remaining mainstream video format
(VERDICT r12 task 4): parse ``moov/trak/mdia/minf/stbl`` to report
codec fourcc, duration, frame count and per-sample (offset, size)
pairs, and EXTRACT samples. Motion-JPEG tracks ('jpeg'/'mjpa'/'mjpb'
sample entries) yield real standalone JPEG payloads decodable by
operators/jpeg.py — same O(1)-per-frame discipline as the AVI walk
(operators/avi.py): one container pass builds the sample index, frame
extraction slices bytes without touching other frames. AVC/HEVC pixel
decode stays a clean NotImplementedError (a full entropy/DSP stack is
out of scope per the module contract in operators/codecs.py).

Box layout is public (ISO/IEC 14496-12 "ISO base media file format").
Sample positions come from the standard stsc/stco/stsz reconstruction:
stco gives chunk start offsets, stsc maps chunk runs to
samples-per-chunk, stsz gives each sample's size; a sample's offset is
its chunk's start plus the sizes of the samples before it in that
chunk. ``encode_mp4_mjpeg`` writes the minimal standards-shaped file
(ftyp + mdat + moov with a single 'vide' trak) so tests and pipelines
can mint real MJPEG-in-MP4 bytes in-container.

No reference counterpart (the reference engine has no multimodal layer).
"""

from __future__ import annotations

import struct

import numpy as np


class Mp4Error(ValueError):
    """Malformed or unsupported ISO-BMFF payload."""


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise Mp4Error(msg)


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}
_MJPEG_CODECS = {"jpeg", "mjpa", "mjpb"}


def _boxes(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        fourcc = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            _expect(pos + 16 <= end, "truncated largesize box header")
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        _expect(size >= body - pos, f"bad box size in {fourcc!r}")
        _expect(pos + size <= end, f"box {fourcc!r} overruns its parent")
        yield fourcc, body, pos + size
        pos += size


def _fullbox(payload: bytes, body: int) -> tuple[int, int]:
    """(version, body-after-version/flags offset)."""
    return payload[body], body + 4


def _parse_stsd(payload: bytes, body: int, end: int) -> dict:
    _, p = _fullbox(payload, body)
    (n,) = struct.unpack(">I", payload[p : p + 4])
    _expect(n >= 1, "empty stsd")
    entry = p + 4
    (esize,) = struct.unpack(">I", payload[entry : entry + 4])
    fourcc = payload[entry + 4 : entry + 8].decode("latin1")
    # VisualSampleEntry: 6 reserved + 2 data_ref_index, 2+2 pre_defined/
    # reserved, 12 pre_defined, then width/height uint16 (14496-12 §12.1.3)
    w = h = 0
    if entry + 36 <= end and esize >= 36:
        w, h = struct.unpack(">HH", payload[entry + 32 : entry + 36])
    return {"codec": fourcc, "width": int(w), "height": int(h)}


def _u32s(payload: bytes, p: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", payload[p : p + 4 * n]))


def _sample_index(stsc, stco, sizes) -> list[tuple[int, int]]:
    """The standard stsc/stco/stsz walk -> [(offset, size)] per sample."""
    out: list[tuple[int, int]] = []
    si = 0
    n_chunks = len(stco)
    for run_idx, (first, per_chunk, _desc) in enumerate(stsc):
        last = stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            off = stco[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    return out
                out.append((off, sizes[si]))
                off += sizes[si]
                si += 1
    return out


def parse_mp4(payload: bytes) -> dict:
    """One-pass box walk -> {codec, width, height, fps, duration_s,
    n_frames, frames: [(off, sz)], brand}. Picks the first 'vide' track;
    audio-only files report their first track with n_frames=0 frames."""
    _expect(len(payload) >= 12 and payload[4:8] == b"ftyp", "not an ISO-BMFF file")
    brand = payload[8:12].decode("latin1")

    best: dict | None = None
    mvhd_dur = mvhd_ts = 0

    def walk_trak(body: int, end: int) -> dict:
        trak: dict = {"handler": "", "timescale": 0, "duration": 0,
                      "stsd": {}, "stts": [], "stsc": [], "stco": [], "stsz": []}

        def walk(b: int, e: int) -> None:
            for fourcc, bb, be in _boxes(payload, b, e):
                if fourcc in _CONTAINERS:
                    walk(bb, be)
                elif fourcc == b"mdhd":
                    v, p = _fullbox(payload, bb)
                    if v == 1:
                        ts, dur = struct.unpack(">IQ", payload[p + 16 : p + 28])
                    else:
                        ts, dur = struct.unpack(">II", payload[p + 8 : p + 16])
                    trak["timescale"], trak["duration"] = ts, dur
                elif fourcc == b"hdlr":
                    trak["handler"] = payload[bb + 8 : bb + 12].decode("latin1")
                elif fourcc == b"stsd":
                    trak["stsd"] = _parse_stsd(payload, bb, be)
                elif fourcc == b"stts":
                    _, p = _fullbox(payload, bb)
                    (n,) = struct.unpack(">I", payload[p : p + 4])
                    v = _u32s(payload, p + 4, 2 * n)
                    trak["stts"] = list(zip(v[0::2], v[1::2]))
                elif fourcc == b"stsc":
                    _, p = _fullbox(payload, bb)
                    (n,) = struct.unpack(">I", payload[p : p + 4])
                    v = _u32s(payload, p + 4, 3 * n)
                    trak["stsc"] = list(zip(v[0::3], v[1::3], v[2::3]))
                elif fourcc in (b"stco", b"co64"):
                    _, p = _fullbox(payload, bb)
                    (n,) = struct.unpack(">I", payload[p : p + 4])
                    if fourcc == b"stco":
                        trak["stco"] = _u32s(payload, p + 4, n)
                    else:
                        trak["stco"] = list(
                            struct.unpack(f">{n}Q", payload[p + 4 : p + 4 + 8 * n])
                        )
                elif fourcc == b"stsz":
                    _, p = _fullbox(payload, bb)
                    const, n = struct.unpack(">II", payload[p : p + 8])
                    trak["stsz"] = [const] * n if const else _u32s(payload, p + 8, n)

        walk(body, end)
        return trak

    def walk_top(b: int, e: int) -> None:
        nonlocal best, mvhd_dur, mvhd_ts
        for fourcc, bb, be in _boxes(payload, b, e):
            if fourcc == b"moov":
                walk_top(bb, be)
            elif fourcc == b"mvhd":
                v, p = _fullbox(payload, bb)
                if v == 1:
                    mvhd_ts, mvhd_dur = struct.unpack(">IQ", payload[p + 16 : p + 28])
                else:
                    mvhd_ts, mvhd_dur = struct.unpack(">II", payload[p + 8 : p + 16])
            elif fourcc == b"trak":
                t = walk_trak(bb, be)
                if best is None or (
                    t["handler"] == "vide" and best["handler"] != "vide"
                ):
                    best = t

    walk_top(0, len(payload))
    _expect(best is not None, "no trak box found")
    t = best

    frames = _sample_index(t["stsc"], t["stco"], t["stsz"])
    n_frames = len(frames)
    dur_s = t["duration"] / t["timescale"] if t["timescale"] else (
        mvhd_dur / mvhd_ts if mvhd_ts else 0.0
    )
    n_samples = sum(c for c, _ in t["stts"]) or n_frames
    fps = n_samples / dur_s if dur_s else 0.0
    return {
        "brand": brand,
        "codec": t["stsd"].get("codec", ""),
        "width": t["stsd"].get("width", 0),
        "height": t["stsd"].get("height", 0),
        "duration_s": round(dur_s, 6),
        "fps": round(fps, 6),
        "n_frames": n_frames if t["handler"] == "vide" else 0,
        "frames": frames if t["handler"] == "vide" else [],
    }


def mp4_frame_count(payload: bytes, meta: dict | None = None) -> int:
    return len((meta or parse_mp4(payload))["frames"])


def mp4_frame_payload(payload: bytes, index: int, meta: dict | None = None) -> bytes:
    """Sample `index`'s raw bytes — a real standalone JPEG for MJPEG
    tracks; for AVC/HEVC it is the length-prefixed NAL sample (extractable
    but not pixel-decodable here)."""
    meta = meta or parse_mp4(payload)
    off, sz = meta["frames"][index]
    _expect(off + sz <= len(payload), "sample overruns the file")
    return payload[off : off + sz]


def decode_mp4_frame(
    payload: bytes, index: int, meta: dict | None = None
) -> np.ndarray:
    """Pixels of frame `index` — MJPEG tracks only; compressed AVC/HEVC
    raise NotImplementedError (the documented codec seam)."""
    meta = meta or parse_mp4(payload)
    if meta["codec"] not in _MJPEG_CODECS:
        raise NotImplementedError(
            f"mp4 pixel decode for codec {meta['codec']!r} needs a full "
            "entropy/DSP stack (no ffmpeg in this container); container "
            "metadata and sample extraction remain available"
        )
    from carrot_transform_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(mp4_frame_payload(payload, index, meta))


# ------------------------------------------------------------------- encode


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, version: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", version << 24) + body)


def encode_mp4_mjpeg(
    frames: list[np.ndarray] | np.ndarray, fps: float = 25.0, quality: int = 90
) -> bytes:
    """RGB frames -> minimal MJPEG-in-MP4 (ftyp + mdat + moov, one 'vide'
    trak with 'jpeg' sample entries, one chunk). Frames are real baseline
    JFIF payloads from operators/jpeg.py."""
    from carrot_transform_spark.operators.jpeg import encode_jpeg

    if isinstance(frames, np.ndarray):
        frames = [frames]
    _expect(len(frames) > 0, "need at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality) for f in frames]
    sizes = [len(p) for p in payloads]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    mdat_off = len(ftyp) + 8  # first sample's absolute offset
    mdat = _box(b"mdat", b"".join(payloads))

    timescale = 1000
    delta = round(timescale / fps)
    duration = delta * len(frames)

    stsd_entry = (
        struct.pack(">I", 86)
        + b"jpeg"
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_ref_index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stbl = (
        _full(b"stsd", 0, struct.pack(">I", 1) + stsd_entry)
        + _full(b"stts", 0, struct.pack(">III", 1, len(frames), delta))
        + _full(b"stsc", 0, struct.pack(">IIII", 1, 1, len(frames), 1))
        + _full(
            b"stsz", 0,
            struct.pack(">II", 0, len(frames))
            + struct.pack(f">{len(frames)}I", *sizes),
        )
        + _full(b"stco", 0, struct.pack(">II", 1, mdat_off))
    )
    # dref with one 'url ' entry flagged self-contained
    dinf = _box(
        b"dinf",
        _full(
            b"dref", 0,
            struct.pack(">I", 1) + struct.pack(">I", 12) + b"url \x00\x00\x00\x01",
        ),
    )
    vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + _box(b"stbl", stbl))
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = _full(
        b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd",
        0,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd",
        0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
