"""Dependency-free MP3 frame-header walk — metadata probe, pure stdlib.

MPEG audio files are a sequence of self-describing frames (11-bit sync,
then version/layer/bitrate/samplerate/padding fields — public layout,
ISO/IEC 11172-3). Walking the headers yields duration, frame count,
bitrate statistics and CBR/VBR classification WITHOUT any DSP: each
header states its own frame length, so the walk is O(n_frames) byte
arithmetic. PCM sample decode (the filterbank/IMDCT stack) stays a
clean NotImplementedError — the documented compressed-codec seam
(operators/codecs.py), matching how MP4 handles AVC.

ID3v2 prefix tags (syncsafe length) and the 128-byte ID3v1 trailer are
skipped; a Xing/Info tag in the first frame is detected so VBR files
report their header-declared frame count when present.

``encode_mp3_frames`` mints syntactically valid frames (real headers,
zeroed audio payload) so tests can pin the walk against hand-computed
frame-length math without shipping real audio.
"""

from __future__ import annotations

import struct


class Mp3Error(ValueError):
    """Malformed or unsupported MPEG-audio payload."""


# bitrate kbps tables, index 1..14 (0=free, 15=bad) — ISO 11172-3 / 13818-3
_BITRATES = {
    # (version_key, layer): [...]
    ("1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
}
_SAMPLERATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
                "2.5": [11025, 12000, 8000]}
# samples per frame: (version, layer) -> n
_SPF = {("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
        ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576,
        ("2.5", 1): 384, ("2.5", 2): 1152, ("2.5", 3): 576}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe 28-bit length)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    return 10 + ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14 | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def _frame_header(payload: bytes, pos: int) -> dict | None:
    """Parse the 4-byte header at pos; None if it isn't a valid frame."""
    if pos + 4 > len(payload):
        return None
    h = struct.unpack(">I", payload[pos : pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((h >> 17) & 3)  # bits: 01=III, 10=II, 11=I
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if version is None or layer is None or br_idx in (0, 15) or sr_idx == 3:
        return None
    vkey = "2" if version == "2.5" else version
    bitrate = _BITRATES[(vkey, layer)][br_idx] * 1000
    samplerate = _SAMPLERATES[version][sr_idx]
    padding = (h >> 9) & 1
    channels = 1 if (h >> 6) & 3 == 3 else 2
    spf = _SPF[(version, layer)]
    if layer == 1:
        size = (12 * bitrate // samplerate + padding) * 4
    else:
        size = spf // 8 * bitrate // samplerate + padding
    return {
        "version": version, "layer": layer, "bitrate": bitrate,
        "samplerate": samplerate, "channels": channels,
        "samples_per_frame": spf, "size": size,
    }


def parse_mp3(payload: bytes) -> dict:
    """Frame-header walk -> {n_frames, duration_s, samplerate, channels,
    bitrate_kbps (average), bitrate_min/max_kbps, vbr, layer, version,
    has_xing, n_samples}."""
    pos = _id3v2_size(payload)
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":  # ID3v1 trailer
        end -= 128

    frames = 0
    n_samples = 0
    bitrates: set[int] = set()
    total_bits = 0
    first: dict | None = None
    has_xing = False
    xing_vbr = False
    declared_frames: int | None = None
    declared_bytes: int | None = None
    while pos + 4 <= end:
        fh = _frame_header(payload, pos)
        if fh is None:
            if frames == 0:
                pos += 1  # resync before the first frame only
                continue
            break
        if first is None:
            first = fh
            # Xing/Info tag sits after the side-info of the first frame;
            # VBRI sits at a fixed 32-byte offset (Fraunhofer layout)
            side = 32 if fh["channels"] == 2 else 17
            if fh["version"] != "1":
                side = 17 if fh["channels"] == 2 else 9
            p = pos + 4 + side
            tag = payload[p : p + 4]
            if tag in (b"Xing", b"Info"):
                has_xing = True
                xing_vbr = tag == b"Xing"  # 'Info' is the CBR variant
                (flags,) = struct.unpack(">I", payload[p + 4 : p + 8])
                q = p + 8
                if flags & 1:  # declared frame count
                    (declared_frames,) = struct.unpack(">I", payload[q : q + 4])
                    q += 4
                if flags & 2:  # declared byte length
                    (declared_bytes,) = struct.unpack(">I", payload[q : q + 4])
            elif payload[pos + 4 + 32 : pos + 4 + 36] == b"VBRI":
                has_xing = True
                xing_vbr = True
                v = pos + 4 + 32
                (declared_bytes,) = struct.unpack(">I", payload[v + 10 : v + 14])
                (declared_frames,) = struct.unpack(">I", payload[v + 14 : v + 18])
        frames += 1
        n_samples += fh["samples_per_frame"]
        bitrates.add(fh["bitrate"])
        total_bits += fh["size"] * 8
        pos += fh["size"]

    if first is None:
        raise Mp3Error("no MPEG audio frame found")
    dur = n_samples / first["samplerate"]
    return {
        "version": first["version"],
        "layer": first["layer"],
        "samplerate": first["samplerate"],
        "channels": first["channels"],
        "n_frames": frames,
        "n_samples": n_samples,
        "duration_s": round(dur, 6),
        "bitrate_kbps": round(total_bits / dur / 1000, 3) if dur else 0.0,
        "bitrate_min_kbps": min(bitrates) // 1000,
        "bitrate_max_kbps": max(bitrates) // 1000,
        "vbr": len(bitrates) > 1 or xing_vbr,
        "has_xing": has_xing,
        # header-declared totals (Xing/Info/VBRI): a walked count below the
        # declared one flags a truncated download without any DSP
        "declared_frames": declared_frames,
        "declared_bytes": declared_bytes,
        "truncated": bool(declared_frames is not None and frames < declared_frames),
    }


def decode_mp3(payload: bytes):
    """PCM decode needs the polyphase filterbank/IMDCT stack — the
    documented compressed-codec seam."""
    raise NotImplementedError(
        "mp3 PCM decode needs a DSP stack (no ffmpeg in this container); "
        "parse_mp3 provides duration/bitrate/frame metadata"
    )


# ------------------------------------------------------------------- encode


_BR_INDEX = {  # kbps -> index for (V1, L3)
    kbps: i for i, kbps in enumerate(_BITRATES[("1", 3)]) if kbps
}
_SR_INDEX = {44100: 0, 48000: 1, 32000: 2}


def encode_mp3_frames(
    n_frames: int,
    bitrate_kbps: int | list[int] = 128,
    samplerate: int = 44100,
    channels: int = 2,
    pad_every: int = 0,
) -> bytes:
    """Syntactically valid MPEG-1 Layer III frames with zeroed payloads —
    real headers + exact frame-length math, no audio. bitrate_kbps may be
    a list (cycled) to mint a VBR stream; pad_every=k sets the padding
    bit on every k-th frame."""
    if isinstance(bitrate_kbps, int):
        bitrate_kbps = [bitrate_kbps]
    out = bytearray()
    for i in range(n_frames):
        kbps = bitrate_kbps[i % len(bitrate_kbps)]
        if kbps not in _BR_INDEX:
            raise Mp3Error(f"unsupported V1L3 bitrate {kbps}")
        if samplerate not in _SR_INDEX:
            raise Mp3Error(f"unsupported MPEG-1 samplerate {samplerate}")
        padding = 1 if pad_every and (i + 1) % pad_every == 0 else 0
        h = (
            0x7FF << 21
            | 3 << 19  # MPEG-1
            | 1 << 17  # Layer III
            | 1 << 16  # no CRC
            | _BR_INDEX[kbps] << 12
            | _SR_INDEX[samplerate] << 10
            | padding << 9
            | (3 if channels == 1 else 0) << 6
        )
        size = 144 * kbps * 1000 // samplerate + padding
        out += struct.pack(">I", h) + b"\x00" * (size - 4)
    return bytes(out)
