"""Dependency-free JPEG codec (ITU-T T.81, 8-bit, Huffman) — pure
numpy + stdlib.

Closes the compressed-image seam in operators/codecs.py (VERDICT r11
task 4): the container has no PIL/ffmpeg, so JFIF payloads in multimodal
columns previously raised NotImplementedError. Decode covers baseline
sequential (SOF0/1) AND progressive (SOF2, spectral selection +
successive approximation — the scan scripts libjpeg-style encoders
emit); grayscale / YCbCr 4:4:4 / 4:2:2 / 4:2:0, restart intervals, 8-
and 16-bit DQT precision, multi-scan EOBRUN. Lossless/hierarchical and
arithmetic coding still raise, and errors surface cleanly in
decode-stats error columns.

Both processes share ONE scan decoder accumulating coefficients per
component (baseline is the single full-band scan); tests pin the two
entropy paths bit-identical on the same quantized coefficients.

The encoder exists so tests (and the multimodal sample pipeline) can
produce real JFIF bytes without external tools: Annex-K example
quantization + Huffman tables, 4:4:4 (no subsampling), quality scaling
per the public IJG formula. encode->decode round-trips within
quantization error, which is how the DCT/Huffman paths verify each
other without a reference binary in the container.

Everything here derives from the public JPEG spec (ITU-T T.81 / ISO
10918-1) and the JFIF spec; no reference-repo counterpart exists
(reference has no multimodal layer)."""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- shared tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 DCT-II basis (orthonormal): block = A @ spatial @ A.T is the FDCT
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

# Annex K.1 example quantization tables (luminance, chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 example Huffman tables: (BITS counts per length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


def _unpack(fmt: str, buf: bytes) -> tuple:
    """struct.unpack that keeps the module's error contract: a truncated
    marker segment raises JpegError (what decode-stats error columns
    classify on), never a bare struct.error."""
    try:
        return struct.unpack(fmt, buf)
    except struct.error:
        raise JpegError("truncated JPEG marker segment") from None


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: {symbol -> (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------- decoding


class _BitReader:
    """MSB-first bit reader over entropy-coded data, one byte at a time
    (keeps restart-marker byte alignment trivial): 0xFF00 unstuffs to a
    literal 0xFF; any other marker ends the entropy segment (reads past
    it yield zero padding, T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.bit = 0  # bits remaining in cur
        self.marker: int | None = None

    def _next_byte(self) -> int:
        if self.marker is not None or self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            self.marker = nxt  # pos left AT the 0xFF of the marker
            return 0
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.bit == 0:
            self.cur = self._next_byte()
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huffman(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Discard padding bits to the byte boundary, consume one RSTn."""
        self.bit = 0
        if self.marker is None:
            # marker not yet reached: it must be the next bytes
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7
            ):
                self.pos += 2
                return
            raise JpegError("expected restart marker")
        if 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # past FF Dn
            self.marker = None
            return
        raise JpegError(f"expected RSTn, found marker 0xFF{self.marker:02X}")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JFIF -> (H, W, C) uint8
    (C=1 grayscale, C=3 RGB).

    Both processes run through ONE scan decoder that accumulates
    dequantization-ready coefficients per component (baseline is simply
    the single full-band Ah=Al=0 interleaved scan); the IDCT/upsample/
    color finish happens once at EOI. Progressive covers spectral
    selection AND successive approximation (T.81 G.2), i.e. the scan
    scripts libjpeg-style encoders actually emit."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    saw_scan = False

    while pos + 1 < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker: re-examine
            pos += 1
            continue
        pos += 2
        # 0x00 = a stuffed entropy byte the scan decoder left behind
        if marker in (0xD8, 0x01, 0x00) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = _unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:
                    q = np.frombuffer(seg[off : off + 128], dtype=">u2").astype(np.int64)
                    off += 128
                else:
                    q = np.frombuffer(seg[off : off + 64], dtype=np.uint8).astype(np.int64)
                    off += 64
                qtables[tq] = q.copy()  # zigzag order, matching coef storage
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if len(seg) < 6:
                raise JpegError("truncated SOF segment")
            prec, h, w, nc = seg[0], *_unpack(">HH", seg[1:5]), seg[5]
            if len(seg) < 6 + 3 * nc:
                raise JpegError("truncated SOF component list")
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:
                c["bw"], c["bh"] = mcux * c["h"], mcuy * c["v"]  # padded grid
                # true per-component block counts (T.81 A.2.2) for
                # non-interleaved scan traversal
                comp_w = -(-w * c["h"] // hmax)
                comp_h = -(-h * c["v"] // vmax)
                c["nbx"] = -(-comp_w // 8)
                c["nby"] = -(-comp_h // 8)
                c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
                c["pred"] = 0
                c["eobrun"] = 0
            frame = {
                "h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
                "mcux": mcux, "mcuy": mcuy,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "baseline sequential (SOF0/1) and progressive (SOF2) only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = _unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            if not seg or len(seg) < 4 + 2 * seg[0]:
                raise JpegError("truncated SOS segment")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise JpegError(
                        f"scan references undefined component id {cs}"
                    )
                scan.append((comp, tdta >> 4, tdta & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            pos = _decode_scan_coefs(
                payload, pos + seglen, frame, scan, htables,
                restart_interval, ss, se, ah, al,
            )
            saw_scan = True
            continue
        pos += seglen
    if not saw_scan:
        raise JpegError("no scan data found")
    return _finish(frame, qtables)


def _decode_scan_coefs(data, pos, frame, scan, htables, ri, ss, se, ah, al):
    """Decode one entropy-coded scan into the components' coefficient
    arrays (zigzag order); returns the payload position of the next
    marker. Handles interleaved and single-component scans, spectral
    bands [ss, se], and successive approximation (ah=0 first pass /
    ah>0 refinement)."""
    reader = _BitReader(data, pos)
    for comp, _, _ in scan:
        comp["pred"] = 0
        comp["eobrun"] = 0

    interleaved = len(scan) > 1
    if interleaved:
        units = frame["mcux"] * frame["mcuy"]
    else:
        comp = scan[0][0]
        units = comp["nbx"] * comp["nby"]

    def block_indices(unit):
        """(comp, td, ta, flat block index) tuples for one MCU/block unit."""
        if interleaved:
            my, mx = divmod(unit, frame["mcux"])
            for comp, td, ta in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        row = my * comp["v"] + by
                        col = mx * comp["h"] + bx
                        yield comp, td, ta, row * comp["bw"] + col
        else:
            comp, td, ta = scan[0]
            row, col = divmod(unit, comp["nbx"])
            yield comp, td, ta, row * comp["bw"] + col

    p1 = 1 << al

    for unit in range(units):
        if ri and unit and unit % ri == 0:
            reader.restart()
            for comp, _, _ in scan:
                comp["pred"] = 0
                comp["eobrun"] = 0
        for comp, td, ta, bi in block_indices(unit):
            coef = comp["coef"][bi]
            if ss == 0:  # DC (and, for sequential, the full band follows)
                if ah == 0:
                    dc_tab = htables.get((0, td))
                    if dc_tab is None:
                        raise JpegError("scan references undefined DC table")
                    t = reader.decode_huffman(dc_tab)
                    comp["pred"] += _extend(reader.receive(t), t)
                    coef[0] = comp["pred"] << al
                else:  # DC refinement: one bit per block
                    if reader.read_bit():
                        coef[0] |= p1
            if se == 0:
                continue
            ac_tab = htables.get((1, ta))
            if ac_tab is None:
                raise JpegError("scan references undefined AC table")
            k0 = max(ss, 1)
            if ah == 0:
                _ac_first(reader, ac_tab, coef, comp, k0, se, al)
            else:
                _ac_refine(reader, ac_tab, coef, comp, k0, se, al)
    # leave pos at the stopping marker's 0xFF (or end)
    return reader.pos


def _ac_first(reader, ac_tab, coef, comp, k, se, al):
    """AC first pass for band [k, se] at point transform al, with EOBRUN
    (T.81 G.2.2; degenerates to the baseline AC loop when the encoder
    never emits runs > 1)."""
    if comp["eobrun"] > 0:
        comp["eobrun"] -= 1
        return
    while k <= se:
        rs = reader.decode_huffman(ac_tab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            comp["eobrun"] = (1 << r) - 1
            if r:
                comp["eobrun"] += reader.receive(r)
            return
        k += r
        if k > se:
            raise JpegError("AC run past end of band")
        coef[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine(reader, ac_tab, coef, comp, k, se, al):
    """AC refinement pass (T.81 G.2.3 / libjpeg decode_mcu_AC_refine):
    newly-nonzero coefficients arrive as (run, 1) symbols; history
    coefficients get one correction bit each as they are passed."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(idx):
        if reader.read_bit():
            if coef[idx] > 0 and not (coef[idx] & p1):
                coef[idx] += p1
            elif coef[idx] < 0 and not (-coef[idx] & p1):
                coef[idx] += m1

    if comp["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_huffman(ac_tab)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s:
                if s != 1:
                    raise JpegError("AC refinement symbol with size != 1")
                newval = p1 if reader.read_bit() else m1
            else:
                if r != 15:
                    comp["eobrun"] = (1 << r)
                    if r:
                        comp["eobrun"] += reader.receive(r)
                    break
            # advance over r zero-HISTORY positions, correcting nonzeros
            while k <= se:
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        if newval:
                            coef[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
    if comp["eobrun"] > 0:
        while k <= se:
            if coef[k] != 0:
                correct(k)
            k += 1
        comp["eobrun"] -= 1


def _finish(frame, qtables):
    """Dequantize + IDCT every accumulated block, upsample, color-convert."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    full = []
    for comp in frame["comps"]:
        q = qtables.get(comp["tq"])
        if q is None:
            raise JpegError(f"missing quantization table {comp['tq']}")
        bw, bh = comp["bw"], comp["bh"]
        # vectorized finish: dequantize all blocks, dezigzag, batched IDCT
        deq = comp["coef"].astype(np.float64) * q[None, :]
        blocks = np.zeros((deq.shape[0], 64))
        blocks[:, ZIGZAG] = deq
        blocks = blocks.reshape(-1, 8, 8)
        spatial = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A)
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        if comp["h"] != hmax or comp["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], 0), hmax // comp["h"], 1
            )
        full.append(plane[:h, :w] + 128.0)

    if len(full) == 1:
        return np.clip(full[0], 0, 255).astype(np.uint8)[..., None]
    if len(full) != 3:
        raise JpegError(f"unsupported component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


# ------------------------------------------------------ progressive encode


def _quant_blocks(plane: np.ndarray, q8: np.ndarray) -> np.ndarray:
    """Centered padded plane -> (n_blocks, 64) quantized coefs in ZIGZAG
    order (zz[k] = natural[ZIGZAG[k]], mirroring the decoder's storage)."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
    quant = np.round(coef / q8[None]).astype(np.int64).reshape(-1, 64)
    return quant[:, ZIGZAG]


def _emit_dc_first(bw, coefs, dc_encs, al, mcus, order):
    preds = [0] * len(coefs)
    for unit in range(mcus):
        for ci in order(unit):
            v = int(coefs[ci][unit][0]) >> al  # arithmetic shift (T.81 DC)
            diff = v - preds[ci]
            preds[ci] = v
            t = abs(diff).bit_length()
            code, ln = dc_encs[ci][t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(bw, coefs, al, mcus, order):
    for unit in range(mcus):
        for ci in order(unit):
            bw.write((int(coefs[ci][unit][0]) >> al) & 1, 1)


def _emit_ac_first(bw, block, ac_enc, ss, se, al):
    """One block's AC-first pass; EOBRUN capped at 1 (symbol 0x00 per
    block) because the Annex-K tables carry no longer-run symbols."""
    k = ss
    run = 0
    mags = [abs(int(block[i])) >> al for i in range(ss, se + 1)]
    last_nz = -1
    for i, m in enumerate(mags):
        if m:
            last_nz = i
    if last_nz < 0:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
        return
    for i, m in enumerate(mags):
        if m == 0:
            run += 1
            continue
        if i > last_nz:
            break
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = m.bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        v = m if int(block[ss + i]) > 0 else -m
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < len(mags) - 1:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)


def _emit_ac_refine(bw, block, ac_enc, ss, se, al):
    """One block's AC refinement (T.81 G.1.2.3 / jcphuff mirror), EOBRUN
    capped at 1: history coefficients buffer a correction bit that is
    flushed after the next emitted symbol."""
    absv = [abs(int(block[k])) >> al for k in range(ss, se + 1)]
    eob = -1
    for i, m in enumerate(absv):
        if m == 1:
            eob = i
    r = 0
    br: list[int] = []

    def flush_br():
        for bit in br:
            bw.write(bit, 1)
        br.clear()

    for i, m in enumerate(absv):
        if m == 0:
            r += 1
            continue
        if m > 1:  # history coefficient: one correction bit
            br.append(m & 1)
            continue
        # newly significant (m == 1)
        while r > 15 and i <= eob:
            code, ln = ac_enc[0xF0]
            bw.write(code, ln)
            r -= 16
            flush_br()
        code, ln = ac_enc[(r << 4) | 1]
        bw.write(code, ln)
        r = 0
        bw.write(1 if int(block[ss + i]) > 0 else 0, 1)
        flush_br()
    if r > 0 or br:
        code, ln = ac_enc[0x00]
        bw.write(code, ln)
        flush_br()


def encode_jpeg_progressive(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 1|3) uint8 -> progressive JFIF (SOF2), 4:4:4 / grayscale.

    Scan script (the libjpeg-shaped spectral-selection + successive-
    approximation progression, bounded to the Annex-K Huffman alphabet by
    capping EOBRUN at one block): interleaved DC first at Al=1; per
    component AC first (split bands 1-5 / 6-63 for luma) at Al=1; DC
    refinement; per component AC refinement to Al=0."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise JpegError(f"unsupported channel count {nc}")
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[..., 0]]

    ql = _scale_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scale_quant(QUANT_CHROMA, quality).reshape(8, 8)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    mcux, mcuy = pw // 8, ph // 8
    mcus = mcux * mcuy

    coefs = []
    for ci, p in enumerate(planes):
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        coefs.append(_quant_blocks(pp - 128.0, ql if ci == 0 else qc))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tq, table):
        zz = table.reshape(-1)[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(int(v) for v in zz)

    out += dqt(0, ql)
    if nc == 3:
        out += dqt(1, qc)

    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)  # SOF2
    for i in range(nc):
        out += bytes([i + 1, 0x11, 0 if i == 0 else 1])

    def dht(tc, th, bits, vals):
        return (
            b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        )

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    dc_encs = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_encs = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        dcc = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
        acc = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
        dc_encs += [dcc, dcc]
        ac_encs += [acc, acc]

    def sos(comp_specs, ss, se, ah, al):
        seg = bytearray(b"\xff\xda")
        seg += struct.pack(">HB", 6 + 2 * len(comp_specs), len(comp_specs))
        for cid, td, ta in comp_specs:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg)

    def tab(ci):
        return 0 if ci == 0 else 1

    # --- scan 1: DC first, interleaved, Al=1 ---
    out += sos([(ci + 1, tab(ci), 0) for ci in range(nc)], 0, 0, 0, 1)
    bw = _BitWriter()
    _emit_dc_first(bw, coefs, dc_encs, 1, mcus, lambda u: range(nc))
    bw.flush()
    out += bw.out

    # --- AC first scans at Al=1 (luma split into two bands) ---
    ac_first_scans = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, nc)]
    for ci, ss_, se_ in ac_first_scans:
        out += sos([(ci + 1, 0, tab(ci))], ss_, se_, 0, 1)
        bw = _BitWriter()
        for u in range(mcus):
            _emit_ac_first(bw, coefs[ci][u], ac_encs[ci], ss_, se_, 1)
        bw.flush()
        out += bw.out

    # --- DC refinement to Al=0, interleaved ---
    out += sos([(ci + 1, tab(ci), 0) for ci in range(nc)], 0, 0, 1, 0)
    bw = _BitWriter()
    _emit_dc_refine(bw, coefs, 0, mcus, lambda u: range(nc))
    bw.flush()
    out += bw.out

    # --- AC refinement scans Ah=1 -> Al=0 ---
    for ci in range(nc):
        out += sos([(ci + 1, 0, tab(ci))], 1, 63, 1, 0)
        bw = _BitWriter()
        for u in range(mcus):
            _emit_ac_refine(bw, coefs[ci][u], ac_encs[ci], 1, 63, 0)
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- encoding


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """Public IJG quality scaling."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((table * s + 50) // 100, 1, 255)


def _encode_block(bw, blk, q, dc_enc, ac_enc, pred):
    coef = np.round((_A @ blk @ _A.T) / q).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff else 0
    code, ln = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_enc[0x00]  # EOB
                bw.write(code, ln)
                break
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(H, W, 1|3) uint8 -> baseline JFIF, grayscale / 4:4:4 / 4:2:0. A
    nonzero ``restart_interval`` emits DRI + RSTn markers every N MCUs
    (exercises the decoder's restart path without an external encoder);
    ``subsampling="420"`` emits 2x2-subsampled chroma (exercises the
    decoder's upsampling path)."""
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise JpegError(f"unsupported channel count {nc}")
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "420" and nc == 3
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[..., 0]]

    ql = _scale_quant(QUANT_LUMA, quality).reshape(8, 8)
    qc = _scale_quant(QUANT_CHROMA, quality).reshape(8, 8)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tq, table):
        zz = table.reshape(-1)[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in zz
        )

    out += dqt(0, ql)
    if nc == 3:
        out += dqt(1, qc)

    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i in range(nc):
        hv = 0x22 if (sub and i == 0) else 0x11
        out += bytes([i + 1, hv, 0 if i == 0 else 1])

    def dht(tc, th, bits, vals):
        return (
            b"\xff\xc4"
            + struct.pack(">H", 19 + len(vals))
            + bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if nc == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_l = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    mcu_px = 16 if sub else 8  # MCU size in luma pixels
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px

    def _pad(p, th, tw):
        pp = np.empty((th, tw))
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1 : sh, :]  # edge-replicate padding
        pp[:, sw:] = pp[:, sw - 1 : sw]
        return pp - 128.0

    if sub:
        luma = _pad(planes[0], ph, pw)
        # 2x2 box-average chroma then pad to the chroma MCU grid
        chroma = []
        for p in planes[1:]:
            full = _pad(p, ph, pw) + 128.0
            down = full.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            chroma.append(down - 128.0)
        comp_blocks = [(luma, 2, 2), (chroma[0], 1, 1), (chroma[1], 1, 1)]
    else:
        comp_blocks = [(_pad(p, ph, pw), 1, 1) for p in planes]

    bw = _BitWriter()
    preds = [0] * nc
    mcu = 0
    rst = 0
    for my in range(ph // mcu_px):
        for mx in range(pw // mcu_px):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * nc
            for ci, (plane, ch, cv) in enumerate(comp_blocks):
                q = ql if ci == 0 else qc
                dc_e, ac_e = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(bw, blk, q, dc_e, ac_e, preds[ci])
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
