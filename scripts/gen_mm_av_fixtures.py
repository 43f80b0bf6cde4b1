"""Mint the committed MP4/MP3 fixtures (tests/data/mm/) + av_golden.json.

Deterministic: gradient frames -> encode_jpeg(quality=90) -> mp4 mux;
mp3 frames are header-exact with zeroed payloads. Re-running must
reproduce the same bytes (the goldens pin payload md5s, so silent codec
drift fails the committed-fixture test loudly)."""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from carrot_transform_spark.operators.mp3 import encode_mp3_frames, parse_mp3  # noqa: E402
from carrot_transform_spark.operators.mp4 import encode_mp4_mjpeg, parse_mp4  # noqa: E402

MM = Path(__file__).resolve().parent.parent / "tests" / "data" / "mm"


def _pattern(h, w, shift):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3 + y * 7 + (shift + ch) * 11) % 256 for ch in range(3)], axis=-1
    ).astype(np.uint8)


def main() -> None:
    golden: dict = {}

    frames = [_pattern(18, 26, k) for k in range(4)]
    mp4 = encode_mp4_mjpeg(frames, fps=12, quality=90)
    (MM / "clip_mjpeg.mp4").write_bytes(mp4)
    m = parse_mp4(mp4)
    golden["clip_mjpeg.mp4"] = {
        "payload_md5": hashlib.md5(mp4).hexdigest(),
        "n_bytes": len(mp4),
        **{k: m[k] for k in ("brand", "codec", "width", "height",
                             "duration_s", "fps", "n_frames")},
        "frame_sizes": [sz for _, sz in m["frames"]],
    }

    cbr = encode_mp3_frames(40, 128, 44100, 2, pad_every=4)
    (MM / "tone_cbr.mp3").write_bytes(cbr)
    vbr = (
        b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
        + encode_mp3_frames(36, [112, 160, 224], 48000, 1)
        + b"TAG" + b"\x00" * 125
    )
    (MM / "tone_vbr.mp3").write_bytes(vbr)
    for name, payload in (("tone_cbr.mp3", cbr), ("tone_vbr.mp3", vbr)):
        p = parse_mp3(payload)
        golden[name] = {
            "payload_md5": hashlib.md5(payload).hexdigest(),
            "n_bytes": len(payload),
            **{k: p[k] for k in ("version", "layer", "samplerate", "channels",
                                 "n_frames", "n_samples", "duration_s",
                                 "bitrate_kbps", "bitrate_min_kbps",
                                 "bitrate_max_kbps", "vbr")},
        }

    (MM / "av_golden.json").write_text(json.dumps(golden, indent=1, sort_keys=True))
    print(json.dumps(golden, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
