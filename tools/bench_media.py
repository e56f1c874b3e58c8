"""Kernel-level media decode throughput: MB/s per format and per PNG
filter type, without Spark (the decode kernels dominate; the Spark-path
number lives in bench.py's media_decode row). Usage:

    python tools/bench_media.py [side]   # image is side x side, default 256

Prints one JSON line: {"fmt_or_filter": {"payload_mbps": .., "raw_mbps": ..}}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from entitylinking_spark.functions.jpeg import decode_jpeg  # noqa: E402
from entitylinking_spark.functions.media_synth import (  # noqa: E402
    bench_payloads,
    make_png,
)
from entitylinking_spark.operators.multimodal import (  # noqa: E402
    decode_avi_frames,
    decode_bmp,
    decode_gif,
    decode_png,
    decode_ppm,
    decode_wav,
)


def _time(fn, payload, min_s: float = 0.3) -> tuple[float, int]:
    """Best-effort steady-state: repeat until min_s elapsed, return
    (seconds_per_call, raw_bytes)."""
    out = fn(payload)
    raw = out[0].nbytes if isinstance(out, tuple) else out.nbytes
    n, t0 = 0, time.time()
    while time.time() - t0 < min_s:
        fn(payload)
        n += 1
    return (time.time() - t0) / max(n, 1), raw


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (side, side, 3), dtype=np.uint8)
    payloads = bench_payloads(img_hw=(side, side))
    decoders = {
        "ppm": decode_ppm,
        "bmp": decode_bmp,
        "png_paeth_all": decode_png,
        "jpeg": decode_jpeg,
        "gif_noise": decode_gif,
        "avi_mjpeg": lambda d: np.stack(
            [img for _, img in decode_avi_frames(d)]),
        "wav": decode_wav,
        "wav_ulaw": decode_wav,
    }
    payloads["png_paeth_all"] = payloads.pop("png")
    payloads["gif_noise"] = payloads.pop("gif")  # worst case: no runs
    payloads["avi_mjpeg"] = payloads.pop("avi")
    report = {}
    for fmt, fn in decoders.items():
        dt, raw = _time(fn, payloads[fmt])
        report[fmt] = {
            "payload_mbps": round(len(payloads[fmt]) / 1e6 / dt, 2),
            "raw_mbps": round(raw / 1e6 / dt, 2),
        }
    # per-filter PNG floor/ceiling (encoders choose filters adaptively)
    for ft, name in ((0, "png_filter_none"), (1, "png_filter_sub"),
                     (2, "png_filter_up"), (3, "png_filter_average"),
                     (4, "png_filter_paeth")):
        pl = make_png(img, filter_type=ft)
        dt, raw = _time(decode_png, pl)
        report[name] = {
            "payload_mbps": round(len(pl) / 1e6 / dt, 2),
            "raw_mbps": round(raw / 1e6 / dt, 2),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
