"""Image-decode throughput for the zero-dep pure-Python codecs
(VERDICT r6 #7): imgs/s and MPix/s for baseline JPEG, progressive
JPEG, and PNG at realistic sizes, so the documented ``decoder=``
native-swap hook has a number telling a 100-TB operator when to take
it. Single-process timing (the mapInPandas wrapper parallelizes
per-core; multiply by executor cores for cluster throughput).

Usage: python tools/decode_throughput_bench.py
Prints one JSON line per (codec, size).
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_quality_checker_spark.operators.jpeg import (
    decode_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)
from data_quality_checker_spark.operators.multimodal import (
    _png_chunk,
    _png_decode,
    _png_filter_row,
)
import struct


def _pixels(size: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    # textured-but-compressible content: smooth gradient + noise
    x = np.arange(size, dtype=np.float64)
    g = (x[None, :] * 0.7 + x[:, None] * 0.3) % 256
    px = np.stack(
        [
            (g + rng.integers(0, 32, (size, size))) % 256
            for _ in range(3)
        ],
        axis=-1,
    )
    return px.astype(np.uint8)


def _png_bytes(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        ftype = y % 5
        flat = px[y].reshape(-1)
        rows += bytes([ftype]) + bytes(
            _png_filter_row(flat, prev, ftype, 3)
        )
        prev = flat
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )


def bench(codec: str, size: int, reps: int) -> dict:
    px = _pixels(size, seed=size)
    if codec == "jpeg_baseline":
        blob = encode_baseline_jpeg(px, quant=4)
        fn = decode_jpeg
    elif codec == "jpeg_progressive":
        blob = encode_progressive_jpeg(px, quant=4)
        fn = decode_jpeg
    else:
        blob = _png_bytes(px)
        fn = lambda b: _png_decode(b)[0]  # noqa: E731
    out = fn(blob)  # warm + sanity
    assert out is not None and out.shape[:2] == (size, size)
    t0 = time.time()
    for _ in range(reps):
        fn(blob)
    dt = (time.time() - t0) / reps
    return {
        "codec": codec,
        "size": size,
        "bytes": len(blob),
        "decode_s": round(dt, 4),
        "imgs_per_s_core": round(1 / dt, 2),
        "mpix_per_s_core": round(size * size / dt / 1e6, 3),
    }


def main() -> None:
    for codec in ("jpeg_baseline", "jpeg_progressive", "png"):
        for size, reps in ((64, 20), (128, 10), (256, 5), (512, 2)):
            print(json.dumps(bench(codec, size, reps)))


if __name__ == "__main__":
    main()
