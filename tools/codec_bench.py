#!/usr/bin/env python
"""Per-codec decode throughput (bytes/s/core), measured in-process.

The codec lanes run the decoders inside Arrow batches; decode cost is
pure Python/NumPy CPU, so a single-core measurement IS the per-core
number a cluster multiplies out.  Prints one markdown table row per
codec: payload shape, payload bytes, decode wall (== CPU here), MB/s.

Usage: python tools/codec_bench.py [reps]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from hbase_snapshotter_spark.operators.multimodal import (
        decode_avi, decode_bmp, decode_jpeg, decode_png, decode_wav,
        encode_avi, encode_bmp, encode_ifv_avi, encode_jpeg,
        encode_mjpeg_avi, encode_png, encode_wav,
    )

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    pcm = rng.integers(-3000, 3000, (16000, 2)).astype(np.int16)
    vid = rng.integers(0, 256, (8, 128, 128, 3), dtype=np.uint8)
    gvid = rng.integers(0, 256, (8, 128, 128), dtype=np.uint8)
    cases = [
        ("bmp", "256x256 RGB", encode_bmp(img), decode_bmp),
        ("png", "256x256 RGB", encode_png(img), decode_png),
        ("wav", "16k frames stereo 16-bit", encode_wav(pcm, 16000),
         decode_wav),
        ("avi(DIB)", "8f 128x128 BGR", encode_avi(vid, 40000),
         decode_avi),
        ("jpeg", "256x256 gray", encode_jpeg(gray), decode_jpeg),
        ("mjpeg-avi", "8f 128x128 gray", encode_mjpeg_avi(gvid, 40000),
         decode_avi),
        ("ifv-avi", "8f 128x128 gray GOP4",
         encode_ifv_avi(gvid, 40000, gop=4), decode_avi),
    ]
    def out_bytes(res):
        if isinstance(res, tuple):
            arrs = [a for a in res if isinstance(a, np.ndarray)]
            return sum(a.nbytes for a in arrs)
        return res.nbytes

    print("| codec | payload | payload bytes | decode ms "
          "| payload MB/s/core | output Mpixel-bytes/s/core |")
    print("|---|---|---|---|---|---|")
    for name, shape, payload, dec in cases:
        ob = out_bytes(dec(payload))  # warm + output size
        t0 = time.perf_counter()
        for _ in range(reps):
            dec(payload)
        dt = (time.perf_counter() - t0) / reps
        print(f"| {name} | {shape} | {len(payload)} | {dt*1e3:.2f} "
              f"| {len(payload)/dt/1e6:.1f} | {ob/dt/1e6:.1f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
