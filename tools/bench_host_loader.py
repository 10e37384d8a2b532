#!/usr/bin/env python
"""Host input-pipeline benchmark at ImageNet scale (VERDICT r1 #7).

Synthesizes N realistic JPEGs (ImageNet-val-like 500x375, quality 85),
then measures SampleLoader end-to-end host throughput for:
  - the native threaded libjpeg decoder (ttl_tpu/native/ttl_decode.cpp)
  - the PIL fallback (force-disabled native path)
against the device budget (~35 ms/sample single-chip; /8 under 8-way DP).

Usage: python tools/bench_host_loader.py [--n 2000] [--workers 4]
"""
import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def synth_jpegs(root: str, n: int) -> list:
    from PIL import Image
    rng = np.random.RandomState(0)
    paths = []
    # a small pool of distinct textures re-encoded at slightly different
    # sizes: decode cost tracks pixel count + entropy, not file identity
    base = [
        np.clip(rng.rand(375, 500, 3) * 255 * (0.5 + 0.5 * rng.rand()),
                0, 255).astype(np.uint8) for _ in range(32)
    ]
    for i in range(n):
        img = base[i % len(base)]
        h = 375 + (i % 7) * 11
        w = 500 - (i % 5) * 13
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(img).resize((w, h)).save(p, quality=85)
        paths.append(p)
    return paths


class PathDataset:
    def __init__(self, paths):
        self.paths = paths

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return self.paths[i], 0


def measure(dataset, batch_size, workers, label):
    from ttl_tpu.data.views import SampleLoader
    loader = SampleLoader(dataset, batch_size=batch_size, shuffle=True,
                          seed=0, workers=workers)
    n = 0
    t0 = time.time()
    for batch in loader:
        n += batch.canvases.shape[0] - batch.pad
    dt = time.time() - t0
    print(f"{label:28} {n / dt:8.1f} samples/s  "
          f"({1000 * dt / n:6.2f} ms/sample)")
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from ttl_tpu.data import native_decode

    with tempfile.TemporaryDirectory() as root:
        t0 = time.time()
        paths = synth_jpegs(root, args.n)
        print(f"synthesized {len(paths)} jpegs in {time.time() - t0:.1f}s "
              f"(~{os.path.getsize(paths[0]) // 1024}KB each)")
        ds = PathDataset(paths)

        print(f"native decoder available: {native_decode.available()}")
        if native_decode.available():
            measure(ds, args.batch, args.workers,
                    f"native ({args.workers} threads)")
        # PIL fallback path (what non-JPEG formats / missing toolchain get)
        orig = native_decode.available
        native_decode.available = lambda: False
        try:
            measure(ds, args.batch, args.workers, "PIL fallback")
        finally:
            native_decode.available = orig
        print("device budget: ~35 ms/sample single-chip (28.6/s), "
              "~4.4 ms/sample at 8-way DP (229/s)")


if __name__ == "__main__":
    main()
