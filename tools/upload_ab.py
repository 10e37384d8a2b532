"""A/B the loader's upload-overlap (TTL_UPLOAD_OVERLAP) on the REAL runner
path.

VERDICT r4 next #5: ViT-B/32 is upload-bound (BENCH_ARCHES: 65 wall vs 100
busy samples/s) - the ~6.3 MB uint8 canvas batch rides the dispatch path.
The loader can now jax.device_put each assembled batch inside its prefetch
thread (ttl_tpu/data/views.py `transform`), overlapping the host->device
transfer with device compute. This tool measures the wall delta through
`evaluate_dataset` - the actual user-facing eval loop, not the bench step -
with the overlap on vs off, interleaved arms, best-of-R per arm (relay
contention only ever adds time).

Usage:
  python tools/upload_ab.py                      # ViT-B/32, 256 samples
  python tools/upload_ab.py --arch ViT-B/16 --n 128
  TTL_BENCH_PLATFORM=cpu python tools/upload_ab.py --arch test-tiny --n 8 \
      --repeats 1   # CPU smoke
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ViT-B/32")
    ap.add_argument("--n", type=int, default=256, help="samples per arm run")
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--canvas", type=int, default=512,
                    help="path-dataset canvas (512 = the ImageNet default)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    if os.environ.get("TTL_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TTL_BENCH_PLATFORM"])
    from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
        honor_platform_env
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        honor_platform_env()
    enable_compilation_cache()

    from ttl_tpu.config import TTLConfig
    from ttl_tpu.data.views import ArrayDataset
    from ttl_tpu.runner import evaluate_dataset, load_model, make_adapters0

    tiny = args.arch == "test-tiny"
    cfg = TTLConfig(arch=args.arch, sample_batch=args.s,
                    canvas=args.canvas, print_freq=10 ** 9,
                    **(dict(resolution=64, layer_range=(2, 3), rank=4)
                       if tiny else {}))
    rng = np.random.RandomState(0)
    # typical ImageNet-val geometry: 375x500 on the 512 canvas
    imgs = (rng.rand(args.n, 375, 500, 3) * 255).astype(np.uint8)
    ds = ArrayDataset(imgs, rng.randint(0, 10, size=args.n))
    ds.max_image_dim = 0  # force the path-dataset canvas (no auto-fit)

    clip_cfg, params = load_model(cfg)
    adapters0 = make_adapters0(cfg, clip_cfg)

    def one_eval(n):
        t0 = time.time()
        evaluate_dataset("eurosat", cfg, clip_cfg, params, adapters0,
                         dataset=ds, max_samples=n)
        return time.time() - t0

    one_eval(min(args.s * 2, args.n))  # compile + warm outside the arms
    best = {"on": float("inf"), "off": float("inf")}
    for r in range(args.repeats):
        for arm in ("on", "off"):
            os.environ["TTL_UPLOAD_OVERLAP"] = "1" if arm == "on" else "0"
            dt = one_eval(args.n)
            best[arm] = min(best[arm], dt)
            print(json.dumps({"repeat": r, "arm": arm,
                              "wall_s": round(dt, 2),
                              "sps": round(args.n / dt, 2)}), flush=True)
    os.environ.pop("TTL_UPLOAD_OVERLAP", None)

    out = {
        "metric": f"{args.arch} runner-path eval wall (upload overlap A/B)",
        "unit": "samples/s", "n": args.n, "sample_batch": args.s,
        "canvas": args.canvas,
        "overlap_on_sps": round(args.n / best["on"], 2),
        "overlap_off_sps": round(args.n / best["off"], 2),
        "speedup": round(best["off"] / best["on"], 3),
    }
    print(json.dumps(out))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
