"""A/B the loader's per-batch canvas buckets (TTL_CANVAS_BUCKETS) on the
REAL runner path.

VERDICT r4 next #5 scoped a "JPEG-dims-aware per-batch canvas": the decode
already reports each image's (h, w), so the loader can shrink an assembled
batch to the smallest ladder canvas (canvas/4, canvas/2, canvas) that fits
it (ttl_tpu/data/views.py docstring). Results are bit-identical (pinned by
tests/test_end_to_end.py); this tool measures the wall effect through
`evaluate_dataset` - the user-facing eval loop - for a small-image dataset
that a user runs WITHOUT knowing the explicit --canvas knob, i.e. the
auto-canvas 512 default. Interleaved arms, best-of-R per arm (relay
contention only ever adds time). Both arms keep upload overlap on (the
buckets stack on top of it).

Usage:
  python tools/bucket_ab.py                        # ViT-B/32, 96px images
  python tools/bucket_ab.py --img 375 --n 256      # ImageNet-val geometry
  TTL_BENCH_PLATFORM=cpu python tools/bucket_ab.py --arch test-tiny \
      --n 8 --repeats 1    # CPU smoke
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
    ap.add_argument("--img", type=int, default=96,
                    help="image max dim (96 ~= Caltech/EuroSAT-small on the "
                         "512 auto canvas -> the 128 bucket, 16x less upload)")
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
                    canvas=0, print_freq=10 ** 9,
                    **(dict(resolution=64, layer_range=(2, 3), rank=4)
                       if tiny else {}))
    rng = np.random.RandomState(0)
    imgs = (rng.rand(args.n, args.img, max(64, args.img - 21), 3)
            * 255).astype(np.uint8)
    ds = ArrayDataset(imgs, rng.randint(0, 10, size=args.n))
    ds.max_image_dim = 0  # path-dataset behavior: the 512 default canvas

    clip_cfg, params = load_model(cfg)
    adapters0 = make_adapters0(cfg, clip_cfg)

    def one_eval(n):
        t0 = time.time()
        evaluate_dataset("eurosat", cfg, clip_cfg, params, adapters0,
                         dataset=ds, max_samples=n)
        return time.time() - t0

    # compile+warm BOTH programs (bucket and full-canvas shapes) outside
    # the timed arms
    for arm in ("1", "0"):
        os.environ["TTL_CANVAS_BUCKETS"] = arm
        one_eval(min(args.s * 2, args.n))
    best = {"on": float("inf"), "off": float("inf")}
    for r in range(args.repeats):
        for arm in ("on", "off"):
            os.environ["TTL_CANVAS_BUCKETS"] = "1" if arm == "on" else "0"
            dt = one_eval(args.n)
            best[arm] = min(best[arm], dt)
            print(json.dumps({"repeat": r, "arm": arm,
                              "wall_s": round(dt, 2),
                              "sps": round(args.n / dt, 2)}), flush=True)
    os.environ.pop("TTL_CANVAS_BUCKETS", None)

    out = {
        "metric": f"{args.arch} runner-path eval wall (canvas-bucket A/B)",
        "unit": "samples/s", "n": args.n, "sample_batch": args.s,
        "img_dim": args.img,
        "buckets_on_sps": round(args.n / best["on"], 2),
        "buckets_off_sps": round(args.n / best["off"], 2),
        "speedup": round(best["off"] / best["on"], 3),
    }
    print(json.dumps(out))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
