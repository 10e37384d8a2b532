"""A/B the attention route (TTL_FUSED_ATTENTION=bshd vs off) on the REAL
runner path: same synthetic dataset, same seeds, accuracy must agree.

The bshd kernel keeps f32 scores in VMEM while the default einsum path
stores bf16 scores in HBM (ops/attention._scores_dtype_low), so the kernel
is the *more* accurate arm; this tool pins that switching the route does
not move eval results. Each arm runs in its own subprocess because the
route is resolved once per process (fused_mode lru_cache) and baked into
the traced program.

Usage:
  python tools/attn_ab.py                         # ViT-B/16, 64 samples
  python tools/attn_ab.py --arch ViT-B/32 --n 128
  TTL_BENCH_PLATFORM=cpu python tools/attn_ab.py --arch test-tiny --n 8 \
      # CPU smoke (interpret-mode kernel)
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def run_arm(args, arm: str) -> dict:
    env = dict(os.environ, TTL_FUSED_ATTENTION=arm, TTL_ATTN_AB_ARM="1")
    cmd = [sys.executable, __file__, "--arch", args.arch, "--n", str(args.n),
           "--s", str(args.s)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=args.timeout)
    if out.returncode != 0:
        raise RuntimeError(f"arm {arm!r} failed rc={out.returncode}:\n"
                           f"{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def arm_main(args) -> None:
    import jax
    if os.environ.get("TTL_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TTL_BENCH_PLATFORM"])
    from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
        honor_platform_env
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        honor_platform_env()
    enable_compilation_cache()

    import numpy as np
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.data.views import ArrayDataset
    from ttl_tpu.ops.attention import fused_mode
    from ttl_tpu.runner import evaluate_dataset, load_model, make_adapters0

    tiny = args.arch == "test-tiny"
    cfg = TTLConfig(arch=args.arch, sample_batch=args.s,
                    print_freq=10 ** 9,
                    **(dict(resolution=64, layer_range=(2, 3), rank=4)
                       if tiny else {}))
    rng = np.random.RandomState(0)
    imgs = (rng.rand(args.n, 375, 500, 3) * 255).astype(np.uint8)
    ds = ArrayDataset(imgs, rng.randint(0, 10, size=args.n))

    clip_cfg, params = load_model(cfg)
    adapters0 = make_adapters0(cfg, clip_cfg)
    t0 = time.time()
    top1, top5 = evaluate_dataset("eurosat", cfg, clip_cfg, params,
                                  adapters0, dataset=ds, max_samples=args.n)
    print(json.dumps({"mode": fused_mode(), "top1": top1, "top5": top5,
                      "wall_s": round(time.time() - t0, 2),
                      "sps": round(args.n / (time.time() - t0), 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=560)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if os.environ.get("TTL_ATTN_AB_ARM"):
        arm_main(args)
        return

    res = {}
    for arm in ("bshd", "off"):
        res[arm] = run_arm(args, arm)
        print(json.dumps({"arm": arm, **res[arm]}), flush=True)
    agree = (res["bshd"]["top1"] == res["off"]["top1"]
             and res["bshd"]["top5"] == res["off"]["top5"])
    out = {
        "metric": f"{args.arch} runner-path eval accuracy (attention A/B)",
        "n": args.n, "sample_batch": args.s,
        "bshd": res["bshd"], "xla": res["off"],
        "accuracy_identical": agree,
    }
    print(json.dumps(out))
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    if not agree:
        sys.exit(3)


if __name__ == "__main__":
    main()
