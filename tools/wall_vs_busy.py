#!/usr/bin/env python
"""Attribute the wall-vs-busy gap of the steady-state bench loop
(VERDICT r2 #9: ~7% of wall was unattributed beyond "relay").

Runs the exact depth-2 pipelined loop the runner uses (dispatch batch i+1,
then drain batch i) with host-side PhaseTimer around each phase:

  prep      - building the input batch on host (canvas arrays)
  dispatch  - the step_fn + count_fn calls (async enqueue; any time here is
              host-side tracing/serialization + relay enqueue RTT)
  drain     - np.asarray on the [3] counts (device wait + fetch RTT)

and then traces the same loop for device-busy self-time. wall/step -
busy/step - (prep + dispatch measured off the critical path) = the residual
the relay round trips account for.

  python tools/wall_vs_busy.py --steps 30

Prints one JSON line.
"""
import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--sample_batch", type=int, default=8)
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ttl_tpu.adapt.ttl import make_fused_ttl_fn
    from ttl_tpu.config import TTLConfig, resolve_layer_range
    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
    from ttl_tpu.models.zoo import get_arch
    from ttl_tpu.ops.lora import init_adapters
    from ttl_tpu.parallel.eval import make_count_fn
    from ttl_tpu.utils.jaxcache import enable_compilation_cache
    from ttl_tpu.utils.profiling import PhaseTimer, device_busy_us, trace

    enable_compilation_cache()
    S = args.sample_batch
    cfg = TTLConfig(sample_batch=S)
    clip_cfg = get_arch(cfg.arch)
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                              param_dtype=jnp.bfloat16)
    names = json.loads(
        (pathlib.Path(__file__).resolve().parent.parent / "ttl_tpu" / "data"
         / "assets" / "imagenet_classnames.json").read_text())
    toks = jnp.asarray(prompt_tokens(names[: args.classes]))
    text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
    lo, hi = resolve_layer_range(cfg, clip_cfg)
    adapters0 = init_adapters(jax.random.PRNGKey(1), hi - lo + 1,
                              clip_cfg.vision.hidden, cfg.rank,
                              cfg.init_method)
    fused = make_fused_ttl_fn(clip_cfg, cfg)
    count_fn = make_count_fn()
    labels = np.zeros((S,), np.int32)
    valid = np.ones((S,), bool)

    rng = np.random.RandomState(0)

    def prep(i):
        canv = (rng.rand(S, 512, 512, 3) * 255).astype(np.uint8)
        hs = np.full((S,), 375, np.int32)
        ws = np.full((S,), 500, np.int32)
        idxs = np.arange(S, dtype=np.int32) + i * S
        return canv, hs, ws, idxs

    def run_loop(n, timer=None):
        """Depth-`args.depth` pipelined loop; returns wall seconds."""
        tm = timer or PhaseTimer()
        in_flight = []
        t0 = time.time()
        for i in range(n):
            with tm.phase("prep"):
                canv, hs, ws, idxs = prep(i)
            with tm.phase("dispatch"):
                res = fused(params, text_cls, adapters0, canv, hs, ws, idxs)
                pending = count_fn(res.logits, labels, valid)
            in_flight.append(pending)
            if len(in_flight) > args.depth:
                with tm.phase("drain"):
                    np.asarray(in_flight.pop(0))
        for pending in in_flight:
            with tm.phase("drain"):
                np.asarray(pending)
        return time.time() - t0

    run_loop(3)  # warm compile + caches

    tm = PhaseTimer()
    wall = run_loop(args.steps, tm)

    busy_ms = None
    td = tempfile.mkdtemp(prefix="ttl_wvb_trace_")
    try:
        with trace(td):
            run_loop(6)
        busy_us = device_busy_us(td)
        if busy_us:
            busy_ms = busy_us / 6 / 1000.0
    except Exception as e:
        print(f"WARNING: trace failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    finally:
        shutil.rmtree(td, ignore_errors=True)

    wall_ms = wall / args.steps * 1000.0
    out = {
        "steps": args.steps,
        "depth": args.depth,
        "wall_ms_per_step": round(wall_ms, 1),
        "prep_ms_per_step": round(tm.totals["prep"] / args.steps * 1e3, 1),
        "dispatch_ms_per_step": round(
            tm.totals["dispatch"] / args.steps * 1e3, 1),
        "drain_ms_per_step": round(tm.totals["drain"] / args.steps * 1e3, 1),
        "wall_sps": round(S / (wall / args.steps), 2),
    }
    if busy_ms:
        out["busy_ms_per_step"] = round(busy_ms, 1)
        out["busy_equivalent_sps"] = round(S / (busy_ms / 1e3), 2)
        out["unattributed_ms_per_step"] = round(
            wall_ms - busy_ms - out["prep_ms_per_step"]
            - out["dispatch_ms_per_step"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
