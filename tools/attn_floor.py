#!/usr/bin/env python
"""Attention floor microbench at the exact TTL shapes (VERDICT r3 next #5).

The fused TTL step's remaining ~23%-of-busy bucket is attention score
traffic; the Pallas kernel post-mortem (ops/attention.py::use_fused) claims
XLA's batched-GEMM einsum attention is the floor at CLIP sequence lengths.
This tool pins that claim with numbers: a theoretical HBM/MXU roofline vs
XLA (both layouts) vs the Pallas kernel vs a heads-batched Pallas grid
variant, all timed as ONE jitted lax.scan per variant (single dispatch +
single fetch - the relay protocol in PERF_NOTES.md; the scan carry feeds
each iteration's output into the next input to defeat CSE).

Shapes: [B, H=12, S=197, D=64] bf16 - B=64 is one sample's view batch
(768 batch*head), B=512 the S=8 fused step's layer invocation.

Usage:
  python tools/attn_floor.py                  # real TPU
  python tools/attn_floor.py --b 64 512 --iters 30 --windows 3
  TTL_BENCH_PLATFORM=cpu python tools/attn_floor.py --b 4 --iters 2  # drive

Prints a JSON table; paste the verdict into PERF_NOTES.md.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e (v5 lite) per-chip peaks - public figures
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0


def roofline_ms(b, h, s, d, *, fused: bool) -> float:
    """max(compute, traffic) time for softmax(qk^T)v at bf16.

    fused: q/k/v read + out write only (scores never leave VMEM).
    unfused: adds the [B,H,S,S] score tensor write+read for the softmax
    and the probability write+read for the A@V GEMM (XLA's actual
    schedule fuses softmax into one of the round trips; 4 S*S transfers
    is the materializing-schedule bound, 2 the best fusable one - we
    report the 2-transfer optimistic bound)."""
    flops = 4.0 * b * h * s * s * d
    qkvo = 4.0 * b * h * s * d * 2
    scores = (0 if fused else 2.0) * b * h * s * s * 2
    t_compute = flops / (BF16_TFLOPS * 1e12)
    t_mem = (qkvo + scores) / (HBM_GBPS * 1e9)
    return max(t_compute, t_mem) * 1e3


def time_variant(fn, q, k, v, *, iters, windows, layout="bhsd"):
    """Best-window ms/call of fn, looped inside ONE jit program."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            o = fn(carry, k, v)
            # feed output into the next input (same shape/layout) so the
            # scan body cannot be CSE'd or hoisted
            return carry + (jnp.float32(1e-6) * o).astype(carry.dtype), ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    np.asarray(run(q, k, v))  # compile + warm
    best = float("inf")
    for w in range(windows):
        t0 = time.time()
        np.asarray(run(q, k, v))
        best = min(best, time.time() - t0)
        if w + 1 < windows:
            time.sleep(4.0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, nargs="+", default=[64, 512])
    ap.add_argument("--h", type=int, default=12)
    ap.add_argument("--s", type=int, default=197)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--skip", nargs="*", default=[],
                    help="variant names to skip")
    args = ap.parse_args()

    import jax
    if os.environ.get("TTL_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TTL_BENCH_PLATFORM"])
    import jax.numpy as jnp

    from ttl_tpu.ops.attention import (attention_bshd, attention_bshd_fused,
                                       attention_heads, fused_attention,
                                       reference_attention)
    from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
        honor_platform_env
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        honor_platform_env()
    enable_compilation_cache()

    out = {"h": args.h, "s": args.s, "d": args.d, "dtype": "bfloat16",
           "iters": args.iters, "windows": args.windows,
           "device": str(jax.devices()[0].device_kind), "tables": []}
    for b in args.b:
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        shape = (b, args.h, args.s, args.d)
        q = jax.random.normal(kq, shape, jnp.bfloat16)
        k = jax.random.normal(kk, shape, jnp.bfloat16)
        v = jax.random.normal(kv, shape, jnp.bfloat16)
        # bshd layout for the tower's in-place-head variants
        qs, ks, vs = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        # the towers' native flat layout for the r5 layout-native kernel
        qf, kf, vf = (t.reshape(b, args.s, args.h * args.d)
                      for t in (qs, ks, vs))

        heads = args.h
        variants = {
            "xla_bhsd": (reference_attention, (q, k, v)),
            "xla_bshd": (attention_bshd, (qs, ks, vs)),
            "pallas_per_head": (
                lambda a, b_, c: fused_attention(a, b_, c), (q, k, v)),
            "pallas_heads_batched": (
                lambda a, b_, c: attention_heads(a, b_, c), (q, k, v)),
            "pallas_bshd_native": (
                lambda a, b_, c: attention_bshd_fused(a, b_, c, heads),
                (qf, kf, vf)),
        }
        table = {
            "b": b, "batch_heads": b * args.h,
            "roofline_fused_ms": round(
                roofline_ms(b, args.h, args.s, args.d, fused=True), 3),
            "roofline_unfused_ms": round(
                roofline_ms(b, args.h, args.s, args.d, fused=False), 3),
            "ms_per_call": {},
        }
        for name, (fn, xs) in variants.items():
            if name in args.skip:
                continue
            try:
                ms = time_variant(fn, *xs, iters=args.iters,
                                  windows=args.windows)
                table["ms_per_call"][name] = round(ms, 3)
            except Exception as e:
                table["ms_per_call"][name] = f"{type(e).__name__}: {e}"
            print(f"attn_floor b={b}: {name}: "
                  f"{table['ms_per_call'][name]}", file=sys.stderr,
                  flush=True)
        out["tables"].append(table)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
