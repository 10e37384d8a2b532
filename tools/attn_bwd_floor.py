#!/usr/bin/env python
"""bshd-backward grouping microbench at ViT shapes (r5 late follow-up).

The bshd attention backward (ops/attention.py::_bshd_bwd_kernel) stores
each group of `group` heads' dq/dk/dv partials with one lane-slice write.
group=heads (all-heads concat) is fastest where it fits scoped VMEM
(ViT-B); ViT-L ships group=1 (per-head stores) because the all-heads form
compiled to 19.27 MB scoped vs the 16 MB limit. This tool measures the
intermediate groups at the exact ViT-L shape to find the best one that
still compiles — per-variant error isolation records the OOM boundary.

Each variant is ONE jitted lax.scan (single dispatch + fetch, the relay
protocol in PERF_NOTES.md); the carry feeds dq back into q to defeat CSE.

Usage:
  python tools/attn_bwd_floor.py                         # real TPU, ViT-L
  python tools/attn_bwd_floor.py --h 12 --s 197 --groups 1 2 12  # ViT-B
  TTL_BENCH_PLATFORM=cpu python tools/attn_bwd_floor.py --b 2 --iters 2 \
      --groups 1 2   # CPU drive (interpret-mode kernel)
"""
import argparse
import functools
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_variant(bwd, q, k, v, do, *, iters, windows):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, k, v, do):
        def body(carry, _):
            dq, dk, dv = bwd(carry, k, v, do)
            nxt = carry + (jnp.float32(1e-6) * dq).astype(carry.dtype)
            return nxt, ()
        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out.sum()

    np.asarray(run(q, k, v, do))  # compile + warm
    best = float("inf")
    for w in range(windows):
        t0 = time.time()
        np.asarray(run(q, k, v, do))
        best = min(best, time.time() - t0)
        if w + 1 < windows:
            time.sleep(4.0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--h", type=int, default=16)
    ap.add_argument("--s", type=int, default=257)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--groups", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16])
    args = ap.parse_args()

    import jax
    if os.environ.get("TTL_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["TTL_BENCH_PLATFORM"])
    import jax.numpy as jnp

    from ttl_tpu.ops import attention as fa
    from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
        honor_platform_env
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        honor_platform_env()
    enable_compilation_cache()

    b, h, s, d = args.b, args.h, args.s, args.d
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q, k, v, do = (jax.random.normal(kk, (b, s, h * d), jnp.bfloat16)
                   for kk in ks)

    out = {"b": b, "h": h, "s": s, "d": d, "dtype": "bfloat16",
           "iters": args.iters, "windows": args.windows,
           "device": str(jax.devices()[0].device_kind),
           "shipped_group": fa.bshd_bwd_group(h, s, d, 2),
           "ms_per_call": {}}

    def make_bwd(group):
        kernel = functools.partial(
            fa._bshd_bwd_kernel, heads=h, seq_len=s,
            scale=1.0 / math.sqrt(d), causal=False, group=group)

        def bwd(q, k, v, do):
            return fa._bshd_call(kernel, 3, q, k, v, extra=(do,))
        return bwd

    # einsum-backward reference: vjp of the bshd-layout einsum attention
    def make_einsum_bwd():
        def split(t):
            return t.reshape(b, s, h, d)

        def fwd(q, k, v):
            o = fa.attention_bshd(split(q), split(k), split(v), False)
            return o.reshape(b, s, h * d)

        def bwd(q, k, v, do):
            _, vjp = jax.vjp(fwd, q, k, v)
            return vjp(do)
        return bwd

    variants = {"xla_einsum_vjp": make_einsum_bwd()}
    for g in args.groups:
        variants[f"group_{g}"] = make_bwd(max(1, min(h, g)))

    for name, bwd in variants.items():
        try:
            ms = time_variant(bwd, q, k, v, do, iters=args.iters,
                              windows=args.windows)
            out["ms_per_call"][name] = round(ms, 3)
        except Exception as e:
            out["ms_per_call"][name] = f"{type(e).__name__}: {e}"[:200]
        print(f"attn_bwd_floor: {name}: {out['ms_per_call'][name]}",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
