#!/usr/bin/env python
"""Round-2 perf sweep on the real TPU chip.

Measures adapted samples/sec/chip for the 64-view TTL step across variants:

  base         round-1 path: two dispatches (view_fn, adapt_fn) + key fold,
               round-1 precision knobs (f32 LoRA GEMM inputs, f32 scores)
  fused        one fused program per batch, current defaults
  fused_f32    fused + TTL_LORA_COMPUTE=f32 TTL_ATTN_SCORES=f32 (round-1
               precision knobs; isolates the bf16-traffic changes)
  fused1       counts folded into the step program (one dispatch)
  S sweep via --s

Usage: python tools/perf_r02.py <variant> [--s N] [--classes N] [--arch A]
Each variant runs in its own process (env-dependent trace-time knobs).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant",
                    choices=["base", "fused", "fused_f32", "fused1",
                             "quant", "tpt", "tpt_quant", "cocoop",
                             "cocoop_quant", "text", "text_quant"])
    ap.add_argument("--s", type=int, default=8)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--busy", action="store_true",
                    help="also trace 4 steps and report device-busy "
                         "ms/step + busy samples/s (contention-free)")
    ap.add_argument("--ops", type=int, default=0, metavar="N",
                    help="with --busy: include the top-N device ops by "
                         "self-time in the row (bucket breakdown)")
    args = ap.parse_args()

    if args.variant in ("base", "fused_f32"):
        # round-1 precision knobs (the in-tree defaults are now mixed/low)
        os.environ["TTL_LORA_COMPUTE"] = "f32"
        os.environ["TTL_ATTN_SCORES"] = "f32"

    import numpy as np

    import jax
    import jax.numpy as jnp

    from ttl_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import pathlib

    from ttl_tpu.adapt.ttl import make_batched_ttl_fn, make_fused_ttl_fn
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
    from ttl_tpu.models.zoo import get_arch
    from ttl_tpu.ops.image import make_batched_view_fn
    from ttl_tpu.ops.lora import init_adapters
    from ttl_tpu.parallel.eval import make_count_fn

    S = args.s
    clip_cfg = get_arch(args.arch)
    cfg = TTLConfig(sample_batch=S, arch=args.arch,
                    resolution=clip_cfg.vision.image_size,
                    prefix_quant=("int8" if args.variant.endswith("quant")
                                  else "none"),
                    cocoop=args.variant.startswith("cocoop"),
                    lora_encoder=("prompt" if args.variant.startswith("tpt")
                                  else "text" if args.variant.startswith("text")
                                  else "image"))
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                              param_dtype=jnp.bfloat16)
    if cfg.prefix_quant == "int8":
        from ttl_tpu.ops.quant import attach_prefix_quant, quant_prefix_len
        params = attach_prefix_quant(params, quant_prefix_len(cfg, clip_cfg))
    names = json.loads(
        (pathlib.Path(__file__).parent.parent / "ttl_tpu" / "data" /
         "assets" / "imagenet_classnames.json").read_text())
    if not args.variant.startswith(("tpt", "cocoop")):
        # the prompt-adaptation variants build their own prompt state; the
        # frozen-classifier encode of up to 1000 prompts is dead work there
        toks = jnp.asarray(prompt_tokens(names[:args.classes]))
        text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
    from ttl_tpu.config import resolve_layer_range
    lo, hi = resolve_layer_range(cfg, clip_cfg)
    n_window = hi - lo + 1
    adapter_d = (clip_cfg.text.hidden if cfg.lora_encoder == "text"
                 else clip_cfg.vision.hidden)
    adapters0 = init_adapters(jax.random.PRNGKey(1), n_window,
                              adapter_d, cfg.rank, cfg.init_method)

    rng = np.random.RandomState(0)
    canv = (rng.rand(S, 512, 512, 3) * 255).astype(np.uint8)
    hs = np.full((S,), 375, np.int32)
    ws = np.full((S,), 500, np.int32)
    labels = rng.randint(0, args.classes, size=S).astype(np.int32)
    valid = np.ones((S,), bool)
    count_fn = make_count_fn()

    if args.variant.startswith("cocoop"):
        from ttl_tpu.adapt.cocoop import init_cocoop
        from ttl_tpu.adapt.ttl import make_fused_cocoop_fn
        co_state = init_cocoop(
            params["text"]["token_embed"].astype(jnp.float32),
            names[:args.classes], clip_cfg.vision.proj_dim,
            jax.random.PRNGKey(cfg.seed), cfg.ctx_init)
        co_fn = make_fused_cocoop_fn(clip_cfg, cfg)

        def step(i):
            idxs = np.arange(S, dtype=np.int32) + i * S
            res = co_fn(params, co_state, canv, hs, ws, idxs)
            return count_fn(res.logits, labels, valid)
    elif args.variant.startswith("text"):
        # make_fused_ttl_fn EOT-truncates the table internally
        fused = make_fused_ttl_fn(clip_cfg, cfg, tokens=toks)

        def step(i):
            idxs = np.arange(S, dtype=np.int32) + i * S
            res = fused(params, text_cls, adapters0, canv, hs, ws, idxs)
            return count_fn(res.logits, labels, valid)
    elif args.variant.startswith("tpt"):
        from ttl_tpu.adapt.ttl import make_fused_tpt_fn
        from ttl_tpu.models.prompts import init_prompt_learner
        pl_state = init_prompt_learner(
            params["text"]["token_embed"].astype(jnp.float32),
            names[:args.classes], cfg.ctx_init)
        tpt_fn = make_fused_tpt_fn(clip_cfg, cfg)

        def step(i):
            idxs = np.arange(S, dtype=np.int32) + i * S
            res, _ = tpt_fn(params, pl_state, canv, hs, ws, idxs)
            return count_fn(res.logits, labels, valid)
    elif args.variant == "base":
        view_fn = make_batched_view_fn(cfg.batch_size, cfg.resolution)
        adapt_fn = make_batched_ttl_fn(clip_cfg, cfg)
        root = jax.random.PRNGKey(cfg.seed)

        def step(i):
            idxs = jnp.asarray(np.arange(S, dtype=np.uint32) + i * S)
            keys = jax.vmap(lambda ix: jax.random.fold_in(root, ix))(idxs)
            views = view_fn(jnp.asarray(canv), jnp.asarray(hs),
                            jnp.asarray(ws), keys)
            res = adapt_fn(params, text_cls, adapters0, views, keys)
            return count_fn(res.logits, labels, valid)
    elif args.variant == "fused1":
        # counts folded INTO the fused program: one dispatch per batch
        import jax as _jax
        fused = make_fused_ttl_fn(clip_cfg, cfg)

        @_jax.jit
        def step1(params, text_cls, adapters0, canv, hs, ws, idxs, labels,
                  valid):
            res = fused(params, text_cls, adapters0, canv, hs, ws, idxs)
            _, pred = _jax.lax.top_k(res.logits.astype(jnp.float32), 5)
            hit = (pred == labels[:, None]) & valid[:, None]
            return jnp.stack(
                [jnp.sum(_jax.numpy.any(hit[:, :k], axis=1),
                         dtype=jnp.int32) for k in (1, 5)]
                + [jnp.sum(valid, dtype=jnp.int32)])

        def step(i):
            idxs = np.arange(S, dtype=np.int32) + i * S
            return step1(params, text_cls, adapters0, canv, hs, ws, idxs,
                         labels, valid)
    else:
        fused = make_fused_ttl_fn(clip_cfg, cfg)

        def step(i):
            idxs = np.arange(S, dtype=np.int32) + i * S
            res = fused(params, text_cls, adapters0, canv, hs, ws, idxs)
            return count_fn(res.logits, labels, valid)

    # The tunneled relay chip shows large run-to-run wall-clock variance
    # (17-27 samples/s on identical binaries), so: measure W windows of
    # `iters` steps each - all steps of a window enqueued up-front (async),
    # then all fetched - and report the BEST window (min-time estimator;
    # contention only ever adds time).
    for i in range(2):
        np.asarray(step(i))
    windows = []
    for w in range(args.windows):
        t0 = time.time()
        pending = [step(1000 * (w + 1) + i) for i in range(args.iters)]
        for p in pending:
            np.asarray(p)
        windows.append((time.time() - t0) / args.iters)
    dt = min(windows)
    sps = S / dt
    row = {
        "variant": args.variant, "arch": args.arch, "s": S,
        "classes": args.classes,
        "samples_per_sec": round(sps, 2),
        "ms_per_sample": round(1000.0 / sps, 2),
        "windows_sps": [round(S / x, 2) for x in windows],
    }
    if args.busy:
        # contention-free co-primary (PERF_NOTES measurement protocol):
        # per-op self-times from a short xprof trace are stable to ~us
        # even when the relay inflates wall clock. Failures must not lose
        # the wall row already computed above (ADVICE r4): warn and emit
        # the wall-only row.
        import shutil
        import sys
        import tempfile

        from ttl_tpu.utils.profiling import device_busy_us, trace
        td = tempfile.mkdtemp(prefix="ttl_perf_trace_")
        try:
            with trace(td):
                pend = [step(9000 + i) for i in range(4)]
                for p in pend:
                    np.asarray(p)
            busy_us = device_busy_us(td)
            if busy_us:
                busy_ms = busy_us / 4 / 1000.0
                row["busy_ms_per_step"] = round(busy_ms, 1)
                row["busy_sps"] = round(S / (busy_ms / 1000.0), 2)
            if args.ops:
                from ttl_tpu.utils.profiling import op_stats
                row["top_ops"] = [
                    {"op": o["operation"], "type": o["type"],
                     "ms_per_step": round(o["self_time_us"] / 4 / 1000.0, 2),
                     "fraction": round(o["fraction"], 4),
                     "bound_by": o["bound_by"], "n": o["occurrences"]}
                    for o in op_stats(td, top=args.ops)]
        except Exception as e:
            print(f"perf_r02: busy trace failed ({type(e).__name__}: {e}); "
                  f"emitting wall-only row", file=sys.stderr)
        finally:
            shutil.rmtree(td, ignore_errors=True)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
