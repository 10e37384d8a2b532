#!/usr/bin/env python
"""Quantify the int8 frozen-prefix accuracy stand-in (VERDICT r2 #10).

Real-weight accuracy parity of `--prefix_quant int8` is environment-blocked
(zero egress, no checkpoint), so this tool puts a NUMBER on the "expected
small" claim with the strongest proxy available: at full ViT-B/16
dimensions, over a sweep of random canvases, run the exact fused TTL step
(64-view generation -> episodic adaptation -> adapted clean-view logits)
twice from identical inputs - full precision vs int8 prefix - and report

  * top-1 flip rate between the two adapted predictions,
  * top-5 set-overlap,
  * logit deviation stats (max / mean abs, on the adapted logits).

Usage (real TPU; CPU works but is ~1000x slower per sample):
  python tools/quant_fidelity.py --samples 256 --classes 200

Prints one JSON line; paste the table row into PERF_NOTES.md.
"""
import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--classes", type=int, default=200)
    ap.add_argument("--sample_batch", type=int, default=8)
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (tiny sweeps only)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ttl_tpu.adapt.ttl import make_fused_ttl_fn
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
    from ttl_tpu.models.zoo import get_arch
    from ttl_tpu.ops.lora import init_adapters
    from ttl_tpu.ops.quant import attach_prefix_quant, quant_prefix_len
    from ttl_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    S = args.sample_batch
    clip_cfg = get_arch(args.arch)
    # resolution must follow the arch (ViT-L/14@336px patchifies at 336;
    # the TTLConfig default of 224 would break the vision reshape)
    cfg = TTLConfig(arch=args.arch, sample_batch=S,
                    resolution=clip_cfg.vision.image_size)
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                              param_dtype=jnp.bfloat16)
    names = json.loads(
        (pathlib.Path(__file__).resolve().parent.parent / "ttl_tpu" / "data"
         / "assets" / "imagenet_classnames.json").read_text())
    toks = jnp.asarray(prompt_tokens(names[: args.classes]))
    text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
    from ttl_tpu.config import resolve_layer_range
    lo, hi = resolve_layer_range(cfg, clip_cfg)
    adapters0 = init_adapters(jax.random.PRNGKey(1), hi - lo + 1,
                              clip_cfg.vision.hidden, cfg.rank,
                              cfg.init_method)
    qcfg = cfg.replace(prefix_quant="int8")
    qparams = attach_prefix_quant(params, quant_prefix_len(qcfg, clip_cfg))

    fn_f = make_fused_ttl_fn(clip_cfg, cfg)
    fn_q = make_fused_ttl_fn(clip_cfg, qcfg)

    flips = 0
    top5_overlap = 0
    max_dev = 0.0
    sum_dev = 0.0
    n_logits = 0
    n_done = 0
    rng = np.random.RandomState(0)
    while n_done < args.samples:
        canv = (rng.rand(S, 512, 512, 3) * 255).astype(np.uint8)
        hs = rng.randint(200, 500, (S,)).astype(np.int32)
        ws = rng.randint(200, 500, (S,)).astype(np.int32)
        idxs = np.arange(S, dtype=np.int32) + n_done
        lf = np.asarray(fn_f(params, text_cls, adapters0, canv, hs, ws,
                             idxs).logits, np.float32)
        lq = np.asarray(fn_q(qparams, text_cls, adapters0, canv, hs, ws,
                             idxs).logits, np.float32)
        flips += int(np.sum(lf.argmax(-1) != lq.argmax(-1)))
        for a, b in zip(lf, lq):
            ta = set(np.argsort(-a)[:5].tolist())
            tb = set(np.argsort(-b)[:5].tolist())
            top5_overlap += len(ta & tb)
        dev = np.abs(lf - lq)
        max_dev = max(max_dev, float(dev.max()))
        sum_dev += float(dev.sum())
        n_logits += dev.size
        n_done += S

    out = {
        "metric": "int8-prefix vs full-precision adapted predictions "
                  f"({args.arch}, random weights, {args.classes} classes)",
        "samples": n_done,
        "top1_flip_rate": round(flips / n_done, 4),
        "top5_overlap_of_5": round(top5_overlap / n_done, 3),
        "logit_max_abs_dev": round(max_dev, 4),
        "logit_mean_abs_dev": round(sum_dev / n_logits, 5),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
