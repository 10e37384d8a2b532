#!/usr/bin/env python
"""TTL-TPU benchmark: adapted samples/sec/chip for the 64-view TTL step.

Measures the full device path of the default TTL configuration
(CLIP ViT-B/16, 64 views = 1 clean + 63 random-resized-crop/flip, LoRA r=16
alpha=32 on vision layers 9-11, DeYO entropy-reweighted loss, one AdamW step
lr 5e-3, episodic reset, adapted clean-view inference) over a 200-class
ImageNet-A-sized text table: uint8 canvases -> on-device view generation ->
jit'd episodic adaptation -> adapted logits.

Weights are random-init (zero-egress environment - no checkpoint download);
throughput is weight-independent. The reference publishes no throughput
numbers (BASELINE.md): its per-sample PyTorch loop is the bottleneck this
rebuild removes. `vs_baseline` is measured against the repo's north-star
target of 200 adapted samples/sec/chip (BASELINE.json).

Prints exactly one JSON line.
"""
import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ttl_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    from ttl_tpu.adapt.ttl import make_batched_ttl_fn
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
    from ttl_tpu.models.zoo import get_arch
    from ttl_tpu.ops.image import make_batched_view_fn
    from ttl_tpu.ops.lora import init_adapters

    S = 8          # samples adapted concurrently (throughput-flat from S=4)
    N_CLASSES = 200
    WARMUP, ITERS = 2, 8

    cfg = TTLConfig()  # reference defaults
    clip_cfg = get_arch(cfg.arch)
    params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                              param_dtype=jnp.bfloat16)
    names = json.loads(
        (pathlib.Path(__file__).parent / "ttl_tpu" / "data" / "assets" /
         "imagenet_classnames.json").read_text())
    toks = jnp.asarray(prompt_tokens(names[:N_CLASSES]))
    text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
    n_window = cfg.layer_range[1] - cfg.layer_range[0] + 1
    adapters0 = init_adapters(jax.random.PRNGKey(1), n_window,
                              clip_cfg.vision.hidden, cfg.rank,
                              cfg.init_method)

    view_fn = make_batched_view_fn(cfg.batch_size, cfg.resolution)
    adapt_fn = make_batched_ttl_fn(clip_cfg, cfg)

    rng = np.random.RandomState(0)
    canv = jnp.asarray((rng.rand(S, 512, 512, 3) * 255).astype(np.uint8))
    hs = jnp.full((S,), 375, jnp.int32)
    ws = jnp.full((S,), 500, jnp.int32)

    def step(i):
        keys = jax.random.split(jax.random.PRNGKey(i), S)
        views = view_fn(canv, hs, ws, keys)
        return adapt_fn(params, text_cls, adapters0, views, keys)

    # NOTE: logits are fetched to host to fence execution - on the
    # remote-relay TPU backend block_until_ready alone does not reliably
    # fence. Throughput is measured pipelined (depth 2, as the runner
    # executes): fetch of batch i-1 overlaps compute of batch i, so the
    # per-dispatch round trip amortizes out.
    for i in range(WARMUP):
        np.asarray(step(i).logits)
    t0 = time.time()
    pending = step(WARMUP)
    for i in range(1, ITERS):
        nxt = step(WARMUP + i)
        np.asarray(pending.logits)
        pending = nxt
    np.asarray(pending.logits)
    dt = (time.time() - t0) / ITERS
    samples_per_sec = S / dt
    print(json.dumps({
        "metric": "adapted samples/sec/chip (64-view TTL step, ViT-B/16)",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_sec / 200.0, 4),
    }))


if __name__ == "__main__":
    main()
