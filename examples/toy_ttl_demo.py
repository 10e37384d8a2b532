"""Toy end-to-end TTL demo: train a tiny CLIP vision tower, shift the test
distribution, and watch the episodic adaptation mechanics.

Runs on CPU in ~2 minutes (no checkpoints or datasets needed):

    python examples/toy_ttl_demo.py

What it shows:
- the full pipeline (training -> anchor classifier -> canvas -> device views
  -> episodic TTL step) wired end to end;
- confidence maximization doing exactly what it says: mean max-probability
  jumps (e.g. 0.78 -> 0.95+) after one AdamW step on the LoRA adapters;
- an honest caveat: on a 4-class toy under extreme synthetic noise,
  committing confidently can *hurt* top-1 - the paper's OOD gains
  (BASELINE.md) rely on real CLIP feature geometry and 200-1000 class
  structure. This demo validates the machinery, not the research claim.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ttl_tpu.adapt.ttl import make_batched_ttl_fn  # noqa: E402
from ttl_tpu.config import TTLConfig  # noqa: E402
from ttl_tpu.models.clip import (init_clip_params, l2_normalize,  # noqa: E402
                                 vision_features)
from ttl_tpu.models.zoo import TEST_TINY  # noqa: E402
from ttl_tpu.ops.image import make_batched_view_fn, normalize  # noqa: E402
from ttl_tpu.ops.lora import init_adapters  # noqa: E402

V = TEST_TINY.vision
COLORS = jnp.asarray([[1, .1, .1], [.1, 1, .1], [.1, .1, 1], [1, 1, .1]])
CLASSES = ["red", "green", "blue", "yellow"]


def make_batch(labels, keys, noise=0.05):
    def one(cls, key):
        img = COLORS[cls][:, None, None] * jnp.ones((3, 64, 64)) \
            + noise * jax.random.normal(key, (3, 64, 64))
        return jnp.clip(img, 0, 1)
    return jax.vmap(one)(labels, keys)


def main():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    anchors = jnp.eye(4, V.proj_dim)  # stands in for the text classifier
    params["logit_scale"] = jnp.asarray(np.log(10.0), jnp.float32)

    def loss_fn(vp, imgs, labels):
        vf = l2_normalize(vision_features(vp, imgs, V,
                                          compute_dtype=jnp.float32))
        logits = jnp.exp(params["logit_scale"]) * vf @ anchors.T
        return -jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(len(labels)), labels])

    opt = optax.adam(2e-3)
    vp = params["vision"]
    state = opt.init(vp)

    @jax.jit
    def train_step(vp, s, imgs, labels):
        _, g = jax.value_and_grad(loss_fn)(vp, imgs, labels)
        u, s = opt.update(g, s, vp)
        return optax.apply_updates(vp, u), s

    key = jax.random.PRNGKey(42)
    print("training tiny CLIP vision tower (300 steps, CPU)...")
    for _ in range(300):
        key, k1, k2 = jax.random.split(key, 3)
        labels = jax.random.randint(k1, (16,), 0, 4)
        vp, state = train_step(
            vp, state, normalize(make_batch(labels,
                                            jax.random.split(k2, 16))),
            labels)
    params["vision"] = vp

    labels = jnp.tile(jnp.arange(4), 8)
    clean = make_batch(labels, jax.random.split(jax.random.PRNGKey(8), 32))
    shift = jnp.clip(0.15 * clean + 0.4 + 0.55 * jax.random.normal(
        jax.random.PRNGKey(77), clean.shape), 0, 1)

    cfg = TTLConfig(batch_size=16, layer_range=(2, 3), rank=4,
                    compute_dtype="float32")
    view_fn = make_batched_view_fn(cfg.batch_size, 64,
                                   out_dtype=jnp.float32)
    adapt = make_batched_ttl_fn(TEST_TINY, cfg, zero_shot_aux=True)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2, V.hidden,
                              cfg.rank, "xavier")

    canv = np.zeros((32, 128, 128, 3), np.uint8)
    canv[:, :64, :64] = (np.asarray(shift.transpose(0, 2, 3, 1)) * 255
                         ).astype(np.uint8)
    hs = jnp.full((32,), 64, jnp.int32)
    ws = jnp.full((32,), 64, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), 32)
    views = view_fn(jnp.asarray(canv), hs, ws, keys)
    res = adapt(params, anchors, adapters0, views, keys)

    def stats(logits):
        acc = float(jnp.mean(jnp.argmax(logits, -1) == labels))
        conf = float(jnp.mean(jnp.max(jax.nn.softmax(logits, -1), -1)))
        return acc, conf

    zs_acc, zs_conf = stats(res.zero_shot_logits)
    ad_acc, ad_conf = stats(res.logits)
    print(f"shifted test set (32 samples, 4 classes):")
    print(f"  zero-shot : top-1 {zs_acc:.3f}  mean confidence {zs_conf:.3f}")
    print(f"  TTL       : top-1 {ad_acc:.3f}  mean confidence {ad_conf:.3f}")
    print("(confidence maximization is the mechanism; accuracy gains need "
          "real CLIP geometry - see BASELINE.md)")


if __name__ == "__main__":
    main()
