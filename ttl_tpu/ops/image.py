"""Device-side image preprocessing and view generation.

TPU-native replacement for the reference's host/PIL pipeline
(data/datautils.py:97-157, ttl.py:225-248): the 64-view batch per test sample
(1 deterministic resize/center-crop view + 63 random-resized-crop/flip views)
is generated *on device* inside one jit program from a PRNG key, instead of
in DataLoader worker processes.

Geometry design: the host ships each decoded image once, as uint8 padded to a
static square canvas plus its true (h, w). Every view is then a single
`jax.image.scale_and_translate` bicubic gather from that canvas - crop and
resize fused into one antialiased sampling op, which is exactly the math of
PIL crop-then-bicubic-resize. Crop-parameter sampling reproduces torchvision
`RandomResizedCrop(224)` semantics (scale (0.08,1), log-uniform ratio
(3/4,4/3), 10 rejection attempts, center fallback).

The 13 AugMix ops (data/augmix_ops.py:56-148) are implemented in
ttl_tpu.ops.augmix and mixed here per AugMix's Dirichlet/Beta scheme
(datautils.py:110-126) - but note the reference ships with `aug_list=[]`
(datautils.py:135-138), so the default TTL view is crop+flip only; augmix
chains are enabled via TTLConfig/aug_list for capability parity.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# CLIP normalization constants (ttl.py:225-226)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

RRC_SCALE = (0.08, 1.0)
RRC_RATIO = (3.0 / 4.0, 4.0 / 3.0)


def normalize(x: jax.Array) -> jax.Array:
    """[...,3,H,W] float in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, x.dtype).reshape(3, 1, 1)
    std = jnp.asarray(CLIP_STD, x.dtype).reshape(3, 1, 1)
    return (x - mean) / std


def _crop_resize(canvas: jax.Array, box: jax.Array, out_size: int,
                 method: str = "cubic") -> jax.Array:
    """Sample crop box [top, left, ch, cw] (float, source coords) from
    canvas [H,W,3] to [out,out,3] with fused antialiased bicubic."""
    top, left, ch, cw = box[0], box[1], box[2], box[3]
    scale = jnp.stack([out_size / ch, out_size / cw])
    translation = jnp.stack([-top * out_size / ch, -left * out_size / cw])
    return jax.image.scale_and_translate(
        canvas, (out_size, out_size, 3), (0, 1), scale, translation,
        method=method, antialias=True)


def sample_rrc_box(key: jax.Array, h: jax.Array, w: jax.Array,
                   scale=RRC_SCALE, ratio=RRC_RATIO) -> jax.Array:
    """torchvision RandomResizedCrop.get_params as static-shape JAX: 10
    vectorized attempts, first valid wins, else the aspect-clamped center
    fallback. Returns [top, left, ch, cw] floats."""
    h = h.astype(jnp.float32)
    w = w.astype(jnp.float32)
    area = h * w
    k_area, k_ratio, k_ij = jax.random.split(key, 3)
    target_area = area * jax.random.uniform(
        k_area, (10,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ratio, (10,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.round(jnp.sqrt(target_area * r))
    ch = jnp.round(jnp.sqrt(target_area / r))
    valid = (cw > 0) & (cw <= w) & (ch > 0) & (ch <= h)
    idx = jnp.argmax(valid)  # first True (argmax of bools)
    any_valid = jnp.any(valid)
    cw_v, ch_v = cw[idx], ch[idx]
    u = jax.random.uniform(k_ij, (2,))
    # torchvision: i = randint(0, h - ch + 1)
    top_v = jnp.floor(u[0] * (h - ch_v + 1.0))
    left_v = jnp.floor(u[1] * (w - cw_v + 1.0))

    # fallback: clamp aspect, center (torchvision RandomResizedCrop fallback)
    in_ratio = w / h
    cw_f = jnp.where(in_ratio < ratio[0], w,
                     jnp.where(in_ratio > ratio[1], jnp.round(h * ratio[1]), w))
    ch_f = jnp.where(in_ratio < ratio[0], jnp.round(w / ratio[0]),
                     jnp.where(in_ratio > ratio[1], h, h))
    top_f = jnp.round((h - ch_f) / 2.0)
    left_f = jnp.round((w - cw_f) / 2.0)

    return jnp.where(any_valid,
                     jnp.stack([top_v, left_v, ch_v, cw_v]),
                     jnp.stack([top_f, left_f, ch_f, cw_f]))


def center_box(h: jax.Array, w: jax.Array) -> jax.Array:
    """Resize(short->224)+CenterCrop(224) == centered short-side square crop
    (ttl.py:233-238). Returns [top, left, ch, cw]."""
    h = h.astype(jnp.float32)
    w = w.astype(jnp.float32)
    short = jnp.minimum(h, w)
    return jnp.stack([(h - short) / 2.0, (w - short) / 2.0, short, short])


def make_view_fn(n_views: int, out_size: int = 224, *,
                 aug_ops: Sequence[str] = (), severity: int = 1,
                 out_dtype=jnp.bfloat16):
    """Build views(canvas_u8 [S,S,3], h, w, key) -> [n_views, 3, out, out].

    View 0 is the deterministic center view; views 1..n-1 are
    RandomResizedCrop + horizontal flip (p=0.5), optionally AugMix-mixed over
    `aug_ops` chains (AugMixAugmenter.__call__, datautils.py:141-157).
    """
    use_augmix = len(aug_ops) > 0
    if use_augmix:
        from .augmix import make_augmix_chain
        chain_fn = make_augmix_chain(aug_ops, severity, out_size)

    def one_view(canvas_f, h, w, key):
        k_box, k_flip, k_mix = jax.random.split(key, 3)
        box = sample_rrc_box(k_box, h, w)
        v = _crop_resize(canvas_f, box, out_size)  # [out,out,3], [0,255]
        flip = jax.random.bernoulli(k_flip)
        v = jnp.where(flip, v[:, ::-1], v)
        v01 = jnp.clip(v / 255.0, 0.0, 1.0)
        if use_augmix:
            # AugMix: mix = m * clean + (1-m) * sum_i w_i chain_i(x)
            # (datautils.py:116-125); chains see the *unnormalized* view
            kw, km, kc = jax.random.split(k_mix, 3)
            ws = jax.random.dirichlet(kw, jnp.ones((3,)))
            m = jax.random.uniform(km)  # Beta(1,1)
            chains = jax.vmap(lambda ck: chain_fn(v01, ck))(
                jax.random.split(kc, 3))
            mixed = jnp.einsum("c,chwk->hwk", ws, chains)
            v01 = m * v01 + (1.0 - m) * mixed
        return v01

    def views(canvas_u8, h, w, key):
        canvas_f = canvas_u8.astype(jnp.float32)
        clean = _crop_resize(canvas_f, center_box(h, w), out_size)
        clean = jnp.clip(clean / 255.0, 0.0, 1.0)
        keys = jax.random.split(key, n_views - 1)
        augs = jax.vmap(lambda k: one_view(canvas_f, h, w, k))(keys)
        stack = jnp.concatenate([clean[None], augs], axis=0)
        stack = stack.transpose(0, 3, 1, 2)  # [V,H,W,3] -> [V,3,H,W]
        return normalize(stack).astype(out_dtype)

    return views


def make_batched_view_fn(n_views: int, out_size: int = 224, **kw):
    """vmap over a sample batch: (canvases [B,S,S,3], hs [B], ws [B],
    keys [B]) -> [B, n_views, 3, out, out]."""
    f = make_view_fn(n_views, out_size, **kw)
    return jax.jit(jax.vmap(f))


def preprocess_center(canvas_u8, h, w, out_size: int = 224,
                      out_dtype=jnp.float32):
    """Single deterministic eval view (the reference's non-tpt transform,
    ttl.py:243-248)."""
    canvas_f = canvas_u8.astype(jnp.float32)
    v = _crop_resize(canvas_f, center_box(h, w), out_size)
    v = jnp.clip(v / 255.0, 0.0, 1.0).transpose(2, 0, 1)
    return normalize(v).astype(out_dtype)
