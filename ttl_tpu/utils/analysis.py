"""Offline analysis and visualization.

JAX-native equivalents of the reference's functions.py (attention rollout
functions.py:88-104, heatmap overlay 107-127, t-SNE feature plots 131-162).
Not on the hot path; matplotlib/sklearn are imported lazily and all outputs
are plain arrays or saved files.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import (VisionConfig, layer_norm, linear, quick_gelu)


def vision_attention_maps(p, images: jax.Array, cfg: VisionConfig, *,
                          compute_dtype=jnp.float32) -> jax.Array:
    """Run the ViT tower and capture per-layer attention probabilities.

    Returns [L, B, H, S, S] (f32). Unrolled layers (no scan) - analysis
    only, compile once per shape.
    """
    b = images.shape[0]
    g, pt = cfg.grid, cfg.patch
    x = images.astype(compute_dtype)
    x = x.reshape(b, 3, g, pt, g, pt).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g * g, 3 * pt * pt)
    x = jnp.matmul(x, p["patch_embed"].astype(compute_dtype))
    cls = jnp.broadcast_to(p["class_embed"].astype(compute_dtype),
                           (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(compute_dtype)
    x = layer_norm(x, p["ln_pre"], cfg.ln_eps)

    maps = []
    for i in range(cfg.layers):
        lp = jax.tree.map(lambda a: a[i], p["layers"])
        h = layer_norm(x, lp["ln1"], cfg.ln_eps)
        q = linear(h, lp["attn"]["q"])
        k = linear(h, lp["attn"]["k"])
        v = linear(h, lp["attn"]["v"])
        s = x.shape[1]
        hd = cfg.hidden // cfg.heads

        def split(t):
            return t.reshape(b, s, cfg.heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)
                            ).astype(jnp.float32) / np.sqrt(hd)
        w = jax.nn.softmax(scores, axis=-1)
        maps.append(w)
        out = jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden)
        x = x + linear(out, lp["attn"]["o"])
        h = layer_norm(x, lp["ln2"], cfg.ln_eps)
        x = x + linear(quick_gelu(linear(h, lp["mlp"]["fc1"])),
                       lp["mlp"]["fc2"])
    return jnp.stack(maps)


def attention_rollout(attn_maps: jax.Array,
                      discard_ratio: float = 0.0) -> jax.Array:
    """Abnar & Zuidema rollout (functions.py:88-104): average heads, add the
    residual identity, renormalize, multiply through the layers.

    attn_maps [L, B, H, S, S] -> CLS-to-patch relevance [B, S-1].
    """
    l, b, h, s, _ = attn_maps.shape
    a = jnp.mean(attn_maps, axis=2)                      # [L, B, S, S]
    if discard_ratio > 0:
        k = int(s * s * discard_ratio)
        flat = a.reshape(l, b, -1)
        thresh = jnp.sort(flat, axis=-1)[..., k][..., None]
        a = jnp.where(flat < thresh, 0.0, flat).reshape(l, b, s, s)
    a = a + jnp.eye(s)[None, None]
    a = a / jnp.sum(a, axis=-1, keepdims=True)

    def step(carry, layer_a):
        return jnp.einsum("bij,bjk->bik", layer_a, carry), None

    rollout, _ = jax.lax.scan(step, jnp.broadcast_to(jnp.eye(s), (b, s, s)),
                              a)
    cls_rel = rollout[:, 0, 1:]
    return cls_rel / jnp.max(cls_rel, axis=-1, keepdims=True)


def heatmap_overlay(image01: np.ndarray, relevance: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Overlay a [P] patch-relevance map onto an [H,W,3] image in [0,1]
    (functions.py:107-127, without cv2: jet colormap via matplotlib)."""
    import matplotlib.cm as cm

    h, w = image01.shape[:2]
    g = int(round(np.sqrt(relevance.shape[-1])))
    rel = np.asarray(relevance, np.float32).reshape(g, g)
    rel = np.asarray(jax.image.resize(jnp.asarray(rel), (h, w), "bilinear"))
    rel = (rel - rel.min()) / max(rel.max() - rel.min(), 1e-8)
    heat = cm.jet(rel)[..., :3]
    return np.clip((1 - alpha) * image01 + alpha * heat, 0, 1)


def tsne_features(features: np.ndarray, labels: Sequence[int],
                  out_path: Optional[str] = None, perplexity: float = 30.0):
    """2-D t-SNE of feature vectors, optionally saved as a scatter plot
    (functions.py:131-162)."""
    from sklearn.manifold import TSNE

    emb = TSNE(n_components=2,
               perplexity=min(perplexity, max(len(features) - 1, 1) / 3),
               init="pca", random_state=0).fit_transform(
        np.asarray(features, np.float32))
    if out_path:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=list(labels), cmap="tab10",
                        s=12)
        fig.colorbar(sc, ax=ax)
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return emb
