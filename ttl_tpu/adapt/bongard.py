"""Bongard-HOI episodic evaluation driver.

The reference bundles the Bongard-HOI dataset class (data/hoi_dataset.py,
reachable via set_id='bongard', datautils.py:66-69) but ships no evaluation
driver for it. This module completes the capability the dataset implies:
few-shot binary concept evaluation with optional test-time adaptation.

Protocol (per episode: 6 positive + 6 negative support images, 1 query per
polarity): encode the support images with the frozen CLIP vision tower,
build the two class prototypes as the L2-normalized mean support feature of
each polarity, then classify each query against the prototype table -
optionally through the full episodic TTL step (64 views + LoRA adaptation
with the DeYO objective over the 2-way logits), i.e. the prototype table
simply takes the place of the text classifier. Episodic reset semantics are
unchanged: every query starts from the same fresh adapter state.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TTLConfig
from ..models.clip import CLIPConfig, encode_image, l2_normalize
from ..utils.meters import AverageMeter, Summary
from .ttl import _make_view_fn_for, make_ttl_adapt_fn, sample_key


def make_bongard_step_fn(clip_cfg: CLIPConfig, cfg: TTLConfig):
    """Fused per-query program with a PER-SAMPLE classifier: f(params,
    protos[S,2,D], adapters0, canvases[S,...], hs, ws, idxs) -> AdaptResult.
    Identical to make_fused_ttl_fn except the classifier is vmapped (each
    query belongs to a different episode)."""
    view_fn = _make_view_fn_for(cfg)
    adapt_one = make_ttl_adapt_fn(clip_cfg, cfg)

    def one(params, protos, adapters0, canvas, h, w, idx):
        key = sample_key(cfg.seed, idx)
        views = view_fn(canvas, h, w, key)
        return adapt_one(params, protos, adapters0, views, key)

    return jax.jit(jax.vmap(one, in_axes=(None, 0, None, 0, 0, 0, 0)))


def make_support_encoder(clip_cfg: CLIPConfig, cfg: TTLConfig):
    """jit'd (params, canvases[N,...], hs, ws) -> [N, D] L2-normalized
    frozen features of the deterministic eval view."""
    from ..ops.image import preprocess_center
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def encode(params, canvases, hs, ws):
        views = jax.vmap(
            lambda c, h, w: preprocess_center(c, h, w, cfg.resolution,
                                              out_dtype=cd))(canvases, hs, ws)
        return l2_normalize(encode_image(params["vision"], views,
                                         clip_cfg.vision, compute_dtype=cd))

    return jax.jit(encode)


def evaluate_bongard(cfg: TTLConfig, dataset, clip_cfg, params, adapters0,
                     *, max_episodes: Optional[int] = None) -> float:
    """Episode accuracy (%) over the BongardDataset. `dataset[i]` must yield
    a BongardEpisode (ttl_tpu.data.bongard)."""
    from ..data.views import load_canvas

    if cfg.tta_steps > 0 and cfg.lora_encoder != "image":
        raise ValueError(
            "bongard episodic adaptation tunes vision-encoder LoRA against "
            "the support-prototype classifier; lora_encoder="
            f"{cfg.lora_encoder!r} has no text/prompt tower to adapt here. "
            "Use --lora_encoder image, or --tta_steps 0 for the pure "
            "prototype evaluation.")
    encode = make_support_encoder(clip_cfg, cfg)
    adapt = (make_bongard_step_fn(clip_cfg, cfg) if cfg.tta_steps > 0
             else None)
    canvas = 512
    acc = AverageMeter("Acc@1", ":6.2f", Summary.AVERAGE)

    n_ep = len(dataset) if max_episodes is None else min(len(dataset),
                                                         max_episodes)
    for ei in range(n_ep):
        ep = dataset[ei]
        paths = list(ep.support_paths) + list(ep.query_paths)
        canv = np.zeros((len(paths), canvas, canvas, 3), np.uint8)
        hs = np.zeros((len(paths),), np.int32)
        ws = np.zeros((len(paths),), np.int32)
        for k, p in enumerate(paths):
            canv[k], hs[k], ws[k] = load_canvas(p, canvas)

        n_sup = len(ep.support_paths)
        feats = encode(params, jnp.asarray(canv[:n_sup]),
                       jnp.asarray(hs[:n_sup]), jnp.asarray(ws[:n_sup]))
        labels = np.asarray(ep.support_labels)
        protos = jnp.stack([
            l2_normalize(jnp.mean(feats[labels == c], axis=0))
            for c in (0, 1)])  # [2, D], class order = label value

        nq = len(ep.query_paths)
        if adapt is None:
            qf = encode(params, jnp.asarray(canv[n_sup:]),
                        jnp.asarray(hs[n_sup:]), jnp.asarray(ws[n_sup:]))
            logits = jnp.exp(params["logit_scale"]) * qf @ protos.T
        else:
            protos_b = jnp.broadcast_to(protos, (nq,) + protos.shape)
            idxs = np.arange(nq, dtype=np.int32) + ei * nq
            res = adapt(params, protos_b, adapters0, canv[n_sup:],
                        hs[n_sup:], ws[n_sup:], idxs)
            logits = res.logits
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        correct = (pred == np.asarray(ep.query_labels)).mean()
        acc.update(100.0 * float(correct), nq)
    return acc.avg
