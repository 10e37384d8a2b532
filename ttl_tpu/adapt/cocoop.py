"""CoCoOp variant: image-conditioned prompt generation + test-time ctx tuning.

Functional port of the reference's CoCoOp path (clip/cocoop.py:19-234,
ttl.py:71-74,92-93): a meta-net (Linear -> ReLU -> Linear) maps the image
feature to a per-sample shift of the CoOp ctx vectors; at test time the
shifted ctx (`pgen_ctx`) is optimized with the TPT selection + avg-entropy
objective.

Faithfulness note: in the reference, the adapted pgen_ctx is a local tensor
that the final inference call never reads - `model(image)` re-runs plain
CoCoOp inference with the *unadapted* meta-net ctx (ttl.py:347-352 vs
cocoop.py:153-170). `adapt_and_infer` reproduces exactly that (its
`logits` field), and additionally exposes the adapted-ctx logits the
adaptation actually produced (`adapted_logits`) for users who want them.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..config import TTLConfig
from ..models.clip import (CLIPConfig, encode_image, l2_normalize,
                           text_features_from_embeddings)
from ..models.prompts import prompt_tokens
from ..ops.entropy import select_confident, tpt_loss
from ..tokenizer.bpe import default_tokenizer
from .ttl import make_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CoCoOpState:
    """Prompt-generator state (CoCoOpPromptLearner buffers + meta-net)."""
    ctx: jax.Array        # [n_ctx, d] base ctx vectors
    meta_w1: jax.Array    # [proj_dim, proj_dim // 16]
    meta_b1: jax.Array
    meta_w2: jax.Array    # [proj_dim // 16, d]
    meta_b2: jax.Array
    prefix: jax.Array     # [C, 1, d]
    suffix: jax.Array     # [C, L - 1 - n_ctx, d]
    tokenized: jax.Array  # [C, L]  (L <= 77, EOT-truncated)
    n_ctx: int = dataclasses.field(metadata={"static": True})


def init_cocoop(token_embed: jax.Array, classnames: Sequence[str],
                proj_dim: int, key: jax.Array,
                ctx_init: str = "a_photo_of_a",
                truncate: bool = True) -> CoCoOpState:
    """Random meta-net init (torch Linear default: U(+-1/sqrt(fan_in))); a
    trained CoCoOp checkpoint can overwrite the fields via load_prompt_ckpt.
    `truncate` drops prompt padding past the longest EOT (exact -
    models/prompts.needed_ctx_len; the text tower re-encodes these prompts
    every adaptation step).
    """
    from ..models.prompts import needed_ctx_len
    tk = default_tokenizer()
    phrase = ctx_init.replace("_", " ")
    n_ctx = len(phrase.split(" "))
    ids = tk.encode(phrase)
    toks = prompt_tokens(classnames, phrase)
    if truncate:
        toks = toks[:, : needed_ctx_len(toks)]
    toks = jnp.asarray(toks)
    embedding = token_embed[toks]
    d = token_embed.shape[-1]
    hidden = proj_dim // 16
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def unif(k, shape, fan_in):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(k, shape, jnp.float32, -bound, bound)

    return CoCoOpState(
        ctx=token_embed[jnp.asarray(ids)].astype(jnp.float32),
        meta_w1=unif(k1, (proj_dim, hidden), proj_dim),
        meta_b1=unif(k2, (hidden,), proj_dim),
        meta_w2=unif(k3, (hidden, d), hidden),
        meta_b2=unif(k4, (d,), hidden),
        prefix=embedding[:, :1].astype(jnp.float32),
        suffix=embedding[:, 1 + n_ctx:].astype(jnp.float32),
        tokenized=toks,
        n_ctx=n_ctx,
    )


def meta_shift(state: CoCoOpState, image_features: jax.Array) -> jax.Array:
    """bias = meta_net(im_feat); ctx_shifted = ctx + bias (cocoop.py:118-125).
    image_features: [B, proj_dim] -> [B, n_ctx, d]."""
    h = jax.nn.relu(image_features @ state.meta_w1 + state.meta_b1)
    bias = h @ state.meta_w2 + state.meta_b2
    return state.ctx[None] + bias[:, None, :]


class CoCoOpResult(NamedTuple):
    logits: jax.Array          # reference-faithful: conditioned, UNadapted
    adapted_logits: jax.Array  # clean view under the adapted pgen_ctx
    losses: jax.Array


def make_cocoop_adapt_fn(clip_cfg: CLIPConfig, cfg: TTLConfig):
    """f(params, state, views, key) -> CoCoOpResult.

    gen_ctx: image features of all views -> mean -> shifted ctx (pgen_ctx)
    (cocoop.py:172-182); adapt: AdamW on pgen_ctx with TPT selection +
    avg-entropy (ttl.py:71-74,92-108); inference: per-image conditioned
    prompts with the unadapted meta-net (cocoop.py:153-170).
    """
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    opt = make_optimizer(cfg)
    k_sel = max(int(cfg.batch_size * cfg.selection_p), 1)

    def text_for_ctx(params, state, ctx_row):
        """ctx_row [n_ctx, d] -> normalized text features [C, proj]."""
        n_cls = state.prefix.shape[0]
        ctx_block = jnp.broadcast_to(ctx_row, (n_cls, *ctx_row.shape))
        embs = jnp.concatenate([state.prefix, ctx_block, state.suffix], axis=1)
        # remat for the same reason as the TPT path (adapt/ttl.py): the
        # text tower is differentiated w.r.t. pgen_ctx each step and its
        # saved attention probs OOM real class counts otherwise
        tf = text_features_from_embeddings(params["text"], embs,
                                           state.tokenized, clip_cfg.text,
                                           compute_dtype=cd, remat=True)
        return l2_normalize(tf)

    def adapt_and_infer(params, state, views, key):
        ls = jnp.exp(params["logit_scale"])
        vf = l2_normalize(encode_image(params["vision"], views,
                                       clip_cfg.vision, compute_dtype=cd))
        # gen_ctx over the mean view feature (cocoop.py:179)
        pgen_ctx0 = jax.lax.stop_gradient(
            meta_shift(state, jnp.mean(vf, axis=0, keepdims=True)))[0]

        def logits_for(ctx_row):
            return ls * vf @ text_for_ctx(params, state, ctx_row).T

        def loss_fn(ctx_row, mask):
            return tpt_loss(logits_for(ctx_row), mask), None

        # confident-view selection is frozen on the first step's forward
        # (ttl.py:97-100), which is the initial-state (pgen_ctx0) forward -
        # hoisted out of the scan exactly as in the TPT path (adapt/ttl.py),
        # saving one stop-grad text-tower forward per step
        _, _, mask = select_confident(
            jax.lax.stop_gradient(logits_for(pgen_ctx0)), k_sel)

        opt_state = opt.init(pgen_ctx0)

        def step(carry, _):
            ctx_row, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ctx_row, mask)
            updates, opt_state = opt.update(grads, opt_state, ctx_row)
            ctx_row = ctx_row + updates
            return (ctx_row, opt_state), loss

        (ctx_adapted, _), losses = jax.lax.scan(
            step, (pgen_ctx0, opt_state), None, length=cfg.tta_steps)

        # reference-faithful final inference: conditioned on the clean view,
        # UNadapted meta ctx (ttl.py:350-352 discards pgen_ctx)
        clean_ctx = meta_shift(state, vf[:1])[0]
        ref_logits = (ls * vf[:1] @ text_for_ctx(params, state,
                                                 clean_ctx).T)[0]
        adapted_logits = (ls * vf[:1] @ text_for_ctx(params, state,
                                                     ctx_adapted).T)[0]
        return CoCoOpResult(logits=ref_logits, adapted_logits=adapted_logits,
                            losses=losses)

    return adapt_and_infer
