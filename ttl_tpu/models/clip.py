"""CLIP ViT towers as functional JAX pytrees.

TPU-first re-design of the CLIP model stack the reference assembles out of
HuggingFace `CLIPModel` + OpenAI `clip.model` (reference: clip/model.py,
clip/custom_clip.py:62-83,570-723):

- Parameters are plain nested-dict pytrees; there is no module state. LoRA
  is a *separate* adapter pytree applied as a functional overlay
  (ttl_tpu/ops/lora.py), so the reference's snapshot/copy_ reset machinery
  (custom_clip.py:139-217) collapses to "re-bind the initial adapter pytree".
- Transformer layers are *stacked* along a leading axis and executed with
  `lax.scan`, except the LoRA-adapted window, which is unrolled so autodiff
  only walks the adapted suffix backward (layers below the window carry no
  trainable leaves - their LoRA contribution is exactly zero because B=0,
  see custom_clip.py:176-200, so they are compiled as a pure frozen prefix).
- Patchify is a reshape+matmul (MXU-native) instead of a conv.
- All matmuls run in the configured compute dtype (bf16 by default) with f32
  accumulation; layernorms and the final feature/logit math run in f32.

Weight layout convention: every linear stores `w` as [in, out] so the
forward is `x @ w + b` (torch checkpoints are transposed on conversion).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TowerConfig:
    hidden: int
    layers: int
    heads: int
    proj_dim: int
    mlp_ratio: int = 4
    ln_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class VisionConfig(TowerConfig):
    patch: int = 16
    image_size: int = 224

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


@dataclasses.dataclass(frozen=True)
class TextConfig(TowerConfig):
    vocab: int = 49408
    ctx: int = 77


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    vision: VisionConfig
    text: TextConfig
    compute_dtype: Any = jnp.bfloat16


# ---------------------------------------------------------------- primitives

def layer_norm(x: jax.Array, p: Params, eps: float) -> jax.Array:
    """f32 layernorm regardless of activation dtype (matches the reference's
    fp16-safe LayerNorm, clip/model.py:157-165).

    Stats avoid jnp.var, which materialized a centered f32 copy of the
    [B,S,D] activation to HBM (measured ~8% of busy time at the TTL batch):
    the default computes mean then mean((x-mu)^2) with the square fused
    into the reduce (cancellation-safe); TTL_LN_STATS=ex2 selects the
    E[x^2]-mu^2 single-dependency form (~3% faster, unsafe for large
    common-mode activations). See _ln_stats_mode.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if _ln_stats_mode() == "ex2":
        var = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
            - jnp.square(mu), 0.0)
    else:
        # centered second pass: cancellation-safe for activations with a
        # large common-mode offset (real trained checkpoints), with the
        # square fused into the reduce (no materialized (x-mu) copy -
        # jnp.var's was the round-1 HBM cost, not the extra pass)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def linear(x: jax.Array, p: Params) -> jax.Array:
    """x @ w + b in the activation dtype. The MXU accumulates bf16 GEMMs in
    f32 natively, so emitting the output dtype directly skips an f32
    [B,S,D_out] epilogue tensor; the bias add then happens in the activation
    dtype, exactly like the reference's fp16-autocast Linear (ttl.py:222).
    f32 activations are unaffected."""
    y = jnp.matmul(x, p["w"].astype(x.dtype))
    return y + p["b"].astype(x.dtype) if "b" in p else y


def _attention(q, k, v, heads: int, causal: bool,
               seq_len: Optional[int] = None):
    """[B,S,D] multi-head attention; softmax in f32. Routes through the
    Pallas fused kernel when TTL_FUSED_ATTENTION=1 and the einsum
    formulation otherwise - identical numerics at f32; in bf16 the default
    einsum path stores scores bf16 (ops/attention._scores_dtype_low) while
    the kernel keeps them f32 in VMEM. (A BSHD-layout *einsum* variant
    avoiding the physical head transposes measured neutral on-chip: XLA
    inserts equivalent copies for the einsum layouts - see PERF_NOTES.md
    round 2. TTL_FUSED_ATTENTION=bshd is the r5 *kernel* in that layout:
    it consumes [B,S,H*D] in place, so no transposes exist to insert.)"""
    from ..ops import attention as fa

    b, s, d = q.shape
    hd = d // heads
    mode = fa.fused_mode()
    if mode == "bshd" and causal:
        # Text towers stay on the einsum: at their shapes (77-80 tokens,
        # 8-12 heads, class-count batch) the per-program kernel work is too
        # small — the text-LoRA row measured 72.35 busy sps on the bshd
        # route vs 80.99 on the einsum (BENCH_ARCHES r5), while every
        # non-causal vision tower won (+2.4% ViT-B/32 .. +26% ViT-L).
        mode = ""
    if mode == "bshd":
        # Layout-native kernel: no head split, no physical transposes.
        # seq_len marks tower-level pre-padding (see _maybe_pad_tokens).
        return fa.attention_bshd_fused(q, k, v, heads, causal, seq_len)
    if seq_len is not None:
        raise ValueError(
            "pre-padded activations (seq_len set) require the bshd route; "
            "the einsum/per_head/heads paths have no key masking")

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    if mode == "heads" and not fa.heads_mode_fits(heads, s, hd,
                                                  q.dtype.itemsize):
        # e.g. ViT-L: 16 heads x 272^2 f32 scores exceed scoped VMEM -
        # the kernel would die with an opaque XLA compile error. Degrade
        # to the per-head grid, which always fits at these lengths.
        import warnings
        warnings.warn(
            f"TTL_FUSED_ATTENTION=heads does not fit scoped VMEM at "
            f"[{heads} heads, {s} tokens, {hd} head_dim]; falling back "
            "to the per_head kernel (PERF_NOTES 'Attention kernels at "
            "ViT-L shapes')", stacklevel=2)
        mode = "per_head"
    if mode == "per_head":
        out = fa.attention(q, k, v, causal)
    elif mode == "heads":
        out = fa.attention_heads(q, k, v, causal)
    else:
        out = fa.reference_attention(q, k, v, causal)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


def _ln_stats_mode() -> str:
    """LN variance formulation: 'centered' (default; two fused reduces, the
    second reading (x-mu)^2 in-register - cancellation-safe) or 'ex2'
    (E[x^2]-mu^2; ~3% less busy time but catastrophically cancels when
    mu^2/var approaches 1/eps_f32). Both avoid jnp.var's materialized
    centered copy (the round-1 HBM cost). Correctness-first default:
    centered - the real-weight parity target (+-0.3%) outweighs 3%."""
    import os
    return os.environ.get("TTL_LN_STATS", "centered")


def _lora_compute_mode() -> str:
    """LoRA GEMM precision: 'mixed' (default - inputs in the activation
    dtype, f32 accumulation, f32 rank-r intermediate) or 'f32' (upcast the
    [B,S,D] activations first; round-1 behavior, ~5% extra HBM convert
    traffic for no information gain since h is already bf16). f32-compute
    runs are identical either way. TTL_LORA_COMPUTE=f32 restores round-1."""
    import os
    return os.environ.get("TTL_LORA_COMPUTE", "mixed")


def fuse_qkv_params(tower: Params) -> Params:
    """Rewrite a tower's stacked layers to a single fused qkv projection
    ([L, D, 3D]) - one matmul instead of three. Pure layout transform;
    encoder_layer detects the fused form. OPTIONAL and not applied by
    default: measured neutral on v5e at ViT-B shapes (XLA already batches
    the three projections; see the perf notes in README). Kept for configs
    where the trade differs."""
    layers = dict(tower["layers"])
    attn = layers["attn"]
    fused = {
        "qkv": {
            "w": jnp.concatenate([attn["q"]["w"], attn["k"]["w"],
                                  attn["v"]["w"]], axis=-1),
            "b": jnp.concatenate([attn["q"]["b"], attn["k"]["b"],
                                  attn["v"]["b"]], axis=-1),
        },
        "o": attn["o"],
    }
    layers["attn"] = fused
    out = dict(tower)
    out["layers"] = layers
    return out


def encoder_layer(p: Params, x: jax.Array, *, heads: int, eps: float,
                  causal: bool,
                  lora: Optional[Params] = None,
                  lora_scale: float = 2.0,
                  seq_len: Optional[int] = None) -> jax.Array:
    """Pre-LN transformer block with QuickGELU MLP (clip/model.py:167-222 /
    HF CLIPEncoderLayer). `lora` optionally injects rank-r updates into the
    q and v projections: q = x@Wq + (alpha/r) * (x@A_q)@B_q
    (PEFT layout, custom_clip.py:583-601)."""
    h = layer_norm(x, p["ln1"], eps)
    if "qkv" in p["attn"]:
        qkv = linear(h, p["attn"]["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(h, p["attn"]["q"])
        k = linear(h, p["attn"]["k"])
        v = linear(h, p["attn"]["v"])
    if lora is not None:
        if _lora_compute_mode() == "mixed":
            # h is already bf16 (LN output cast back), so upcasting it to
            # f32 adds no information - it only materializes a [B,S,D] f32
            # copy to HBM. Feed the GEMM bf16 inputs with f32 accumulation
            # and keep the tiny rank-r intermediate in f32.
            def _lo(ad):
                t = jnp.matmul(h, ad["A"].astype(h.dtype),
                               preferred_element_type=jnp.float32)
                return lora_scale * jnp.matmul(
                    t, ad["B"], preferred_element_type=jnp.float32)
            q = q + _lo(lora["q"]).astype(q.dtype)
            v = v + _lo(lora["v"]).astype(v.dtype)
        else:
            hf = h.astype(jnp.float32)
            q = q + (lora_scale * (hf @ lora["q"]["A"]) @ lora["q"]["B"]).astype(q.dtype)
            v = v + (lora_scale * (hf @ lora["v"]["A"]) @ lora["v"]["B"]).astype(v.dtype)
    a = _attention(q, k, v, heads, causal, seq_len)
    x = x + linear(a, p["attn"]["o"])
    h = layer_norm(x, p["ln2"], eps)
    x = x + linear(quick_gelu(linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return x


def encoder_layer_q(pq: Params, x: jax.Array, *, heads: int, eps: float,
                    causal: bool,
                    seq_len: Optional[int] = None) -> jax.Array:
    """encoder_layer with int8 linears (ops/quant.py): used only for frozen
    prefix layers under stop_gradient, where the LoRA contribution is exactly
    zero and no gradient flows. Attention math and layernorms are unchanged."""
    from ..ops.quant import linear_q
    h = layer_norm(x, pq["ln1"], eps)
    q = linear_q(h, pq["attn"]["q"])
    k = linear_q(h, pq["attn"]["k"])
    v = linear_q(h, pq["attn"]["v"])
    a = _attention(q, k, v, heads, causal, seq_len)
    x = x + linear_q(a, pq["attn"]["o"])
    h = layer_norm(x, pq["ln2"], eps)
    x = x + linear_q(quick_gelu(linear_q(h, pq["mlp"]["fc1"])),
                     pq["mlp"]["fc2"])
    return x


def _slice_layers(stacked: Params, lo: int, hi: int) -> Params:
    return jax.tree.map(lambda a: a[lo:hi], stacked)


def _layer_at(stacked: Params, i: int) -> Params:
    return jax.tree.map(lambda a: a[i], stacked)


def _run_layers(stacked: Params, x: jax.Array, lo: int, hi: int, *,
                heads: int, eps: float, causal: bool,
                remat: bool = False,
                seq_len: Optional[int] = None) -> jax.Array:
    """Frozen layers [lo, hi) as a scan over stacked params.

    `remat=True` checkpoints each scanned layer: only the per-layer carry is
    saved and the layer internals (attention scores/probs) are recomputed in
    the backward. Used for the frozen layers ABOVE the LoRA window -
    gradients must flow through them to reach the adapters, and for deep
    towers (ViT-L: 12 suffix layers x [B,S,S] probs) storing their
    attention residuals exceeds HBM. Exact math either way.
    """
    if hi <= lo:
        return x

    def body(h, layer_p):
        return encoder_layer(layer_p, h, heads=heads, eps=eps,
                             causal=causal, seq_len=seq_len), None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x,
                        _slice_layers(stacked, lo, hi))
    return x


# -------------------------------------------------------------------- towers

def _maybe_pad_tokens(x: jax.Array, causal: bool = False):
    """Pad the token axis ONCE per tower forward (bshd route only).

    The bshd kernel wrapper otherwise pads S to the sublane multiple and
    slices back at every attention call — an HBM round-trip per layer per
    direction measured at 13.3 ms/step (ViT-B) / 52 ms (ViT-L) of the
    benched TTL step. Padding here instead lets the padded rows ride the
    whole residual stream: every non-attention op is per-token so they
    stay isolated, attention masks them as keys via seq_len, pooling
    (cls token / EOT gather) never reads them, and their cotangents are
    exactly zero so gradients of real tokens are untouched. Returns
    (x_padded, true_seq_len) — or (x, None) when the route is not bshd
    (the einsum paths have no key masking), the tower is causal (text
    towers stay on the einsum — see _attention), or S is already
    aligned."""
    from ..ops import attention as fa
    s = x.shape[1]
    sp = ((s + 15) // 16) * 16
    if causal or fa.fused_mode() != "bshd" or sp == s:
        return x, None
    return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))), s


def _true_seq(x: jax.Array, true_len: int) -> Optional[int]:
    """Recover the _maybe_pad_tokens marker for a cached hidden state:
    None when x carries exactly true_len tokens (unpadded), else true_len."""
    return None if x.shape[1] == true_len else true_len


def vision_prefix(p: Params, images: jax.Array, cfg: VisionConfig, *,
                  upto: int, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Patchify + embed + frozen layers [0, upto) -> hidden [B, S, D].

    The frozen prefix is constant across TTA steps within a sample (LoRA
    there is exactly zero: B init is 0 and those layers are never trained -
    custom_clip.py:186,596-616), so multi-step adaptation computes it once
    and feeds `vision_from_hidden` per step.
    """
    b = images.shape[0]
    g, pt = cfg.grid, cfg.patch
    x = images.astype(compute_dtype)
    # [B,3,H,W] -> [B, gh, gw, 3*pt*pt] patch vectors, channel-major to match
    # conv-weight flattening [out, in*kh*kw]
    x = x.reshape(b, 3, g, pt, g, pt).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(b, g * g, 3 * pt * pt)
    x = jnp.matmul(x, p["patch_embed"].astype(compute_dtype),
                   preferred_element_type=jnp.float32).astype(compute_dtype)
    cls = jnp.broadcast_to(p["class_embed"].astype(compute_dtype),
                           (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(compute_dtype)
    x = layer_norm(x, p["ln_pre"], cfg.ln_eps)
    x, seq_len = _maybe_pad_tokens(x)
    qp = p.get("prefix_q")
    if qp is not None:
        nq = min(upto, qp["ln1"]["scale"].shape[0])

        def body_q(h, layer_q):
            return encoder_layer_q(layer_q, h, heads=cfg.heads,
                                   eps=cfg.ln_eps, causal=False,
                                   seq_len=seq_len), None

        x, _ = jax.lax.scan(body_q, x, _slice_layers(qp, 0, nq))
        return _run_layers(p["layers"], x, nq, upto, heads=cfg.heads,
                           eps=cfg.ln_eps, causal=False, seq_len=seq_len)
    return _run_layers(p["layers"], x, 0, upto, heads=cfg.heads,
                       eps=cfg.ln_eps, causal=False, seq_len=seq_len)


def vision_from_hidden(p: Params, hidden: jax.Array, cfg: VisionConfig, *,
                       adapters: Optional[Params] = None,
                       adapter_window: Tuple[int, int] = (9, 11),
                       lora_scale: float = 2.0) -> jax.Array:
    """Run layers [adapter_window[0], end) from a cached prefix hidden state
    and project: the per-TTA-step remainder of the vision tower."""
    lo, hi = adapter_window
    x = hidden
    seq_len = _true_seq(x, cfg.seq_len)  # cached prefix may be pre-padded
    if adapters is None:
        x = _run_layers(p["layers"], x, lo, cfg.layers, heads=cfg.heads,
                        eps=cfg.ln_eps, causal=False, seq_len=seq_len)
    else:
        for i in range(lo, hi + 1):
            x = encoder_layer(_layer_at(p["layers"], i), x, heads=cfg.heads,
                              eps=cfg.ln_eps, causal=False,
                              lora=_layer_at(adapters, i - lo),
                              lora_scale=lora_scale, seq_len=seq_len)
        x = _run_layers(p["layers"], x, hi + 1, cfg.layers, heads=cfg.heads,
                        eps=cfg.ln_eps, causal=False, remat=True,
                        seq_len=seq_len)
    pooled = layer_norm(x[:, 0], p["ln_post"], cfg.ln_eps)
    return jnp.matmul(pooled.astype(jnp.float32),
                      p["proj"].astype(jnp.float32))


def vision_features(p: Params, images: jax.Array, cfg: VisionConfig, *,
                    adapters: Optional[Params] = None,
                    adapter_window: Tuple[int, int] = (9, 11),
                    lora_scale: float = 2.0,
                    compute_dtype=jnp.bfloat16) -> jax.Array:
    """Images [B,3,H,W] (CLIP-normalized) -> projected features [B, proj_dim]
    (f32, unnormalized). Equivalent of HF `get_image_features`
    (custom_clip.py:62-71).

    `adapters`, when given, is the LoRA pytree for layers
    [adapter_window[0], adapter_window[1]] inclusive; those layers are
    unrolled so backward only walks the adapted suffix.
    """
    lo = adapter_window[0] if adapters is not None else cfg.layers
    hidden = vision_prefix(p, images, cfg, upto=lo,
                           compute_dtype=compute_dtype)
    if adapters is None:
        pooled = layer_norm(hidden[:, 0], p["ln_post"], cfg.ln_eps)
        return jnp.matmul(pooled.astype(jnp.float32),
                          p["proj"].astype(jnp.float32))
    return vision_from_hidden(p, jax.lax.stop_gradient(hidden), cfg,
                              adapters=adapters,
                              adapter_window=adapter_window,
                              lora_scale=lora_scale)


def text_features(p: Params, tokens: jax.Array, cfg: TextConfig, *,
                  adapters: Optional[Params] = None,
                  adapter_window: Tuple[int, int] = (9, 11),
                  lora_scale: float = 2.0,
                  compute_dtype=jnp.bfloat16) -> jax.Array:
    """Token ids [N, ctx] -> projected features [N, proj_dim] (f32,
    unnormalized). EOT pooling via argmax over ids (the EOT id is the
    largest in any sequence - clip/model.py:362-375 / HF CLIPTextTransformer).
    """
    # pos_embed sliced to the token table's (possibly truncated) length:
    # causal attention + EOT pooling make padding past the longest EOT dead
    # compute (models/prompts.needed_ctx_len), so callers may pass a prefix
    x = p["token_embed"][tokens].astype(compute_dtype)
    x = x + p["pos_embed"][: x.shape[1]].astype(compute_dtype)
    x, seq_len = _maybe_pad_tokens(x, causal=True)

    lo, hi = adapter_window
    if adapters is None:
        x = _run_layers(p["layers"], x, 0, cfg.layers, heads=cfg.heads,
                        eps=cfg.ln_eps, causal=True, seq_len=seq_len)
    else:
        x = jax.lax.stop_gradient(
            _run_layers(p["layers"], x, 0, lo, heads=cfg.heads,
                        eps=cfg.ln_eps, causal=True, seq_len=seq_len))
        for i in range(lo, hi + 1):
            x = encoder_layer(_layer_at(p["layers"], i), x, heads=cfg.heads,
                              eps=cfg.ln_eps, causal=True,
                              lora=_layer_at(adapters, i - lo),
                              lora_scale=lora_scale, seq_len=seq_len)
        x = _run_layers(p["layers"], x, hi + 1, cfg.layers, heads=cfg.heads,
                        eps=cfg.ln_eps, causal=True, remat=True,
                        seq_len=seq_len)

    x = layer_norm(x, p["ln_final"], cfg.ln_eps)
    pooled = x[jnp.arange(x.shape[0]), jnp.argmax(tokens, axis=-1)]
    return jnp.matmul(pooled.astype(jnp.float32), p["proj"].astype(jnp.float32))


def encode_image(p: Params, images: jax.Array, vision_cfg, *,
                 compute_dtype=jnp.bfloat16, **lora_kw) -> jax.Array:
    """Backbone dispatcher: ViT (VisionConfig) or ModifiedResNet
    (ResNetVisionConfig). LoRA kwargs only apply to the ViT path, matching
    the reference (adapters attach to transformer q/v projections only)."""
    if isinstance(vision_cfg, VisionConfig):
        return vision_features(p, images, vision_cfg,
                               compute_dtype=compute_dtype, **lora_kw)
    from .resnet import resnet_features
    if lora_kw.get("adapters") is not None:
        raise ValueError("LoRA adapters require a ViT backbone "
                         "(the reference's TTL path is ViT-only)")
    return resnet_features(p, images, vision_cfg, compute_dtype=compute_dtype)


def text_features_from_embeddings(p: Params, embeddings: jax.Array,
                                  tokens: jax.Array, cfg: TextConfig, *,
                                  compute_dtype=jnp.bfloat16,
                                  remat: bool = False) -> jax.Array:
    """Prompt *embeddings* [N, ctx, hidden] -> projected features [N, proj].

    The TPT/CoOp path assembles prompts in embedding space (tunable ctx
    spliced between SOS/suffix buffers) and runs them through the text tower
    (custom_clip_old.py:62-96); `tokens` is still needed for EOT pooling.

    `remat=True` checkpoints each layer of the scan (exact math, activations
    recomputed in backward). The TPT/CoCoOp adaptation paths differentiate
    this whole tower w.r.t. the ctx embeddings at every update step, and the
    saved per-layer attention probs [N_cls, H, 77, 77] are what blow HBM at
    real class counts (measured: 200-class TPT at sample_batch 8 wants 44 GB
    without remat, 16 GB chip).
    """
    x = embeddings.astype(compute_dtype) \
        + p["pos_embed"][: embeddings.shape[1]].astype(compute_dtype)
    x, seq_len = _maybe_pad_tokens(x, causal=True)
    x = _run_layers(p["layers"], x, 0, cfg.layers, heads=cfg.heads,
                    eps=cfg.ln_eps, causal=True, remat=remat,
                    seq_len=seq_len)
    x = layer_norm(x, p["ln_final"], cfg.ln_eps)
    pooled = x[jnp.arange(x.shape[0]), jnp.argmax(tokens, axis=-1)]
    return jnp.matmul(pooled.astype(jnp.float32), p["proj"].astype(jnp.float32))


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def cosine_logits(image_feats: jax.Array, text_feats: jax.Array,
                  logit_scale: jax.Array) -> jax.Array:
    """logits = exp(logit_scale) * norm(img) @ norm(text).T
    (custom_clip.py:680-687)."""
    img = l2_normalize(image_feats.astype(jnp.float32))
    txt = l2_normalize(text_feats.astype(jnp.float32))
    return jnp.exp(logit_scale.astype(jnp.float32)) * img @ txt.T


# ------------------------------------------------------------ initialization

def _init_linear(key, d_in, d_out, dtype, std=0.02):
    kw, _ = jax.random.split(key)
    return {"w": jax.random.normal(kw, (d_in, d_out), dtype) * std,
            "b": jnp.zeros((d_out,), dtype)}


def _init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def _init_layers(key, n, d, mlp_ratio, dtype):
    keys = jax.random.split(key, 6)

    def stack(f, k):
        return jax.vmap(f)(jax.random.split(k, n))

    return {
        "ln1": {"scale": jnp.ones((n, d), jnp.float32),
                "bias": jnp.zeros((n, d), jnp.float32)},
        "ln2": {"scale": jnp.ones((n, d), jnp.float32),
                "bias": jnp.zeros((n, d), jnp.float32)},
        "attn": {
            "q": stack(lambda k: _init_linear(k, d, d, dtype), keys[0]),
            "k": stack(lambda k: _init_linear(k, d, d, dtype), keys[1]),
            "v": stack(lambda k: _init_linear(k, d, d, dtype), keys[2]),
            "o": stack(lambda k: _init_linear(k, d, d, dtype), keys[3]),
        },
        "mlp": {
            "fc1": stack(lambda k: _init_linear(k, d, d * mlp_ratio, dtype),
                         keys[4]),
            "fc2": stack(lambda k: _init_linear(k, d * mlp_ratio, d, dtype),
                         keys[5]),
        },
    }


def init_clip_params(key: jax.Array, cfg: CLIPConfig,
                     param_dtype=jnp.float32) -> Params:
    """Random-init parameter pytree (tests / bench; real runs convert a
    checkpoint via ttl_tpu.models.convert).

    On non-CPU backends the whole init is ONE jitted program: eager
    per-tensor `jax.random` calls each pay a relay round trip on the
    tunneled TPU, which made ViT-B param init alone ~73 s of CLI/serve
    startup; a single dispatch (whose executable the persistent cache
    keeps) is seconds. On CPU (the test environment) the init stays eager:
    there are no round trips to save, and the one-off XLA compile of the
    init program would instead slow every spawned test subprocess. Values
    agree to ~1e-8 (XLA fuses `normal*scale` into an fma under jit). The
    ResNet vision branch is always eager (host-side numpy, resnet.py:202);
    its text tower follows the same backend rule."""
    v, t = cfg.vision, cfg.text
    on_cpu = jax.default_backend() == "cpu"
    if not isinstance(v, VisionConfig):  # ResNet backbone
        from .resnet import init_resnet_params
        kv, kt, kl = jax.random.split(key, 3)
        kts = jax.random.split(kt, 3)
        vision = init_resnet_params(kv, v, param_dtype)
        text = (_init_text(kts, kl, t, param_dtype) if on_cpu else
                _jitted_text_init(t, jnp.dtype(param_dtype).name)(kts, kl))
        return {"vision": vision, "text": text,
                "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32)}
    if on_cpu:
        return _init_vit_clip(key, cfg, param_dtype)
    return _jitted_vit_init(cfg, jnp.dtype(param_dtype).name)(key)


# the jitted init closures are cached per (config, dtype): a fresh lambda
# per call would defeat jax.jit's executable cache and recompile every call
@functools.lru_cache(maxsize=None)
def _jitted_vit_init(cfg: CLIPConfig, dtype_name: str):
    return jax.jit(lambda k: _init_vit_clip(k, cfg, jnp.dtype(dtype_name)))


@functools.lru_cache(maxsize=None)
def _jitted_text_init(t: TextConfig, dtype_name: str):
    return jax.jit(lambda a, b: _init_text(a, b, t, jnp.dtype(dtype_name)))


def _init_vit_clip(key: jax.Array, cfg: CLIPConfig, param_dtype) -> Params:
    kv, kt, kl = jax.random.split(key, 3)
    v, t = cfg.vision, cfg.text
    kvs = jax.random.split(kv, 4)
    kts = jax.random.split(kt, 3)
    vision = {
        "patch_embed": jax.random.normal(
            kvs[0], (3 * v.patch * v.patch, v.hidden), param_dtype) * 0.02,
        "class_embed": jax.random.normal(kvs[1], (v.hidden,), param_dtype) * 0.02,
        "pos_embed": jax.random.normal(
            kvs[2], (v.seq_len, v.hidden), param_dtype) * 0.02,
        "ln_pre": _init_ln(v.hidden),
        "layers": _init_layers(kvs[3], v.layers, v.hidden, v.mlp_ratio,
                               param_dtype),
        "ln_post": _init_ln(v.hidden),
        "proj": jax.random.normal(kl, (v.hidden, v.proj_dim), param_dtype) * 0.02,
    }
    return {"vision": vision,
            "text": _init_text(kts, kl, t, param_dtype),
            "logit_scale": jnp.asarray(math.log(1.0 / 0.07), jnp.float32)}


def _init_text(kts, kl, t: TextConfig, param_dtype) -> Params:
    return {
        "token_embed": jax.random.normal(
            kts[0], (t.vocab, t.hidden), param_dtype) * 0.02,
        "pos_embed": jax.random.normal(
            kts[1], (t.ctx, t.hidden), param_dtype) * 0.01,
        "layers": _init_layers(kts[2], t.layers, t.hidden, t.mlp_ratio,
                               param_dtype),
        "ln_final": _init_ln(t.hidden),
        "proj": jax.random.normal(
            jax.random.fold_in(kts[2], 7), (t.hidden, t.proj_dim),
            param_dtype) * 0.02,
    }
