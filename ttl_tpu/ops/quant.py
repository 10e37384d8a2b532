"""Int8 quantization for the frozen tower segments (opt-in perf path).

The TTL hot loop spends ~55% of device-busy time in GEMMs, and the largest
slice of that is the frozen vision prefix below the LoRA window - layers the
gradient never touches (the prefix is wrapped in stop_gradient; in the
reference only layers 9-11 train, ttl.py:159-166, and everything below runs
frozen under fp16 autocast). v5e's MXU runs int8 GEMMs ~1.46x faster than
bf16 at these shapes (measured in-program; PERF_NOTES.md), so those linears
can trade precision the optimizer never sees for throughput.

Scheme: symmetric per-output-channel weight quantization
(scale_j = max_i |w_ij| / 127) x symmetric per-row dynamic activation
quantization (scale_t = max_j |x_tj| / 127), int8 x int8 -> int32
`dot_general`, f32 epilogue `y = acc * (row_scale * col_scale) + b`. No zero
points: the MXU int8 path is symmetric and the inputs these GEMMs read are
roughly zero-centered (post-layernorm activations).

This has NO reference equivalent (the reference runs fp16 autocast
throughout, ttl.py:222); it is a TPU-native extension gated behind
`TTLConfig.prefix_quant='int8'` / `--prefix_quant int8`, default off:
real-weight accuracy parity (+-0.3% against the README table) cannot be
verified in this environment, so full precision stays the default.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_linear(p: Params) -> Params:
    """Quantize one linear (or a stacked [L, in, out] layer of them) to
    symmetric per-output-channel int8. Bias is kept f32."""
    w = p["w"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=False) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.round(w / scale[..., None, :]).astype(jnp.int8)
    out = {"wq": wq, "scale": scale}
    if "b" in p:
        out["b"] = p["b"].astype(jnp.float32)
    return out


def linear_q(x: jax.Array, pq: Params) -> jax.Array:
    """y = x @ dequant(wq) + b via an int8 MXU GEMM.

    Activations are quantized dynamically per row (last axis) IN THE
    ACTIVATION DTYPE: an f32 upcast of x before the absmax reduce makes XLA
    materialize an f32 [B,S,D] copy to HBM (measured 11% of program busy
    time - the same trap as the round-1 f32 LoRA inputs), while the bf16
    reduce+divide chain fuses into one read-bf16/write-int8 pass. bf16
    division perturbs x/s by at most 2^-9 relative - below the int8 grid's
    own 1/254 rounding noise - and the clip guards the one hazard (a bf16
    quotient landing on 127.5 would round to 128 and wrap int8).
    """
    one = jnp.asarray(1.0, x.dtype)
    a_scale = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                          jnp.asarray(1e-12, x.dtype)) * (one / 127.0)
    xq = jnp.clip(jnp.round((x / a_scale).astype(jnp.float32)),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, pq["wq"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (a_scale.astype(jnp.float32) * pq["scale"])
    if "b" in pq:
        y = y + pq["b"]
    return y.astype(x.dtype)


def quantize_layer_stack(stacked: Params, upto: int) -> Params:
    """Quantize the first `upto` stacked transformer layers: the six linears
    (attn q/k/v/o, mlp fc1/fc2) go int8; layernorm affines stay f32.

    Only the plain (unfused) attention layout is supported - the optional
    fuse_qkv_params transform is a measured-neutral experiment and the two
    are not combined.
    """
    if "qkv" in stacked["attn"]:
        raise ValueError("prefix quantization does not compose with "
                         "fuse_qkv_params; quantize the unfused layout")
    sl = jax.tree.map(lambda a: a[:upto], stacked)
    f32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32), t)
    return {
        "ln1": f32(sl["ln1"]),
        "ln2": f32(sl["ln2"]),
        "attn": {k: quantize_linear(sl["attn"][k])
                 for k in ("q", "k", "v", "o")},
        "mlp": {k: quantize_linear(sl["mlp"][k]) for k in ("fc1", "fc2")},
    }


def attach_prefix_quant(params: Params, upto: int, *,
                        drop_fp: bool = False) -> Params:
    """Return a params pytree whose vision tower carries an int8 copy of its
    first `upto` layers under 'prefix_q' (consumed by clip.vision_prefix).
    The f32/bf16 originals stay by default - layers >= upto and every
    gradient path still read them. When `drop_fp` is set AND the whole
    tower quantizes (frozen-vision modes: text-LoRA/prompt/CoCoOp/
    zero-shot), the fp stacked layers are replaced with a zero-length slice
    so their HBM is freed - nothing reads them again (vision_prefix's
    fp remainder is a no-op at nq == upto == n_layers), and keeping them
    would double the vision tower's weight footprint (ADVICE r2). No-op for
    non-ViT towers (ResNet backbones have no stacked transformer layers;
    LoRA and the frozen-prefix split are ViT-only, as in the reference)."""
    vision = params["vision"]
    if "layers" not in vision or "patch_embed" not in vision:
        return params
    if upto <= 0 or "prefix_q" in vision:
        return params
    n_layers = vision["layers"]["ln1"]["scale"].shape[0]
    vision = dict(vision)
    vision["prefix_q"] = quantize_layer_stack(vision["layers"],
                                              min(upto, n_layers))
    if drop_fp and upto >= n_layers:
        vision["layers"] = jax.tree.map(lambda a: a[:0], vision["layers"])
    out = dict(params)
    out["vision"] = vision
    return out


def quant_prefix_len(cfg, clip_cfg) -> int:
    """How many vision layers may be quantized for a config: everything
    below the LoRA window when the image encoder is being adapted, the whole
    tower when it is frozen (text/prompt/CoCoOp/zero-shot modes)."""
    from ..config import resolve_layer_range
    from ..models.clip import VisionConfig
    if not isinstance(clip_cfg.vision, VisionConfig):
        return 0
    image_adapted = (cfg.lora_encoder == "image" and cfg.tta_steps > 0
                     and not cfg.cocoop)
    return (resolve_layer_range(cfg, clip_cfg)[0] if image_adapted
            else clip_cfg.vision.layers)
