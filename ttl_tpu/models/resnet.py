"""CLIP ModifiedResNet vision towers (RN50 family) in functional JAX.

Covers the reference's ResNet CLIP surface (clip/model.py:10-155: Bottleneck,
AttentionPool2d, ModifiedResNet) used by the `--arch RN50` TPT/prompt path.
Inference-only: batchnorms fold to scale/shift from running stats (the
reference never trains them either - the vision tower is frozen in every
mode; LoRA attaches only to the HF ViT path, custom_clip.py:596).

Architecture (vs torchvision ResNet): 3-conv stem with an average pool,
anti-aliased strided convs (stride-2 becomes conv + avgpool), and an
attention-pool head instead of GAP+fc.

Layout: NCHW activations, conv kernels stored HWIO for
jax.lax.conv_general_dilated; linear weights [in, out].
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetVisionConfig:
    layers: Tuple[int, int, int, int]   # blocks per stage, RN50 = (3,4,6,3)
    width: int                          # stem width, RN50 = 64
    heads: int                          # attnpool heads = width * 32 // 64
    proj_dim: int                       # output embed dim
    image_size: int = 224

    @property
    def feat_dim(self) -> int:
        return self.width * 32  # stage4 channels = width * 8 * expansion(4)


RESNET_ARCHS = {
    "RN50": ResNetVisionConfig(layers=(3, 4, 6, 3), width=64, heads=32,
                               proj_dim=1024),
    "RN101": ResNetVisionConfig(layers=(3, 4, 23, 3), width=64, heads=32,
                                proj_dim=512),
    # EfficientNet-style scale-ups (published CLIP zoo)
    "RN50x4": ResNetVisionConfig(layers=(4, 6, 10, 6), width=80, heads=40,
                                 proj_dim=640, image_size=288),
    "RN50x16": ResNetVisionConfig(layers=(6, 8, 18, 8), width=96, heads=48,
                                  proj_dim=768, image_size=384),
    "RN50x64": ResNetVisionConfig(layers=(3, 15, 36, 10), width=128,
                                  heads=64, proj_dim=1024, image_size=448),
}


def _conv(x, w, stride=1):
    # torch-style symmetric padding ((k-1)//2 per side); XLA "SAME" pads
    # asymmetrically under stride 2, which would shift features vs the
    # reference checkpoints
    k = w.shape[0]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def _bn(x, p):
    """Inference batchnorm: y = (x - mean) / sqrt(var + eps) * g + b,
    folded into one scale/shift in f32."""
    scale = (p["scale"] / jnp.sqrt(p["var"] + 1e-5)).astype(jnp.float32)
    shift = (p["bias"] - p["mean"] * scale).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * scale[None, :, None, None]
            + shift[None, :, None, None]).astype(x.dtype)


def _avgpool2(x, k=2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, k, k), "VALID") / (k * k)


def bottleneck(p: Params, x, stride: int):
    """clip/model.py:10-55: 1x1 -> 3x3 -> (avgpool if stride) -> 1x1 x4;
    downsample branch is avgpool + 1x1 conv."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"]), p["bn2"]))
    if stride > 1:
        out = _avgpool2(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        idn = _avgpool2(x, stride) if stride > 1 else x
        idn = _bn(_conv(idn, p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        idn = x
    return jax.nn.relu(out + idn)


def attention_pool(p: Params, x, heads: int):
    """clip/model.py:58-92: flatten spatial, prepend mean token, add pos
    embed, one MHA layer queried by the mean token."""
    n, c, h, w = x.shape
    tokens = x.reshape(n, c, h * w).transpose(0, 2, 1)       # [N, HW, C]
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)          # [N, HW+1, C]
    tokens = tokens + p["pos_embed"].astype(tokens.dtype)

    q = (tokens[:, :1].astype(jnp.float32) @ p["q"]["w"] + p["q"]["b"])
    k = (tokens.astype(jnp.float32) @ p["k"]["w"] + p["k"]["b"])
    v = (tokens.astype(jnp.float32) @ p["v"]["w"] + p["v"]["b"])
    hd = c // heads

    def split(t):
        return t.reshape(n, -1, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
    wts = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", wts, v)
    out = out.transpose(0, 2, 1, 3).reshape(n, 1, c)[:, 0]
    return out @ p["out"]["w"] + p["out"]["b"]               # [N, proj_dim]


def resnet_features(p: Params, images, cfg: ResNetVisionConfig, *,
                    compute_dtype=jnp.bfloat16):
    """[B,3,H,W] CLIP-normalized -> [B, proj_dim] (f32, unnormalized);
    ModifiedResNet.forward (clip/model.py:123-155)."""
    x = images.astype(compute_dtype)
    for i in (1, 2, 3):
        x = jax.nn.relu(_bn(_conv(x, p[f"conv{i}"],
                                  stride=2 if i == 1 else 1), p[f"bn{i}"]))
    x = _avgpool2(x, 2)
    for stage in range(4):
        blocks = p[f"layer{stage + 1}"]
        for b, bp in enumerate(blocks):
            x = bottleneck(bp, x, stride=(2 if b == 0 and stage > 0 else 1))
    return attention_pool(p["attnpool"], x, cfg.heads).astype(jnp.float32)


# ------------------------------------------------------------------ convert

def convert_openai_resnet(sd, cfg: ResNetVisionConfig,
                          param_dtype=jnp.float32) -> Params:
    """OpenAI RN50-family `visual.*` state_dict -> pytree (names from
    clip/model.py:94-121: conv1-3/bn1-3 stem, layer{1-4}.{i}, attnpool)."""
    import numpy as np

    def arr(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v)

    def conv(k):  # torch OIHW -> HWIO
        return arr(k).transpose(2, 3, 1, 0).astype(param_dtype)

    def bn(prefix):
        return {"scale": arr(f"{prefix}.weight").astype(np.float32),
                "bias": arr(f"{prefix}.bias").astype(np.float32),
                "mean": arr(f"{prefix}.running_mean").astype(np.float32),
                "var": arr(f"{prefix}.running_var").astype(np.float32)}

    p: Params = {}
    for i in (1, 2, 3):
        p[f"conv{i}"] = conv(f"visual.conv{i}.weight")
        p[f"bn{i}"] = bn(f"visual.bn{i}")
    for stage in range(4):
        blocks = []
        for b in range(cfg.layers[stage]):
            pre = f"visual.layer{stage + 1}.{b}"
            bp = {
                "conv1": conv(f"{pre}.conv1.weight"), "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2.weight"), "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3.weight"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                # downsample = Sequential(("-1", avgpool), ("0", conv),
                # ("1", bn)) - state-dict keys are 0 (conv) and 1 (bn)
                bp["downsample"] = {"conv": conv(f"{pre}.downsample.0.weight"),
                                    "bn": bn(f"{pre}.downsample.1")}
            blocks.append(bp)
        p[f"layer{stage + 1}"] = blocks

    d = cfg.feat_dim
    qkv_w = {n: arr(f"visual.attnpool.{n}_proj.weight") for n in "qkv"}
    qkv_b = {n: arr(f"visual.attnpool.{n}_proj.bias") for n in "qkv"}
    p["attnpool"] = {
        "pos_embed": arr("visual.attnpool.positional_embedding"
                         ).astype(np.float32),
        "q": {"w": qkv_w["q"].T.astype(np.float32),
              "b": qkv_b["q"].astype(np.float32)},
        "k": {"w": qkv_w["k"].T.astype(np.float32),
              "b": qkv_b["k"].astype(np.float32)},
        "v": {"w": qkv_w["v"].T.astype(np.float32),
              "b": qkv_b["v"].astype(np.float32)},
        "out": {"w": arr("visual.attnpool.c_proj.weight").T.astype(np.float32),
                "b": arr("visual.attnpool.c_proj.bias").astype(np.float32)},
    }
    return p


def init_resnet_params(key: jax.Array, cfg: ResNetVisionConfig,
                       param_dtype=jnp.float32) -> Params:
    """Random init (tests/bench)."""
    import numpy as np
    rng = np.random.RandomState(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def conv(kh, kw, cin, cout):
        std = math.sqrt(2.0 / (kh * kw * cin))
        return jnp.asarray(rng.randn(kh, kw, cin, cout) * std, param_dtype)

    def bn(c):
        return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    w = cfg.width
    p: Params = {"conv1": conv(3, 3, 3, w // 2), "bn1": bn(w // 2),
                 "conv2": conv(3, 3, w // 2, w // 2), "bn2": bn(w // 2),
                 "conv3": conv(3, 3, w // 2, w), "bn3": bn(w)}
    cin = w
    for stage in range(4):
        cmid = w * (2 ** stage)
        cout = cmid * 4
        blocks = []
        for b in range(cfg.layers[stage]):
            bp = {"conv1": conv(1, 1, cin, cmid), "bn1": bn(cmid),
                  "conv2": conv(3, 3, cmid, cmid), "bn2": bn(cmid),
                  "conv3": conv(1, 1, cmid, cout), "bn3": bn(cout)}
            if b == 0:
                bp["downsample"] = {"conv": conv(1, 1, cin, cout),
                                    "bn": bn(cout)}
            blocks.append(bp)
            cin = cout
        p[f"layer{stage + 1}"] = blocks
    d = cfg.feat_dim
    spatial = (cfg.image_size // 32) ** 2
    p["attnpool"] = {
        "pos_embed": jnp.asarray(rng.randn(spatial + 1, d) / math.sqrt(d)),
        "q": {"w": jnp.asarray(rng.randn(d, d) * 0.02), "b": jnp.zeros((d,))},
        "k": {"w": jnp.asarray(rng.randn(d, d) * 0.02), "b": jnp.zeros((d,))},
        "v": {"w": jnp.asarray(rng.randn(d, d) * 0.02), "b": jnp.zeros((d,))},
        "out": {"w": jnp.asarray(rng.randn(d, cfg.proj_dim) * 0.02),
                "b": jnp.zeros((cfg.proj_dim,))},
    }
    return p
