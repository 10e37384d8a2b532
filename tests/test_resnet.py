"""ModifiedResNet (RN50 family) parity tests.

Oracles are built from torch functional ops per the published CLIP
architecture (anti-aliased bottleneck, attention pool queried by the mean
token) - clip/model.py:10-155.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ttl_tpu.models import resnet as rn

pytestmark = pytest.mark.slow  # full-dim RN50 torch conversion

CFG_TINY = rn.ResNetVisionConfig(layers=(1, 1, 1, 1), width=16, heads=4,
                                 proj_dim=32, image_size=64)


def torch_bottleneck(p, x, stride):
    def conv(x, w, s=1, pad=0):
        return F.conv2d(x, w, stride=s, padding=pad)

    def bn(x, b):
        return F.batch_norm(x, torch.tensor(b["mean"]), torch.tensor(b["var"]),
                            torch.tensor(b["scale"]), torch.tensor(b["bias"]),
                            training=False, eps=1e-5)

    def t(w):  # HWIO -> OIHW
        return torch.tensor(np.transpose(w, (3, 2, 0, 1)))

    out = F.relu(bn(conv(x, t(p["conv1"])), p["bn1"]))
    out = F.relu(bn(conv(out, t(p["conv2"]), pad=1), p["bn2"]))
    if stride > 1:
        out = F.avg_pool2d(out, stride)
    out = bn(conv(out, t(p["conv3"])), p["bn3"])
    if "downsample" in p:
        idn = F.avg_pool2d(x, stride) if stride > 1 else x
        idn = bn(conv(idn, t(p["downsample"]["conv"])), p["downsample"]["bn"])
    else:
        idn = x
    return F.relu(out + idn)


def np_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float32), tree)


def test_bottleneck_matches_torch():
    params = rn.init_resnet_params(jax.random.PRNGKey(0), CFG_TINY)
    bp = np_tree(params["layer2"][0])  # has downsample + stride 2
    x = np.random.RandomState(0).randn(2, 64, 16, 16).astype(np.float32)
    ours = rn.bottleneck(jax.tree.map(jnp.asarray, bp), jnp.asarray(x),
                         stride=2)
    ref = torch_bottleneck(bp, torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-4)


def test_attention_pool_matches_torch_mha():
    params = rn.init_resnet_params(jax.random.PRNGKey(0), CFG_TINY)
    ap = np_tree(params["attnpool"])
    d = CFG_TINY.feat_dim
    x = np.random.RandomState(1).randn(2, d, 2, 2).astype(np.float32)

    ours = rn.attention_pool(jax.tree.map(jnp.asarray, ap), jnp.asarray(x),
                             CFG_TINY.heads)

    xt = torch.from_numpy(x).flatten(start_dim=2).permute(2, 0, 1)
    xt = torch.cat([xt.mean(dim=0, keepdim=True), xt], dim=0)
    xt = xt + torch.tensor(ap["pos_embed"])[:, None, :]
    ref, _ = F.multi_head_attention_forward(
        query=xt[:1], key=xt, value=xt,
        embed_dim_to_check=d, num_heads=CFG_TINY.heads,
        q_proj_weight=torch.tensor(ap["q"]["w"].T),
        k_proj_weight=torch.tensor(ap["k"]["w"].T),
        v_proj_weight=torch.tensor(ap["v"]["w"].T),
        in_proj_weight=None,
        in_proj_bias=torch.cat([torch.tensor(ap[n]["b"]) for n in "qkv"]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
        out_proj_weight=torch.tensor(ap["out"]["w"].T),
        out_proj_bias=torch.tensor(ap["out"]["b"]),
        use_separate_proj_weight=True, training=False, need_weights=False)
    np.testing.assert_allclose(np.asarray(ours), ref.squeeze(0).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_resnet_forward_shapes():
    params = rn.init_resnet_params(jax.random.PRNGKey(0), CFG_TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    feats = rn.resnet_features(params, x, CFG_TINY,
                               compute_dtype=jnp.float32)
    assert feats.shape == (2, CFG_TINY.proj_dim)
    assert np.isfinite(np.asarray(feats)).all()


def export_resnet_sd(vision_params) -> dict:
    """Export a resnet pytree to OpenAI state_dict layout
    (clip/model.py naming: visual.conv1..3/bn1..3, visual.layerN.B.*,
    visual.attnpool.*)."""
    p = np_tree(vision_params)
    sd = {}
    for i in (1, 2, 3):
        sd[f"visual.conv{i}.weight"] = np.transpose(p[f"conv{i}"],
                                                    (3, 2, 0, 1))
        for stat, name in [("scale", "weight"), ("bias", "bias"),
                           ("mean", "running_mean"), ("var", "running_var")]:
            sd[f"visual.bn{i}.{name}"] = p[f"bn{i}"][stat]
    for stage in range(4):
        for b, bp in enumerate(p[f"layer{stage + 1}"]):
            pre = f"visual.layer{stage + 1}.{b}"
            for ci in (1, 2, 3):
                sd[f"{pre}.conv{ci}.weight"] = np.transpose(
                    bp[f"conv{ci}"], (3, 2, 0, 1))
                for stat, name in [("scale", "weight"), ("bias", "bias"),
                                   ("mean", "running_mean"),
                                   ("var", "running_var")]:
                    sd[f"{pre}.bn{ci}.{name}"] = bp[f"bn{ci}"][stat]
            if "downsample" in bp:
                sd[f"{pre}.downsample.0.weight"] = np.transpose(
                    bp["downsample"]["conv"], (3, 2, 0, 1))
                for stat, name in [("scale", "weight"), ("bias", "bias"),
                                   ("mean", "running_mean"),
                                   ("var", "running_var")]:
                    sd[f"{pre}.downsample.1.{name}"] = \
                        bp["downsample"]["bn"][stat]
    ap = p["attnpool"]
    sd["visual.attnpool.positional_embedding"] = ap["pos_embed"]
    for n in "qkv":
        sd[f"visual.attnpool.{n}_proj.weight"] = ap[n]["w"].T
        sd[f"visual.attnpool.{n}_proj.bias"] = ap[n]["b"]
    sd["visual.attnpool.c_proj.weight"] = ap["out"]["w"].T
    sd["visual.attnpool.c_proj.bias"] = ap["out"]["b"]
    return sd


def export_text_sd(text_params) -> dict:
    """Export a text-tower pytree to OpenAI layout (token_embedding,
    positional_embedding, transformer.resblocks.*, ln_final,
    text_projection)."""
    p = np_tree(text_params)
    sd = {
        "token_embedding.weight": p["token_embed"],
        "positional_embedding": p["pos_embed"],
        "ln_final.weight": p["ln_final"]["scale"],
        "ln_final.bias": p["ln_final"]["bias"],
        "text_projection": p["proj"],
    }
    n_layers = p["layers"]["ln1"]["scale"].shape[0]
    for i in range(n_layers):
        lp = jax.tree.map(lambda a: a[i], p["layers"])
        pre = f"transformer.resblocks.{i}"
        sd[f"{pre}.attn.in_proj_weight"] = np.concatenate(
            [lp["attn"][n]["w"].T for n in "qkv"], axis=0)
        sd[f"{pre}.attn.in_proj_bias"] = np.concatenate(
            [lp["attn"][n]["b"] for n in "qkv"], axis=0)
        sd[f"{pre}.attn.out_proj.weight"] = lp["attn"]["o"]["w"].T
        sd[f"{pre}.attn.out_proj.bias"] = lp["attn"]["o"]["b"]
        sd[f"{pre}.mlp.c_fc.weight"] = lp["mlp"]["fc1"]["w"].T
        sd[f"{pre}.mlp.c_fc.bias"] = lp["mlp"]["fc1"]["b"]
        sd[f"{pre}.mlp.c_proj.weight"] = lp["mlp"]["fc2"]["w"].T
        sd[f"{pre}.mlp.c_proj.bias"] = lp["mlp"]["fc2"]["b"]
        for ln, name in [("ln1", "ln_1"), ("ln2", "ln_2")]:
            sd[f"{pre}.{name}.weight"] = lp[ln]["scale"]
            sd[f"{pre}.{name}.bias"] = lp[ln]["bias"]
    return sd


def test_openai_converter_roundtrip():
    """Synthetic OpenAI-layout export of tiny RN params converts back
    identically."""
    params = rn.init_resnet_params(jax.random.PRNGKey(2), CFG_TINY)
    sd = export_resnet_sd(params)

    back = rn.convert_openai_resnet(sd, CFG_TINY)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 64, 64))
    a = rn.resnet_features(params, x, CFG_TINY, compute_dtype=jnp.float32)
    b = rn.resnet_features(jax.tree.map(jnp.asarray, back), x, CFG_TINY,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_full_rn50_infer_and_convert():
    """Shape inference + conversion on a synthetic FULL RN50 state_dict:
    infer_config_from_openai must reproduce the published RN50 architecture
    exactly (the reference's build_model derivation, clip/model.py:428-451),
    and the converted pytree must match the source weights functionally."""
    from ttl_tpu.models.clip import init_clip_params, text_features
    from ttl_tpu.models.convert import (from_openai_state_dict,
                                        infer_config_from_openai)
    from ttl_tpu.models.zoo import get_arch

    cfg = get_arch("RN50")
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    sd = {**export_resnet_sd(params["vision"]),
          **export_text_sd(params["text"]),
          "logit_scale": np.asarray(params["logit_scale"], np.float32)}

    inferred = infer_config_from_openai(sd)
    assert inferred.vision == cfg.vision   # (3,4,6,3), w64, 32 heads, 224
    assert inferred.text == cfg.text       # 512w, 12L, 8h, 49408v, ctx 77

    conv = jax.tree.map(jnp.asarray, from_openai_state_dict(sd, inferred))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 224, 224))
    a = rn.resnet_features(params["vision"], x, cfg.vision,
                           compute_dtype=jnp.float32)
    b = rn.resnet_features(conv["vision"], x, inferred.vision,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    toks = jnp.asarray([[49406, 320, 1125, 49407] + [0] * 73,
                        [49406, 518, 49407] + [0] * 74])
    ta = text_features(params["text"], toks, cfg.text,
                       compute_dtype=jnp.float32)
    tb = text_features(conv["text"], toks, inferred.text,
                       compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                               rtol=1e-5, atol=1e-5)


def test_zoo_arch_configs_consistent():
    """Every registered arch must have coherent head/width geometry."""
    from ttl_tpu.models.zoo import ARCHS
    from ttl_tpu.models.clip import VisionConfig

    for name, cfg in ARCHS.items():
        t = cfg.text
        assert t.hidden % t.heads == 0, name
        v = cfg.vision
        if isinstance(v, VisionConfig):
            assert v.hidden % v.heads == 0, name
            assert v.image_size % v.patch == 0, name
        else:
            assert v.feat_dim % v.heads == 0, name
            assert v.image_size % 32 == 0, name
