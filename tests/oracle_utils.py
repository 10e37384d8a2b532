"""Shared test helpers: export JAX pytrees to reference checkpoint layouts.

These produce synthetic state_dicts in the exact naming/transposition
conventions of the OpenAI CLIP checkpoints (reference clip/model.py:428-451),
so converter and parity tests can round-trip without real weights (the
environment has no egress to download any).
"""
import numpy as np

import jax


def _np_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a, np.float32), tree)


def export_transformer_sd(sd, layers, prefix, n_layers):
    for i in range(n_layers):
        li = jax.tree.map(lambda a: a[i], layers)
        sd[f"{prefix}.{i}.ln_1.weight"] = li["ln1"]["scale"]
        sd[f"{prefix}.{i}.ln_1.bias"] = li["ln1"]["bias"]
        sd[f"{prefix}.{i}.ln_2.weight"] = li["ln2"]["scale"]
        sd[f"{prefix}.{i}.ln_2.bias"] = li["ln2"]["bias"]
        sd[f"{prefix}.{i}.attn.in_proj_weight"] = np.concatenate(
            [li["attn"][k]["w"].T for k in ("q", "k", "v")])
        sd[f"{prefix}.{i}.attn.in_proj_bias"] = np.concatenate(
            [li["attn"][k]["b"] for k in ("q", "k", "v")])
        sd[f"{prefix}.{i}.attn.out_proj.weight"] = li["attn"]["o"]["w"].T
        sd[f"{prefix}.{i}.attn.out_proj.bias"] = li["attn"]["o"]["b"]
        sd[f"{prefix}.{i}.mlp.c_fc.weight"] = li["mlp"]["fc1"]["w"].T
        sd[f"{prefix}.{i}.mlp.c_fc.bias"] = li["mlp"]["fc1"]["b"]
        sd[f"{prefix}.{i}.mlp.c_proj.weight"] = li["mlp"]["fc2"]["w"].T
        sd[f"{prefix}.{i}.mlp.c_proj.bias"] = li["mlp"]["fc2"]["b"]


def export_text_sd(text_params, sd=None) -> dict:
    """Text tower -> OpenAI layout (token_embedding, positional_embedding,
    transformer.resblocks.*, ln_final, text_projection)."""
    t = _np_tree(text_params)
    sd = {} if sd is None else sd
    sd["token_embedding.weight"] = t["token_embed"]
    sd["positional_embedding"] = t["pos_embed"]
    sd["ln_final.weight"] = t["ln_final"]["scale"]
    sd["ln_final.bias"] = t["ln_final"]["bias"]
    sd["text_projection"] = t["proj"]
    n = t["layers"]["ln1"]["scale"].shape[0]
    export_transformer_sd(sd, t["layers"], "transformer.resblocks", n)
    return sd


def export_openai_vit_sd(params, vision_cfg) -> dict:
    """Full ViT CLIP pytree -> OpenAI .pt state_dict layout."""
    p = _np_tree(params)
    v = p["vision"]
    sd = {
        "visual.conv1.weight": v["patch_embed"].T.reshape(
            vision_cfg.hidden, 3, vision_cfg.patch, vision_cfg.patch),
        "visual.class_embedding": v["class_embed"],
        "visual.positional_embedding": v["pos_embed"],
        "visual.ln_pre.weight": v["ln_pre"]["scale"],
        "visual.ln_pre.bias": v["ln_pre"]["bias"],
        "visual.ln_post.weight": v["ln_post"]["scale"],
        "visual.ln_post.bias": v["ln_post"]["bias"],
        "visual.proj": v["proj"],
        "logit_scale": p["logit_scale"],
    }
    n = v["layers"]["ln1"]["scale"].shape[0]
    export_transformer_sd(sd, v["layers"], "visual.transformer.resblocks", n)
    export_text_sd(p["text"], sd)
    return sd
