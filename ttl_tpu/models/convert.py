"""Checkpoint conversion: torch CLIP state_dicts -> ttl_tpu pytrees.

Supports both weight layouts the reference consumes:

- HuggingFace `CLIPModel` (``openai/clip-vit-base-patch16``), the layout the
  TTL path actually adapts (reference: custom_clip.py:581,596-601);
- OpenAI ``clip`` checkpoints (packed qkv ``attn.in_proj_weight``), the layout
  the PromptLearner/TPT path embeds with (clip/model.py:428-451).

Input is any mapping name -> array-like (torch tensors, numpy arrays, or a
``safetensors`` dict). Linear weights are transposed to the [in, out]
convention of ttl_tpu.models.clip; per-layer tensors are stacked along a
leading layer axis for `lax.scan`.

Conversion runs once at model-load time (host, numpy); nothing here is in
the device hot path.
"""
from __future__ import annotations

import numpy as np

from .clip import CLIPConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]).astype(np.float32),
            "bias": _np(sd[f"{prefix}.bias"]).astype(np.float32)}


def _linear_t(sd, prefix, dtype):
    out = {"w": _np(sd[f"{prefix}.weight"]).T.astype(dtype)}
    if f"{prefix}.bias" in sd:
        out["b"] = _np(sd[f"{prefix}.bias"]).astype(dtype)
    return out


def _stack(dicts):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


# ------------------------------------------------------------------- HF CLIP

def _hf_layer(sd, prefix, dtype):
    return {
        "ln1": _ln(sd, f"{prefix}.layer_norm1"),
        "ln2": _ln(sd, f"{prefix}.layer_norm2"),
        "attn": {
            "q": _linear_t(sd, f"{prefix}.self_attn.q_proj", dtype),
            "k": _linear_t(sd, f"{prefix}.self_attn.k_proj", dtype),
            "v": _linear_t(sd, f"{prefix}.self_attn.v_proj", dtype),
            "o": _linear_t(sd, f"{prefix}.self_attn.out_proj", dtype),
        },
        "mlp": {
            "fc1": _linear_t(sd, f"{prefix}.mlp.fc1", dtype),
            "fc2": _linear_t(sd, f"{prefix}.mlp.fc2", dtype),
        },
    }


def from_hf_state_dict(sd, cfg: CLIPConfig, param_dtype=np.float32):
    """HF CLIPModel.state_dict() -> {vision, text, logit_scale} pytree."""
    sd = {k: v for k, v in sd.items()}
    v, t = cfg.vision, cfg.text

    patch = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    # conv [out, in, kh, kw] -> matmul [in*kh*kw, out]
    patch = patch.reshape(v.hidden, -1).T.astype(param_dtype)

    vision = {
        "patch_embed": patch,
        "class_embed": _np(sd["vision_model.embeddings.class_embedding"]
                           ).astype(param_dtype),
        "pos_embed": _np(sd["vision_model.embeddings.position_embedding.weight"]
                         ).astype(param_dtype),
        # "pre_layrnorm" is HF's actual (misspelled) parameter name
        "ln_pre": _ln(sd, "vision_model.pre_layrnorm"),
        "layers": _stack([_hf_layer(sd, f"vision_model.encoder.layers.{i}",
                                    param_dtype) for i in range(v.layers)]),
        "ln_post": _ln(sd, "vision_model.post_layernorm"),
        "proj": _np(sd["visual_projection.weight"]).T.astype(param_dtype),
    }
    text = {
        "token_embed": _np(sd["text_model.embeddings.token_embedding.weight"]
                           ).astype(param_dtype),
        "pos_embed": _np(sd["text_model.embeddings.position_embedding.weight"]
                         ).astype(param_dtype),
        "layers": _stack([_hf_layer(sd, f"text_model.encoder.layers.{i}",
                                    param_dtype) for i in range(t.layers)]),
        "ln_final": _ln(sd, "text_model.final_layer_norm"),
        "proj": _np(sd["text_projection.weight"]).T.astype(param_dtype),
    }
    return {"vision": vision, "text": text,
            "logit_scale": _np(sd["logit_scale"]).astype(np.float32)}


# --------------------------------------------------------------- OpenAI CLIP

def _openai_layer(sd, prefix, d, dtype):
    wqkv = _np(sd[f"{prefix}.attn.in_proj_weight"])  # [3d, d]
    bqkv = _np(sd[f"{prefix}.attn.in_proj_bias"])
    qkv = [{"w": wqkv[i * d:(i + 1) * d].T.astype(dtype),
            "b": bqkv[i * d:(i + 1) * d].astype(dtype)} for i in range(3)]
    return {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {"q": qkv[0], "k": qkv[1], "v": qkv[2],
                 "o": _linear_t(sd, f"{prefix}.attn.out_proj", dtype)},
        "mlp": {"fc1": _linear_t(sd, f"{prefix}.mlp.c_fc", dtype),
                "fc2": _linear_t(sd, f"{prefix}.mlp.c_proj", dtype)},
    }


def _openai_text(sd, t, param_dtype):
    return {
        "token_embed": _np(sd["token_embedding.weight"]).astype(param_dtype),
        "pos_embed": _np(sd["positional_embedding"]).astype(param_dtype),
        "layers": _stack([_openai_layer(
            sd, f"transformer.resblocks.{i}", t.hidden, param_dtype)
            for i in range(t.layers)]),
        "ln_final": _ln(sd, "ln_final"),
        "proj": _np(sd["text_projection"]).astype(param_dtype),
    }


def from_openai_state_dict(sd, cfg: CLIPConfig, param_dtype=np.float32):
    """OpenAI clip .pt state_dict (clip/model.py:428-451 naming) -> pytree.
    Handles both ViT ('visual.conv1' = patchify) and ModifiedResNet
    ('visual.attnpool' present) checkpoints."""
    sd = {k: v for k, v in sd.items()}
    v, t = cfg.vision, cfg.text

    if "visual.attnpool.positional_embedding" in sd:  # RN50 family
        from .resnet import convert_openai_resnet
        return {"vision": convert_openai_resnet(sd, v, param_dtype),
                "text": _openai_text(sd, t, param_dtype),
                "logit_scale": _np(sd["logit_scale"]).astype(np.float32)}

    patch = _np(sd["visual.conv1.weight"]).reshape(v.hidden, -1).T

    vision = {
        "patch_embed": patch.astype(param_dtype),
        "class_embed": _np(sd["visual.class_embedding"]).astype(param_dtype),
        "pos_embed": _np(sd["visual.positional_embedding"]).astype(param_dtype),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "layers": _stack([_openai_layer(
            sd, f"visual.transformer.resblocks.{i}", v.hidden, param_dtype)
            for i in range(v.layers)]),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": _np(sd["visual.proj"]).astype(param_dtype),  # already [in,out]
    }
    return {"vision": vision, "text": _openai_text(sd, t, param_dtype),
            "logit_scale": _np(sd["logit_scale"]).astype(np.float32)}


def infer_config_from_openai(sd) -> CLIPConfig:
    """Shape-infer the architecture from an OpenAI state_dict, the same
    derivation as the reference's build_model (clip/model.py:428-443)."""
    from .clip import CLIPConfig, TextConfig, VisionConfig

    if "visual.attnpool.positional_embedding" in sd:  # ModifiedResNet
        from .resnet import ResNetVisionConfig
        layers = tuple(
            len({k.split(".")[2] for k in sd
                 if k.startswith(f"visual.layer{s + 1}.")}) for s in range(4))
        width = _np(sd["visual.conv3.weight"]).shape[0]
        feat_dim = _np(sd["visual.attnpool.positional_embedding"]).shape[1]
        spatial = int(round((_np(
            sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5))
        embed_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
        vision = ResNetVisionConfig(
            layers=layers, width=width, heads=feat_dim // 64,
            proj_dim=embed_dim, image_size=spatial * 32)
        t_width = _np(sd["ln_final.weight"]).shape[0]
        t_layers = len({k.split(".")[2] for k in sd
                        if k.startswith("transformer.resblocks")})
        return CLIPConfig(
            vision=vision,
            text=TextConfig(hidden=t_width, layers=t_layers,
                            heads=t_width // 64, proj_dim=embed_dim,
                            vocab=_np(sd["token_embedding.weight"]).shape[0],
                            ctx=_np(sd["positional_embedding"]).shape[0]))

    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    vision_patch = _np(sd["visual.conv1.weight"]).shape[-1]
    vision_layers = len({k.split(".")[3] for k in sd
                         if k.startswith("visual.transformer.resblocks")})
    grid = int(round((_np(sd["visual.positional_embedding"]).shape[0] - 1)
                     ** 0.5))
    embed_dim = _np(sd["text_projection"]).shape[1]
    t_width = _np(sd["ln_final.weight"]).shape[0]
    t_layers = len({k.split(".")[2] for k in sd
                    if k.startswith("transformer.resblocks")})
    vocab, ctx = _np(sd["token_embedding.weight"]).shape[0], \
        _np(sd["positional_embedding"]).shape[0]
    return CLIPConfig(
        vision=VisionConfig(hidden=vision_width, layers=vision_layers,
                            heads=vision_width // 64, proj_dim=embed_dim,
                            patch=vision_patch,
                            image_size=vision_patch * grid),
        text=TextConfig(hidden=t_width, layers=t_layers,
                        heads=t_width // 64, proj_dim=embed_dim,
                        vocab=vocab, ctx=ctx),
    )


def save_pytree(path: str, params) -> None:
    """Cache a converted checkpoint as a flat .npz (SURVEY.md section 5:
    convert the torch checkpoint once, reload as a JAX pytree)."""
    import jax
    flat = {jax.tree_util.keystr(k): np.asarray(v)
            for k, v in jax.tree_util.tree_leaves_with_path(params)}
    np.savez(path, **flat)


def load_pytree(path: str):
    """Inverse of save_pytree: rebuild the nested dict/list pytree from the
    keystr-flattened .npz."""
    flat = dict(np.load(path))
    root: dict = {}
    for keystr, value in flat.items():
        # keystr like "['vision']['layers'][0]['conv1']"
        parts = [p.strip("'\"") for p in
                 keystr.replace("]", "").split("[") if p]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def load_checkpoint(path: str, cfg: CLIPConfig = None, param_dtype=np.float32):
    """Load a local CLIP checkpoint (torch .pt/.bin, .safetensors, or a
    cached .npz pytree from save_pytree), auto-detecting HF vs OpenAI
    layout. Returns (params, cfg)."""
    if str(path).endswith(".npz"):
        if cfg is None:
            raise ValueError(".npz pytree cache requires an explicit config")
        return load_pytree(path), cfg
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = load_file(path)
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if "state_dict" in sd:
            sd = sd["state_dict"]
    if any(k.startswith("vision_model.") for k in sd):
        if cfg is None:
            raise ValueError("HF layout requires an explicit CLIPConfig")
        return from_hf_state_dict(sd, cfg, param_dtype), cfg
    cfg = cfg or infer_config_from_openai(sd)
    return from_openai_state_dict(sd, cfg, param_dtype), cfg
