"""Prompt checkpoint loading (CoOp / CoCoOp).

Equivalent of the reference's load_model_weight (utils/tools.py:105-135):
reads a torch checkpoint with a 'state_dict' entry, drops the fixed
token_prefix/token_suffix buffers (they are rebuilt from the current
classnames), and maps the remaining tensors onto the functional prompt
states. Base CLIP weights go through ttl_tpu.models.convert instead.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def load_prompt_state_dict(load_path: str) -> Optional[dict]:
    """Read {name: array} from a CoOp/CoCoOp checkpoint; None if missing."""
    if not os.path.isfile(load_path):
        print(f"=> no checkpoint found at '{load_path}'")
        return None
    import torch
    print(f"=> loading checkpoint '{load_path}'")
    ckpt = torch.load(load_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    for k in ("token_prefix", "token_suffix"):  # rebuilt per dataset
        sd.pop(k, None)
    epoch = ckpt.get("epoch", "?") if isinstance(ckpt, dict) else "?"
    print(f"=> loaded checkpoint '{load_path}' (epoch {epoch})")
    return {k: _np(v) for k, v in sd.items()}


def apply_prompt_ckpt(pl_state, sd: dict):
    """Overlay a CoOp checkpoint onto a PromptLearnerState: the tunable ctx
    (and its reset snapshot) come from the checkpoint."""
    import jax.numpy as jnp
    key = next((k for k in sd if k.endswith("ctx")), None)
    if key is None:
        return pl_state
    ctx = jnp.asarray(sd[key])
    return dataclasses.replace(pl_state, ctx=ctx, ctx_init=ctx)


def apply_cocoop_ckpt(state, sd: dict):
    """Overlay a CoCoOp checkpoint (ctx + meta_net.linear1/linear2) onto a
    CoCoOpState; weights transpose to the [in, out] convention."""
    import jax.numpy as jnp

    def find(suffix):
        return next((k for k in sd if k.endswith(suffix)), None)

    updates = {}
    if find("ctx"):
        updates["ctx"] = jnp.asarray(sd[find("ctx")])
    if find("meta_net.linear1.weight"):
        updates["meta_w1"] = jnp.asarray(sd[find("meta_net.linear1.weight")]).T
        updates["meta_b1"] = jnp.asarray(sd[find("meta_net.linear1.bias")])
        updates["meta_w2"] = jnp.asarray(sd[find("meta_net.linear2.weight")]).T
        updates["meta_b2"] = jnp.asarray(sd[find("meta_net.linear2.bias")])
    return dataclasses.replace(state, **updates)
