"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (SURVEY.md section 2.2: no DP/TP/PP, no
collectives). The TPU-native scaling story is:

- **data axis**: each chip adapts *different test samples* concurrently.
  Episodic adapter/optimizer state is per-sample by construction, so the
  vmapped TTL program shards over samples with zero cross-chip traffic in
  the hot loop; only the accuracy reduction crosses chips (one psum per
  batch, rides ICI).
- **model axis** (optional, for ViT-L/14-class towers or small chips):
  megatron-style head/ffn sharding of the attention and MLP blocks plus a
  class-axis shard of the text classifier. XLA/GSPMD inserts the matching
  all-reduces from the shardings alone.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Mesh over the available devices. shape=(data,) or (data, model);
    default: all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    axis_names = (DATA_AXIS, MODEL_AXIS)[: len(shape)]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def _has_model_axis(mesh: Mesh) -> bool:
    return MODEL_AXIS in mesh.axis_names and mesh.shape[MODEL_AXIS] > 1


def param_spec(path: str, mesh: Mesh) -> P:
    """Megatron-style tensor-parallel placement by parameter path.

    q/k/v and fc1 split the output feature dim; o and fc2 split the input
    dim (so each pair contracts locally and GSPMD inserts one all-reduce per
    block). Everything else - embeddings, layernorms, and non-transformer
    towers (ResNet conv stacks, attnpool) - replicates. Matching is on
    exact path *segments* under a stacked 'layers' node, so e.g. the RN50
    'attnpool/q/w' (a 2D array) never picks up the 3D stacked-layer specs.
    """
    if not _has_model_axis(mesh):
        return P()
    parts = tuple(path.split("/"))
    if "layers" not in parts or "prefix_q" in parts:
        # prefix_q (int8 frozen-prefix copy, ops/quant.py) replicates: its
        # per-output-channel scales would need a matching split, and the
        # int8 layers are already the cheap path
        return P()

    def ends_with(*suffix):
        return parts[-len(suffix):] == suffix

    if (ends_with("attn", "q", "w") or ends_with("attn", "k", "w")
            or ends_with("attn", "v", "w") or ends_with("attn", "qkv", "w")
            or ends_with("mlp", "fc1", "w")):
        return P(None, None, MODEL_AXIS)  # stacked [L, in, out]
    if ends_with("attn", "o", "w") or ends_with("mlp", "fc2", "w"):
        return P(None, MODEL_AXIS, None)
    if (ends_with("attn", "q", "b") or ends_with("attn", "k", "b")
            or ends_with("attn", "v", "b") or ends_with("attn", "qkv", "b")
            or ends_with("mlp", "fc1", "b")):
        return P(None, MODEL_AXIS)
    return P()


def shard_params(params, mesh: Mesh):
    """Place the CLIP pytree on the mesh according to param_spec."""
    def place(path, leaf):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        return jax.device_put(leaf, NamedSharding(mesh, param_spec(key, mesh)))

    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree)


def shard_batch(tree, mesh: Mesh):
    """Shard leading (sample) axis over the data axis."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(DATA_AXIS))), tree)
