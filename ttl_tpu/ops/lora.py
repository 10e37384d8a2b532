"""LoRA adapters as functional parameter overlays.

The reference injects PEFT LoRA modules into HF attention q/v projections and
resets them by copying snapshot tensors back in-place (custom_clip.py:139-217,
583-616). In JAX the adapters are a standalone pytree passed to the forward;
"reset" is re-binding the initial pytree - no mutation machinery exists.

Shapes follow the x@A@B orientation of ttl_tpu.models.clip:
    A: [L, d_model, rank]   B: [L, rank, d_model]
where L is the *adapted window* length (layer_range inclusive). Layers
outside the window carry mathematically-zero LoRA (PEFT inits B=0 and the
reference never trains them - custom_clip.py:186, ttl.py:159-160), so they
are simply not materialized.

Init semantics mirror LoRA_AB.initialize_weights (custom_clip.py:152-200):
only A is (re-)drawn; B stays zero. The torch init functions operate on the
PEFT [rank, d_in] weight layout, so fan_in = d_model, fan_out = rank:
    xavier   : N(0, sqrt(2 / (d_model + rank)))      (also used when None)
    gaussian : N(0, 1)                                (torch init.normal_ default)
    kaiming  : N(0, sqrt(2 / d_model))                (fan_in, leaky_relu gain)
    pretrained: PEFT default kaiming-uniform(a=sqrt(5)) = U(+-1/sqrt(d_model))
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

Adapters = Dict[str, Dict[str, jax.Array]]


def lora_scale(rank: int, alpha: int = 32) -> float:
    """PEFT scaling alpha/r (custom_clip.py:584-585: r=rank, lora_alpha=32)."""
    return alpha / rank


def _draw_A(key, n_layers, d_model, rank, init_method):
    shape = (n_layers, d_model, rank)
    if init_method in ("xavier", None):
        std = math.sqrt(2.0 / (d_model + rank))
        return jax.random.normal(key, shape, jnp.float32) * std
    if init_method == "gaussian":
        return jax.random.normal(key, shape, jnp.float32)
    if init_method == "kaiming":
        std = math.sqrt(2.0 / d_model)
        return jax.random.normal(key, shape, jnp.float32) * std
    if init_method == "pretrained":
        bound = 1.0 / math.sqrt(d_model)
        return jax.random.uniform(key, shape, jnp.float32, -bound, bound)
    raise ValueError(f"Unsupported init_method: {init_method}")


def init_adapters(key: jax.Array, n_layers: int, d_model: int, rank: int,
                  init_method: str | None = "xavier") -> Adapters:
    """Fresh adapter pytree for an n_layer window; this pytree IS the episodic
    reset state (binding it again == model.LoRA_reset(), ttl.py:338-343)."""
    kq, kv = jax.random.split(key)
    zeros_B = jnp.zeros((n_layers, rank, d_model), jnp.float32)
    return {
        "q": {"A": _draw_A(kq, n_layers, d_model, rank, init_method),
              "B": zeros_B},
        "v": {"A": _draw_A(kv, n_layers, d_model, rank, init_method),
              "B": zeros_B},
    }


def adapter_param_count(adapters: Adapters) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(adapters))
