"""Fused layernorm + matmul Pallas kernel (frozen-path experiment).

Profiling the TTL step shows ~10% of busy time in the layernorm's HBM
round-trip (read x, write normalized x, read it again for the projection).
This kernel folds the pre-LN normalize into the matmul prologue: each grid
step loads one row-tile of x, computes row statistics in VMEM, normalizes in
registers, and feeds the MXU directly - x is read once and the normalized
intermediate never touches HBM.

Forward-only by design: intended for the *frozen* tower segments (the
stop-gradient prefix/suffix scans and the text tower in image mode), where
no custom VJP would be needed.

Numerics match layer_norm+linear exactly: f32 statistics and accumulation,
bf16 MXU inputs.

MEASURED RESULT (v5e, ViT-B hot shapes M=100864, K=768, N=2304/3072):
performance-neutral vs the stock XLA layer_norm-then-matmul (1.02x / 0.97x,
max diff 0.0) - XLA already fuses the normalize into the matmul input
pipeline, so the HBM round-trip this kernel removes was not actually paid.
Kept as a tested, exact kernel for configs where XLA's fusion differs; not
wired into the towers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *, eps: float,
            n_rows: int):
    x = x_ref[:].astype(jnp.float32)                   # [TM, K]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    h = (x - mu) * jax.lax.rsqrt(var + eps)
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    acc = jax.lax.dot_general(
        h.astype(w_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "tile_m"))
def ln_matmul(x: jax.Array, ln_scale: jax.Array, ln_bias: jax.Array,
              w: jax.Array, b: jax.Array, *, eps: float = 1e-5,
              tile_m: int = 256) -> jax.Array:
    """out = layer_norm(x; scale,bias) @ w + b  for x [M, K], w [K, N].

    Returns [M, N] in x.dtype. K and N must be lane-aligned (multiples of
    128) - true for every CLIP tower shape (512/640/768/1024/2048...).
    """
    m, k = x.shape
    n = w.shape[1]
    mp = ((m + tile_m - 1) // tile_m) * tile_m
    xp = jnp.pad(x, ((0, mp - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, n_rows=m),
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, n), x.dtype),
        interpret=_interpret(),
    )(xp, ln_scale, ln_bias, w.astype(x.dtype), b)
    return out[:m]


def reference_ln_matmul(x, ln_scale, ln_bias, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
         ).astype(x.dtype)
    out = jnp.matmul(h, w.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)
