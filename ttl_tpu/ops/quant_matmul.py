"""Pallas fused quantize->int8-GEMM->dequantize kernel (tested experiment).

Motivation: the XLA int8 prefix path (ops/quant.py linear_q) pays an
HBM-bound epilogue - the MXU writes the int32 accumulator [T, N] to HBM
(4 B/elem) and a separate fusion re-reads it to apply the (row x col) scales
and emit bf16 (~22 ms/step of converts at the TTL batch, trace-measured).
This kernel keeps the accumulator in VMEM: per grid row-block it quantizes
the bf16 activations in-register, runs one int8 dot against the resident
int8 weights, applies scales + bias, and writes bf16 once.

Measured on v5e at the TTL fc1 shape (12608x768 @ 768x3072, vmap 8):

    XLA int8 (linear_q)          0.357 ms/GEMM   (int32 epilogue via HBM)
    XLA int8, bf16-out dot       0.348 ms/GEMM   (lossy accumulator)
    this kernel (tm=512)         0.444 ms/GEMM   <- loses
    bf16 baseline                0.436 ms/GEMM

Bitwise-exact against linear_q, yet ~25% slower: inside one grid program the
VPU quantize and the MXU dot serialize, and Mosaic schedules one
M-block-at-a-time dot where XLA pipelines the whole batched GEMM - the same
mechanism that defeated the flash-attention kernels (PERF_NOTES.md). Kept as
a validated reference implementation (test_quant.py exercises exactness);
NOT wired into the product path - linear_q's XLA form is the shipped int8
prefix implementation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Pallas kernels compile for TPU; on CPU (tests, virtual meshes) they
    run through the interpreter."""
    return jax.default_backend() != "tpu"


def _qmm_kernel(x_ref, wq_ref, sc_ref, b_ref, o_ref):
    x = x_ref[:]                                    # [TM, K] activations
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax, jnp.asarray(1e-12, x.dtype)) / 127.0
    xq = jnp.clip(jnp.round((x / s).astype(jnp.float32)),
                  -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s.astype(jnp.float32) * sc_ref[:])
    o_ref[:] = (y + b_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tm",))
def quantized_matmul(x: jax.Array, wq: jax.Array, scale: jax.Array,
                     b: jax.Array, *, tm: int = 512) -> jax.Array:
    """y = dequant(quant(x) @ wq) + b, numerics identical to
    ops.quant.linear_q. x: [T, K] bf16/f32, wq: [K, N] int8,
    scale/b: [1, N] f32. The weight block is grid-constant so Mosaic keeps
    it VMEM-resident across row blocks; VMEM needs
    tm*(K*2 + N*6) + K*N bytes (~10 MB at the fc1 shape, tm=512)."""
    t, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        _qmm_kernel,
        grid=(pl.cdiv(t, tm),),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), x.dtype),
        interpret=_interpret(),
    )(x, wq, scale, b)
