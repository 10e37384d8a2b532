"""Pallas fused attention for short-sequence ViT towers.

The XLA einsum attention materializes the [B,H,S,S] score/probability
tensors to HBM (~60MB per ViT-B layer at 64 views); profiling shows the A@V
einsum HBM-bound at ~13% of busy time. For CLIP's sequences (197 image / 77
text tokens) an entire head's q/k/v fits comfortably in VMEM, so the fused
kernel computes scores -> mask -> softmax -> @v per (batch, head) program
without ever leaving VMEM - flash attention without the online-softmax
machinery it doesn't need at this length.

Numerics match the reference attention exactly: f32 scores, f32 softmax,
bf16 A@V with f32 accumulation. Padded key positions are masked to -inf
(needed because S pads up to the sublane multiple).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    """Pallas kernels compile for TPU; on CPU (tests, virtual meshes) they
    run through the interpreter."""
    return jax.default_backend() != "tpu"


def _default_mode(backend: str, n_devices: int) -> str:
    """The auto default when TTL_FUSED_ATTENTION is unset: the layout-native
    bshd kernel on a single real TPU chip, XLA einsum everywhere else.

    bshd measured +16% busy / +15% wall on the full benched ViT-B/16 TTL
    step (228.7 vs 265.8 ms/step busy, same relay window) and is the first
    kernel to beat the XLA einsum at CLIP lengths — by consuming the
    towers' native [B,S,H*D] layout it pays neither the HBM transposes nor
    the score round-trip (PERF_NOTES 'bshd', round 5). CPU stays on einsum
    (interpret-mode Pallas is orders slower; tests and the driver's virtual
    meshes live there). Multi-device defaults to "" HERE because pallas_call
    has no GSPMD partitioning rule (under plain pjit it would force
    gathers) — but the fused mesh builders (adapt.ttl._jit_fused) route
    data-only TPU meshes through jax.shard_map and pin the kernel back on
    via force_mode, per mesh_kernel_mode below."""
    return "bshd" if (backend == "tpu" and n_devices == 1) else ""


@functools.lru_cache()
def _env_mode() -> str:
    """The TTL_FUSED_ATTENTION env decision (cached; see fused_mode)."""
    import os
    v = os.environ.get("TTL_FUSED_ATTENTION", "")
    if v in ("1", "true", "True", "per_head"):
        return "per_head"
    if v == "heads":
        return "heads"
    if v == "bshd":
        return "bshd"
    if v in ("0", "off", "xla", "einsum"):
        return ""
    return _default_mode(jax.default_backend(), jax.device_count())


# Trace-time override stack: shard_map bodies run the per-device program of
# a multi-device mesh, where the global-device-count default is wrong — the
# mesh builder (adapt.ttl._jit_fused) decides the route once and pins it for
# the body's trace via force_mode. A list-as-stack keeps nesting safe.
# Module-global (not a contextvar): every trace in this codebase happens on
# the thread that builds the program (runner/serve build once at startup).
_FORCED_MODE: list = []


class force_mode:
    """Context manager pinning fused_mode() for the enclosed trace."""

    def __init__(self, mode: str):
        self.mode = mode

    def __enter__(self):
        _FORCED_MODE.append(self.mode)
        return self

    def __exit__(self, *exc):
        _FORCED_MODE.pop()
        return False


def fused_mode() -> str:
    """Which kernel the towers route attention through.

    unset/'auto' (default): _default_mode — the bshd Pallas kernel on a
    single TPU chip (measured winner, round 5), XLA's batched-GEMM einsum
    otherwise. '0'|'off'|'xla'|'einsum': force the XLA einsum everywhere.
    'bshd' (TTL_FUSED_ATTENTION=bshd): force the layout-native kernel —
    one batch element per program in the native [B,S,H*D] layout, heads
    unrolled in-kernel so a single [Sp,Sp] f32 score block is live.
    'per_head' (TTL_FUSED_ATTENTION=1|true|per_head): the original
    one-(batch*head)-per-program kernel — loses ~30% at ViT-B (grid
    overhead) and 27% at ViT-L (physical [B,H,S,D] HBM transposes).
    'heads' (TTL_FUSED_ATTENTION=heads): the r4 heads-batched grid —
    amortizes grid overhead 12x but materializes all heads' scores
    (exceeds scoped VMEM at ViT-L; see heads_mode_fits).
    tools/attn_floor.py measures all of them. Every kernel is numerically
    exact (f32 scores in VMEM). An active force_mode (mesh builders) wins
    over the env."""
    if _FORCED_MODE:
        return _FORCED_MODE[-1]
    return _env_mode()


# back-compat: callers/tests clear the env decision via
# fused_mode.cache_clear() as when fused_mode itself was lru_cached
fused_mode.cache_clear = _env_mode.cache_clear


def mesh_kernel_mode(data_only: bool) -> str:
    """The attention route for a jit-over-mesh program (adapt.ttl._jit_fused).

    Manual data parallelism (shard_map over the data axis) makes each device
    run the single-chip program verbatim, so on a data-only TPU mesh the
    bshd kernel — the measured single-chip winner (+21.5% ViT-B/16, +26.2%
    ViT-L/14 busy, PERF_NOTES r5) — stays the default; pallas_call needs
    this because it has no GSPMD partitioning rule and would otherwise
    force gathers under plain pjit. Model-axis meshes keep the einsum: the
    megatron head split lives on the lane axis the kernel slices, and
    GSPMD owns that layout. Explicit TTL_FUSED_ATTENTION=off|xla|per_head|
    heads disables the shard_map route (the per_head/heads grids were
    measured losers; under a mesh they degrade to einsum rather than to an
    unpartitionable pallas_call)."""
    import os
    if not data_only:
        return ""
    v = os.environ.get("TTL_FUSED_ATTENTION", "")
    if v == "bshd":
        return "bshd"
    if v in ("", "auto"):
        return "bshd" if jax.default_backend() == "tpu" else ""
    return ""


def use_fused() -> bool:
    """Back-compat boolean: any Pallas kernel selected."""
    return bool(fused_mode())


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float,
                 causal: bool):
    q = q_ref[0]                     # [Sp, D]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [Sp, Sp] f32
    sp = q.shape[0]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        mask = mask & (kpos <= qpos)
    scores = jnp.where(mask, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool = False) -> jax.Array:
    """[B, H, S, D] -> [B, H, S, D]; softmax(q k^T / sqrt(D)) v, fully in
    VMEM per (B*H) grid step."""
    b, h, s, d = q.shape
    sp = _round_up(s, 16)  # bf16 sublane multiple
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]
    qp = jnp.pad(q, pad).reshape(b * h, sp, d)
    kp = jnp.pad(k, pad).reshape(b * h, sp, d)
    vp = jnp.pad(v, pad).reshape(b * h, sp, d)

    kernel = functools.partial(_attn_kernel, seq_len=s,
                               scale=1.0 / math.sqrt(d), causal=causal)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out.reshape(b, h, sp, d)[:, :, :s]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     seq_len: int, scale: float, causal: bool):
    """Recompute-softmax flash backward, one (batch*head) per program:
        w  = softmax(mask(q k^T * scale))
        dv = w^T do
        dw = do v^T
        ds = w * (dw - rowsum(dw * w))        (softmax VJP)
        dq = ds k * scale ; dk = ds^T q * scale
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    sp = q.shape[0]
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        mask = mask & (kpos <= qpos)
    scores = jnp.where(mask, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1)

    dv_ref[0] = jax.lax.dot_general(
        w.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dw = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention(q, k, v, causal: bool = False):
    """Differentiable fused attention: Pallas forward + Pallas backward."""
    return fused_attention(q, k, v, causal)


def _attention_fwd(q, k, v, causal):
    return fused_attention(q, k, v, causal), (q, k, v)


def _attention_bwd(causal, res, do):
    q, k, v = res
    b, h, s, d = q.shape
    sp = _round_up(s, 16)
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]

    def prep(t):
        return jnp.pad(t, pad).reshape(b * h, sp, d)

    kernel = functools.partial(_attn_bwd_kernel, seq_len=s,
                               scale=1.0 / math.sqrt(d), causal=causal)
    spec = pl.BlockSpec((1, sp, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b * h, sp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=_interpret(),
    )(prep(q), prep(k), prep(v), prep(do))

    def unprep(t):
        return t.reshape(b, h, sp, d)[:, :, :s]

    return unprep(dq), unprep(dk), unprep(dv)


attention.defvjp(_attention_fwd, _attention_bwd)


# ------------------------------------------------- heads-batched grid (r4)

def _heads_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float,
                  causal: bool):
    """One batch element per program; all H heads as batched in-kernel
    dots. Same math as _attn_kernel; the [H, Sp, Sp] f32 score block stays
    in VMEM (12 heads x 208^2 f32 ~= 2.1 MB at ViT-B shapes)."""
    q = q_ref[0]                     # [H, Sp, D]
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale      # [H, Sp, Sp]
    kpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mask = mask & (kpos <= qpos)
    scores = jnp.where(mask, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        w, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _heads_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, seq_len: int, scale: float, causal: bool):
    """Recompute-softmax backward, one batch element per program (the
    heads-batched analog of _attn_bwd_kernel; same VJP algebra with a
    leading head batch dim on every dot)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    kpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        mask = mask & (kpos <= qpos)
    scores = jnp.where(mask, scores, jnp.float32(-1e9))
    w = jax.nn.softmax(scores, axis=-1)

    dv_ref[0] = jax.lax.dot_general(
        w.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dw = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds = jnp.where(mask, ds, 0.0) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _heads_call(kernel, n_out, q, k, v, extra=()):
    b, h, s, d = q.shape
    sp = _round_up(s, 16)
    pad = [(0, 0), (0, 0), (0, sp - s), (0, 0)]

    def prep(t):
        return jnp.pad(t, pad)

    spec = pl.BlockSpec((1, h, sp, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, h, sp, d), q.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * (3 + len(extra)),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        out_shape=shape if n_out == 1 else (shape,) * n_out,
        interpret=_interpret(),
    )(prep(q), prep(k), prep(v), *(prep(t) for t in extra))
    if n_out == 1:
        return out[:, :, :s]
    return tuple(t[:, :, :s] for t in out)


def heads_mode_fits(heads: int, s: int, head_dim: int,
                    itemsize: int = 2) -> bool:
    """Static check: does the heads-batched kernel's per-program footprint
    fit TPU scoped VMEM (~16 MB)?

    The backward program is the binding one: 4 input + 3 output blocks of
    [H, Sp, D] (double-buffered by the pipeline) plus the two [H, Sp, Sp]
    f32 score/prob blocks on the kernel stack. The model reproduces the
    measured numbers: ViT-L (16 heads, Sp 272) estimates 16.5 MB vs the
    actual 17.18 MB scoped alloc that XLA rejected against its 16 MB limit
    ("Ran out of memory in memory space vmem" at compile); ViT-B (12
    heads, Sp 208) estimates 8.6 MB and compiles fine. Callers must fall
    back (models.clip._attention drops to per_head with a warning)."""
    sp = _round_up(s, 16)
    blocks = 2 * 7 * heads * sp * head_dim * itemsize
    scores = 2 * heads * sp * sp * 4
    return blocks + scores < 14 * 1024 * 1024  # 2 MB safety margin


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def attention_heads(q, k, v, causal: bool = False):
    """Differentiable heads-batched fused attention: [B, H, S, D] ->
    [B, H, S, D], grid over B only (TTL_FUSED_ATTENTION=heads)."""
    d = q.shape[-1]
    kernel = functools.partial(_heads_kernel, seq_len=q.shape[2],
                               scale=1.0 / math.sqrt(d), causal=causal)
    return _heads_call(kernel, 1, q, k, v)


def _attention_heads_fwd(q, k, v, causal):
    return attention_heads(q, k, v, causal), (q, k, v)


def _attention_heads_bwd(causal, res, do):
    q, k, v = res
    d = q.shape[-1]
    kernel = functools.partial(_heads_bwd_kernel, seq_len=q.shape[2],
                               scale=1.0 / math.sqrt(d), causal=causal)
    return _heads_call(kernel, 3, q, k, v, extra=(do,))


attention_heads.defvjp(_attention_heads_fwd, _attention_heads_bwd)


# --------------------------------------------- bshd layout-native grid (r5)
#
# Both earlier kernels lose for layout reasons the math never sees:
#   * per_head/heads demand a literal [B, H, S, D] array, so XLA has to
#     materialize physical HBM transposes of q/k/v/o around every
#     pallas_call (~270 MB per tensor per layer at the benched ViT-L
#     batch) — the dominant term of per_head's measured 27% loss.
#   * heads materializes the all-heads [H, Sp, Sp] f32 score block in one
#     program: 17.18 MB scoped VMEM at ViT-L, over the 16 MB limit.
# This grid fixes both at once: it consumes the towers' native
# [B, S, H*D] layout directly (every DMA contiguous, zero transposes),
# grids over batch only, and loops over heads INSIDE the kernel with
# static lane slices — so exactly one head's [Sp, Sp] f32 score block is
# ever live (~300 KB at ViT-L). Numerics match the f32-score reference
# path exactly: f32 scores in VMEM, f32 softmax, bf16 A@V with f32
# accumulation. Opt-in via TTL_FUSED_ATTENTION=bshd; tools/attn_floor.py
# and tools/vitl_ceiling.py measure it against the XLA einsum default.


def _bshd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, seq_len: int,
                 scale: float, causal: bool):
    q = q_ref[0]                     # [Sp, H*D] — native layout, no DMA tricks
    k = k_ref[0]
    v = v_ref[0]
    sp, hd = q.shape
    d = hd // heads
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        mask = mask & (kpos <= qpos)
    outs = []
    for h in range(heads):           # unrolled; one head's scores live at a time
        sl = slice(h * d, (h + 1) * d)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [Sp, Sp] f32
        scores = jnp.where(mask, scores, jnp.float32(-1e9))
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        # bf16 partials + one concat: the all-heads buffer is only
        # [Sp, H*D] bf16 (~0.5 MB at ViT-L), well inside scoped VMEM; the
        # backward, whose f32 partials would not fit, writes lane slices
        # per head instead (see _bshd_bwd_kernel)
        outs.append(jax.lax.dot_general(
            w, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def bshd_bwd_concat_fits(heads: int, s: int, head_dim: int,
                         itemsize: int = 2) -> bool:
    """Static check: can the bshd backward accumulate all heads' partials
    and concat once (the faster form, measured +2.6% busy at ViT-B), or
    must it write per-head lane slices (the VMEM-lean form)?

    Anchored on the two measured points: ViT-B (12 heads, Sp 208) concat
    backward compiled and ran; ViT-L (16 heads, Sp 272) concat backward
    was rejected at 19.27 MB scoped vs the 16 MB limit. The model below
    scales the same terms (7 double-buffered io blocks, all-heads bf16
    partials, ~4 f32 [Sp,Sp] scratch blocks) by the ViT-L-calibrated
    factor so ViT-B passes with margin and ViT-L fails with margin."""
    sp = _round_up(s, 16)
    hd = heads * head_dim
    io = 2 * 7 * sp * hd * itemsize                  # double-buffered blocks
    partials = 3 * heads * sp * head_dim * itemsize  # bf16 partial lists
    scratch = 4 * sp * sp * 4                        # scores/w/dw/ds f32
    est = (io + partials + scratch) * 1.6            # Mosaic stack slop
    return est < 14 * 1024 * 1024


def _bshd_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     heads: int, seq_len: int, scale: float, causal: bool,
                     group: int):
    """Recompute-softmax backward in the native layout; same VJP algebra as
    _attn_bwd_kernel, per head under the unrolled loop. Heads are processed
    in groups of `group`: each group's dq/dk/dv partials are concatenated
    once and stored to the output refs' lane slice in one write. group ==
    heads is the all-heads concat (fastest where it fits: single unmasked
    store, measured +2.6% busy at ViT-B over group=1); group == 1 writes
    each head's partials directly (the VMEM-lean form shipped for ViT-L,
    where the all-heads f32 partial set hit 19.27 MB scoped vs the 16 MB
    limit); intermediate groups trade live-partial VMEM against the number
    of Mosaic lane-slice stores. See bshd_bwd_group for the selection."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    sp, hd = q.shape
    d = hd // heads
    kpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = kpos < seq_len
    if causal:
        qpos = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        mask = mask & (kpos <= qpos)
    for g0 in range(0, heads, group):
        g1 = min(g0 + group, heads)
        dqs, dks, dvs = [], [], []
        for h in range(g0, g1):
            sl = slice(h * d, (h + 1) * d)
            qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
            doh = do[:, sl].astype(jnp.float32)
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(mask, scores, jnp.float32(-1e9))
            w = jax.nn.softmax(scores, axis=-1)
            dvs.append(jax.lax.dot_general(
                w.astype(doh.dtype), doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dv_ref.dtype))
            dw = jax.lax.dot_general(
                doh, vh.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
            ds = jnp.where(mask, ds, 0.0) * scale
            dqs.append(jax.lax.dot_general(
                ds, kh.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dq_ref.dtype))
            dks.append(jax.lax.dot_general(
                ds, qh.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dk_ref.dtype))
        gsl = slice(g0 * d, g1 * d)
        dq_ref[0, :, gsl] = (dqs[0] if len(dqs) == 1
                             else jnp.concatenate(dqs, axis=1))
        dk_ref[0, :, gsl] = (dks[0] if len(dks) == 1
                             else jnp.concatenate(dks, axis=1))
        dv_ref[0, :, gsl] = (dvs[0] if len(dvs) == 1
                             else jnp.concatenate(dvs, axis=1))


def _bshd_call(kernel, n_out, q, k, v, extra=(), pre_padded=False):
    """Shared pallas_call plumbing for the bshd grid: inputs [B, S, H*D],
    grid (B,), seq padded to the sublane multiple, contiguous blocks.

    With pre_padded the caller guarantees S is already the sublane
    multiple and dead tail rows are masked by the kernel's seq_len — the
    towers pad the token axis once per forward instead of paying the HBM
    pad/slice round-trip at every layer (13.3 ms/step ViT-B, 52 ms ViT-L
    in the r5 traces), and the padded rows ride the residual stream
    (per-token ops keep them isolated; pooling never reads them)."""
    b, s, hd = q.shape
    sp = _round_up(s, 16)
    if pre_padded:
        assert sp == s, (s, "pre-padded callers must pass a sublane multiple")

    def prep(t):
        return t if sp == s else jnp.pad(t, [(0, 0), (0, sp - s), (0, 0)])

    spec = pl.BlockSpec((1, sp, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, sp, hd), q.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[spec] * (3 + len(extra)),
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        out_shape=shape if n_out == 1 else (shape,) * n_out,
        interpret=_interpret(),
    )(prep(q), prep(k), prep(v), *(prep(t) for t in extra))
    if sp == s:
        return out
    if n_out == 1:
        return out[:, :s]
    return tuple(t[:, :s] for t in out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_bshd_fused(q, k, v, heads: int, causal: bool = False,
                         seq_len: int | None = None):
    """Differentiable layout-native fused attention: [B, S, H*D] ->
    [B, S, H*D] with the head split done by static lane slices inside the
    kernel (TTL_FUSED_ATTENTION=bshd). Padded key positions masked to
    -inf. seq_len (static) marks tower-level pre-padding: the arrays are
    already at the sublane multiple and only the first seq_len tokens are
    real — key masking uses it and no per-call pad/slice happens; pad-row
    outputs are garbage the caller never reads."""
    d = q.shape[-1] // heads
    kernel = functools.partial(_bshd_kernel, heads=heads,
                               seq_len=seq_len or q.shape[1],
                               scale=1.0 / math.sqrt(d), causal=causal)
    return _bshd_call(kernel, 1, q, k, v, pre_padded=seq_len is not None)


def _attention_bshd_fwd(q, k, v, heads, causal, seq_len):
    return attention_bshd_fused(q, k, v, heads, causal, seq_len), (q, k, v)


def bshd_bwd_group(heads: int, s: int, head_dim: int,
                   itemsize: int = 2) -> int:
    """How many heads the bshd backward concatenates per output store.

    heads (all-heads concat, one unmasked store per ref) where the concat
    form fits scoped VMEM (ViT-B); otherwise 1 (per-head lane-slice
    stores, the measured-safe ViT-L form). TTL_BSHD_BWD_GROUP overrides
    for experiments (tools/attn_bwd_floor.py measures the sweep; clamped
    to [1, heads])."""
    import os
    v = os.environ.get("TTL_BSHD_BWD_GROUP")
    if v:
        return max(1, min(heads, int(v)))
    if bshd_bwd_concat_fits(heads, s, head_dim, itemsize):
        return heads
    return 1


def _attention_bshd_bwd(heads, causal, seq_len, res, do):
    q, k, v = res
    d = q.shape[-1] // heads
    kernel = functools.partial(
        _bshd_bwd_kernel, heads=heads, seq_len=seq_len or q.shape[1],
        scale=1.0 / math.sqrt(d), causal=causal,
        group=bshd_bwd_group(heads, q.shape[1], d, q.dtype.itemsize))
    return _bshd_call(kernel, 3, q, k, v, extra=(do,),
                      pre_padded=seq_len is not None)


attention_bshd_fused.defvjp(_attention_bshd_fwd, _attention_bshd_bwd)


def _scores_dtype_low() -> bool:
    """Whether low-precision inputs store attention scores in the input
    dtype (bf16) instead of f32. Default ON: the [B,H,S,S] score tensor is
    the dominant HBM traffic of the towers (~21% of busy time at the TTL
    batch), storing it bf16 halves that, and it mirrors the reference's
    fp16-autocast behavior (torch bmm emits fp16 scores; softmax internally
    promotes - HF CLIPAttention under ttl.py:222's autocast), though bf16's
    7 mantissa bits are coarser than fp16's 10 (covered by the bf16~=f32
    cosine test). f32 compute runs are always bit-identical to round 1.
    TTL_ATTN_SCORES=f32 restores round-1 f32 score storage for bf16 runs
    too."""
    import os
    return os.environ.get("TTL_ATTN_SCORES", "low") != "f32"


def attention_bshd(q, k, v, causal: bool = False):
    """Attention over [B, S, H, D] inputs (head axis in place, no physical
    transpose): the q/k/v head splits feed the score einsums directly and
    the output lands back in [B, S, H, D] for the contiguous reshape to
    [B, S, H*D]. Saves the three [B,S,D]-sized copies per layer the
    BHSD-layout path pays. Same math as reference_attention."""
    d = q.shape[-1]
    low = _scores_dtype_low() and q.dtype != jnp.float32
    q = (q.astype(jnp.float32) * (1.0 / math.sqrt(d))).astype(q.dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=(q.dtype if low
                                                else jnp.float32))
    if causal:
        s = q.shape[1]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask, scores, jnp.asarray(-1e9, scores.dtype))
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def reference_attention(q, k, v, causal: bool = False):
    """The einsum formulation (XLA batched GEMMs; the measured winner at
    CLIP sequence lengths - see use_fused).

    Low mode (default for low-precision inputs): q is pre-scaled (the small
    [.,S,D] tensor, HF CLIPAttention layout) and scores are written in the
    input dtype via the GEMM epilogue; softmax math stays f32. f32 mode
    (TTL_ATTN_SCORES=f32, and always when inputs are f32) is bit-identical
    to round 1: f32 scores from unscaled q, divided after.
    """
    d = q.shape[-1]
    low = _scores_dtype_low() and q.dtype != jnp.float32
    if low:
        q = (q.astype(jnp.float32) * (1.0 / math.sqrt(d))).astype(q.dtype)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=q.dtype)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores.astype(jnp.float32) / math.sqrt(d)
    if causal:
        s = q.shape[2]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask, scores,
                           jnp.asarray(-1e9, scores.dtype))
    # softmax math in f32 (the astype fuses; measured best of the three
    # formulations tried on-chip - see PERF_NOTES.md round 2)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)
