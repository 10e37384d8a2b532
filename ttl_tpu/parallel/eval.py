"""Sharded multi-chip TTL evaluation.

Wraps the vmapped episodic program with mesh shardings: params follow
`param_spec` (replicated, or tensor-parallel over the model axis), the
sample batch shards over the data axis, and the text classifier shards its
class axis over the model axis when one exists. GSPMD inserts all
collectives; the hot loop itself is communication-free data parallelism.

Also provides the cross-chip metric reduction (`sharded_topk_correct`) - the
one place the TPU build needs a collective at all (psum of correct counts,
SURVEY.md section 5).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..adapt.ttl import make_ttl_adapt_fn
from ..config import TTLConfig
from ..models.clip import CLIPConfig
from .mesh import DATA_AXIS, MODEL_AXIS, _has_model_axis


def make_sharded_ttl_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, mesh, *,
                        tokens: Optional[jax.Array] = None,
                        n_classes: Optional[int] = None):
    """Batched TTL step with explicit input/output shardings.

    f(params, text_cls, adapters0, views[S,...], keys[S]) -> AdaptResult;
    S must be a multiple of the data-axis size. The text classifier's class
    axis shards over the model axis when `n_classes` divides evenly,
    otherwise it replicates (class tables are small; the shard is a memory
    optimization, not a throughput one).
    """
    adapt_one = make_ttl_adapt_fn(clip_cfg, cfg)
    if cfg.lora_encoder == "text":
        one = lambda p, tc, a0, v, k: adapt_one(p, tc, a0, v, k, tokens=tokens)
    else:
        one = adapt_one
    batched = jax.vmap(one, in_axes=(None, None, None, 0, 0))

    repl = NamedSharding(mesh, P())
    data0 = NamedSharding(mesh, P(DATA_AXIS))
    shard_text = (_has_model_axis(mesh) and n_classes is not None
                  and n_classes % mesh.shape[MODEL_AXIS] == 0)

    def with_constraints(params, text_cls, adapters0, views, keys):
        views = jax.lax.with_sharding_constraint(
            views, NamedSharding(mesh, P(DATA_AXIS)))
        if shard_text:
            # class-axis shard applied as an internal constraint so callers
            # may hand in a replicated classifier (GSPMD redistributes)
            text_cls = jax.lax.with_sharding_constraint(
                text_cls, NamedSharding(mesh, P(MODEL_AXIS, None)))
        # einsum attention under GSPMD: pallas_call has no partitioning
        # rule, so a forced-kernel env must not reach this pjit program
        # (the fused runner path routes kernels via shard_map instead —
        # adapt.ttl._jit_fused)
        from ..ops import attention as fa
        with fa.force_mode(""):
            return batched(params, text_cls, adapters0, views, keys)

    return jax.jit(
        with_constraints,
        in_shardings=(None, None, repl, data0, data0),
        out_shardings=data0,
    )


def sharded_topk_correct(logits: jax.Array, labels: jax.Array,
                         topk=(1, 5)) -> jax.Array:
    """[S, C] sharded logits + [S] labels -> global correct counts per k.

    jit-compatible over a sharded batch; the sum over the sample axis becomes
    a psum over the data axis under GSPMD.
    """
    ks = max(topk)
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), ks)
    hit = pred == labels[:, None]
    return jnp.stack([jnp.sum(jnp.any(hit[:, :k], axis=1)) for k in topk])


def make_count_fn(mesh=None, topk=(1, 5)):
    """jit'd (logits[S,C], labels[S], valid[S]) -> [len(topk)+1] int32:
    per-k correct counts over the valid rows plus the valid count itself.

    This is the runner's live metrics path: the reduction over the (possibly
    data-sharded, possibly multi-host) sample axis compiles to the one psum
    the TPU design needs (SURVEY.md section 5); the replicated [3] result is
    addressable on every host.
    """
    ks = max(topk)

    def counts(logits, labels, valid):
        _, pred = jax.lax.top_k(logits.astype(jnp.float32), ks)
        hit = (pred == labels[:, None]) & valid[:, None]
        per_k = [jnp.sum(jnp.any(hit[:, :k], axis=1), dtype=jnp.int32)
                 for k in topk]
        return jnp.stack(per_k + [jnp.sum(valid, dtype=jnp.int32)])

    if mesh is None:
        return jax.jit(counts)
    repl = NamedSharding(mesh, P())
    data0 = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(counts, in_shardings=(None, data0, data0),
                   out_shardings=repl)
