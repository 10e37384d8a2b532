"""Fused single-program step tests: view-gen + adaptation in one jit.

The runner dispatches one fused program per batch (adapt/ttl.py
make_fused_*); these tests pin (a) exact equality with the round-1
two-dispatch composition, (b) mesh-sharded == single-device for every mode
(LoRA, TPT-prompt, CoCoOp, zero-shot), and (c) the device-side metric
reduction against a host computation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttl_tpu.adapt.ttl import (make_batched_ttl_fn, make_fused_cocoop_fn,
                               make_fused_tpt_fn, make_fused_ttl_fn,
                               make_fused_zeroshot_fn, sample_key)
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import (build_text_classifier,
                                    init_prompt_learner, prompt_tokens)
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.image import make_batched_view_fn
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.parallel.mesh import make_mesh, replicate, shard_batch, \
    shard_params

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                layer_range=(2, 3), rank=4, compute_dtype="float32",
                param_dtype="float32", sample_batch=8)
S = 8
CLASSNAMES = [f"class {i}" for i in range(5)]


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens(CLASSNAMES))
    text_cls = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    rng = np.random.RandomState(0)
    canv = (rng.rand(S, 96, 96, 3) * 255).astype(np.uint8)
    hs = np.asarray([96, 80, 96, 64, 96, 72, 96, 96], np.int32)
    ws = np.asarray([96, 96, 64, 96, 88, 96, 56, 96], np.int32)
    idxs = np.arange(S, dtype=np.int32) * 3 + 1
    return params, text_cls, adapters0, canv, hs, ws, idxs


def test_fused_matches_two_dispatch(setup):
    """The fused program must be bit-compatible with the round-1 composition
    (device views -> batched TTL step) given the same per-sample keys."""
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    keys = jax.vmap(lambda i: sample_key(CFG.seed, i))(jnp.asarray(idxs))
    view_fn = make_batched_view_fn(CFG.batch_size, CFG.resolution,
                                   out_dtype=jnp.float32)
    views = view_fn(jnp.asarray(canv), jnp.asarray(hs), jnp.asarray(ws),
                    keys)
    ref = make_batched_ttl_fn(TEST_TINY, CFG, zero_shot_aux=True)(
        params, text_cls, adapters0, views, keys)

    fused = make_fused_ttl_fn(TEST_TINY, CFG, zero_shot_aux=True)(
        params, text_cls, adapters0, canv, hs, ws, idxs)
    np.testing.assert_allclose(np.asarray(fused.logits),
                               np.asarray(ref.logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.zero_shot_logits),
                               np.asarray(ref.zero_shot_logits),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_fused_sharded_matches_single(setup):
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    single = make_fused_ttl_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, canv, hs, ws, idxs)

    mesh = make_mesh((8,))
    fn = make_fused_ttl_fn(TEST_TINY, CFG, mesh=mesh,
                           n_classes=len(CLASSNAMES))
    sh = fn(shard_params(params, mesh),
            *replicate((text_cls, adapters0), mesh),
            *shard_batch((canv, hs, ws, idxs), mesh))
    np.testing.assert_allclose(np.asarray(sh.logits),
                               np.asarray(single.logits),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_tpt_sharded_matches_single(setup):
    """TPT-prompt mode shards over the data axis exactly like the LoRA path
    (the per-sample programs are independent)."""
    params, _, _, canv, hs, ws, idxs = setup
    cfg = CFG.replace(lora_encoder="prompt")
    pl_state = init_prompt_learner(
        params["text"]["token_embed"].astype(jnp.float32), CLASSNAMES)
    res, ctx = make_fused_tpt_fn(TEST_TINY, cfg)(
        params, pl_state, canv, hs, ws, idxs)
    assert res.logits.shape == (S, len(CLASSNAMES))
    assert np.isfinite(np.asarray(res.logits)).all()

    mesh = make_mesh((8,))
    fn = make_fused_tpt_fn(TEST_TINY, cfg, mesh=mesh)
    res_sh, ctx_sh = fn(shard_params(params, mesh),
                        replicate(pl_state, mesh),
                        *shard_batch((canv, hs, ws, idxs), mesh))
    np.testing.assert_allclose(np.asarray(res_sh.logits),
                               np.asarray(res.logits), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ctx_sh), np.asarray(ctx),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_cocoop_sharded_matches_single(setup):
    from ttl_tpu.adapt.cocoop import init_cocoop
    params, _, _, canv, hs, ws, idxs = setup
    cfg = CFG.replace(cocoop=True)
    co_state = init_cocoop(params["text"]["token_embed"].astype(jnp.float32),
                           CLASSNAMES, TEST_TINY.vision.proj_dim,
                           jax.random.PRNGKey(1))
    res = make_fused_cocoop_fn(TEST_TINY, cfg)(
        params, co_state, canv, hs, ws, idxs)
    assert res.logits.shape == (S, len(CLASSNAMES))

    mesh = make_mesh((8,))
    fn = make_fused_cocoop_fn(TEST_TINY, cfg, mesh=mesh)
    res_sh = fn(shard_params(params, mesh), replicate(co_state, mesh),
                *shard_batch((canv, hs, ws, idxs), mesh))
    np.testing.assert_allclose(np.asarray(res_sh.logits),
                               np.asarray(res.logits), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_zeroshot_sharded_matches_single(setup):
    params, text_cls, _, canv, hs, ws, idxs = setup
    cfg = CFG.replace(tta_steps=0)
    logits = make_fused_zeroshot_fn(TEST_TINY, cfg)(
        params, text_cls, canv, hs, ws, idxs)
    assert logits.shape == (S, len(CLASSNAMES))

    mesh = make_mesh((8,))
    fn = make_fused_zeroshot_fn(TEST_TINY, cfg, mesh=mesh)
    sh = fn(shard_params(params, mesh), replicate(text_cls, mesh),
            *shard_batch((canv, hs, ws, idxs), mesh))
    np.testing.assert_allclose(np.asarray(sh), np.asarray(logits),
                               rtol=2e-4, atol=2e-4)


def test_count_fn_matches_host(setup):
    """Device-side metric counts == host top-1/top-5 over the valid rows."""
    from ttl_tpu.parallel.eval import make_count_fn
    rng = np.random.RandomState(3)
    logits = rng.randn(8, 10).astype(np.float32)
    labels = rng.randint(0, 10, size=8).astype(np.int32)
    valid = np.asarray([True] * 6 + [False] * 2)

    out = np.asarray(make_count_fn()(logits, labels, valid))
    top5 = np.argsort(-logits, axis=1)[:, :5]
    c1 = sum(int(np.argmax(logits[i]) == labels[i]) for i in range(6))
    c5 = sum(int(labels[i] in top5[i]) for i in range(6))
    assert out.tolist() == [c1, c5, 6]

    mesh = make_mesh((8,))
    out_sh = np.asarray(make_count_fn(mesh)(
        shard_batch(jnp.asarray(logits), mesh), labels, valid))
    assert out_sh.tolist() == [c1, c5, 6]


def test_lora_compute_mixed_close_to_f32(setup, monkeypatch):
    """The 'mixed' LoRA GEMM precision (the default: bf16 inputs, f32
    accumulation) must track the round-1 f32-upcast path closely - it feeds
    the same bf16 activations in. The f32 leg pins TTL_LORA_COMPUTE=f32
    explicitly (the default IS mixed, so an env-less run would alias)."""
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    cfg = CFG.replace(compute_dtype="bfloat16")
    monkeypatch.setenv("TTL_LORA_COMPUTE", "f32")
    ref = make_fused_ttl_fn(TEST_TINY, cfg)(
        params, text_cls, adapters0, canv, hs, ws, idxs)
    monkeypatch.setenv("TTL_LORA_COMPUTE", "mixed")
    mixed = make_fused_ttl_fn(TEST_TINY, cfg)(
        params, text_cls, adapters0, canv, hs, ws, idxs)
    np.testing.assert_allclose(np.asarray(mixed.logits),
                               np.asarray(ref.logits), rtol=0.05, atol=0.05)


def test_fused_sharded_bshd_kernel_matches_single(setup, monkeypatch):
    """Data-only meshes route the bshd Pallas kernel through jax.shard_map
    (adapt.ttl._jit_fused): each device runs the measured single-chip
    program verbatim, which is what lets pallas_call — no GSPMD
    partitioning rule — stay on the multi-chip hot path. Forward AND the
    adaptation backward run in-kernel here (interpret mode on CPU); the
    sharded logits must match the single-device einsum run."""
    from ttl_tpu.ops import attention as fa
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    single = make_fused_ttl_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, canv, hs, ws, idxs)

    monkeypatch.setenv("TTL_FUSED_ATTENTION", "bshd")
    fa.fused_mode.cache_clear()
    try:
        mesh = make_mesh((8,))
        assert fa.mesh_kernel_mode(True) == "bshd"
        fn = make_fused_ttl_fn(TEST_TINY, CFG, mesh=mesh,
                               n_classes=len(CLASSNAMES))
        sh = fn(*replicate((params, text_cls, adapters0), mesh),
                *shard_batch((canv, hs, ws, idxs), mesh))
        assert "data" in str(sh.logits.sharding.spec)
        np.testing.assert_allclose(np.asarray(sh.logits),
                                   np.asarray(single.logits),
                                   rtol=2e-4, atol=2e-4)
    finally:
        fa.fused_mode.cache_clear()


def test_fused_model_axis_mesh_pins_einsum_under_forced_kernel(setup,
                                                               monkeypatch):
    """A forced TTL_FUSED_ATTENTION=bshd must never reach a model-axis
    GSPMD program as a pallas_call (unpartitionable — XLA would gather);
    _jit_fused pins the einsum route for that trace and results match."""
    from ttl_tpu.ops import attention as fa
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    single = make_fused_ttl_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, canv, hs, ws, idxs)

    monkeypatch.setenv("TTL_FUSED_ATTENTION", "bshd")
    fa.fused_mode.cache_clear()
    try:
        assert fa.mesh_kernel_mode(False) == ""
        mesh = make_mesh((4, 2))
        fn = make_fused_ttl_fn(TEST_TINY, CFG, mesh=mesh,
                               n_classes=len(CLASSNAMES))
        sh = fn(shard_params(params, mesh),
                *replicate((text_cls, adapters0), mesh),
                *shard_batch((canv, hs, ws, idxs), mesh))
        np.testing.assert_allclose(np.asarray(sh.logits),
                                   np.asarray(single.logits),
                                   rtol=2e-4, atol=2e-4)
    finally:
        fa.fused_mode.cache_clear()


@pytest.mark.slow
def test_fused_all_families_shard_map_kernel(setup, monkeypatch):
    """Every fused family (TPT tuple output, CoCoOp, bare-logits zero-shot,
    text-LoRA with its causal-gated tower) runs through the shard_map
    kernel route on a data-only mesh and matches its single-device einsum
    run — the out_specs data-prefix must cover each family's output
    pytree."""
    from ttl_tpu.adapt.cocoop import init_cocoop
    from ttl_tpu.models.zoo import TEST_TINY as TT
    from ttl_tpu.ops import attention as fa
    from ttl_tpu.models.prompts import prompt_tokens
    params, text_cls, adapters0, canv, hs, ws, idxs = setup
    toks = jnp.asarray(prompt_tokens(CLASSNAMES))
    emb = params["text"]["token_embed"].astype(jnp.float32)
    pl_state = init_prompt_learner(emb, CLASSNAMES)
    co_state = init_cocoop(emb, CLASSNAMES, TT.vision.proj_dim,
                           jax.random.PRNGKey(1))
    txt_a0 = init_adapters(jax.random.PRNGKey(3), 2, TT.text.hidden,
                           CFG.rank, "xavier")

    with fa.force_mode(""):
        tpt_ref, ctx_ref = make_fused_tpt_fn(
            TT, CFG.replace(lora_encoder="prompt"))(
            params, pl_state, canv, hs, ws, idxs)
        co_ref = make_fused_cocoop_fn(TT, CFG.replace(cocoop=True))(
            params, co_state, canv, hs, ws, idxs)
        zs_ref = make_fused_zeroshot_fn(TT, CFG.replace(tta_steps=0))(
            params, text_cls, canv, hs, ws, idxs)
        txt_ref = make_fused_ttl_fn(
            TT, CFG.replace(lora_encoder="text"), tokens=toks)(
            params, text_cls, txt_a0, canv, hs, ws, idxs)

    monkeypatch.setenv("TTL_FUSED_ATTENTION", "bshd")
    fa.fused_mode.cache_clear()
    try:
        mesh = make_mesh((8,))
        sb = shard_batch((canv, hs, ws, idxs), mesh)
        tpt_sh, ctx_sh = make_fused_tpt_fn(
            TT, CFG.replace(lora_encoder="prompt"), mesh=mesh)(
            *replicate((params, pl_state), mesh), *sb)
        co_sh = make_fused_cocoop_fn(TT, CFG.replace(cocoop=True),
                                     mesh=mesh)(
            *replicate((params, co_state), mesh), *sb)
        zs_sh = make_fused_zeroshot_fn(TT, CFG.replace(tta_steps=0),
                                       mesh=mesh)(
            *replicate((params, text_cls), mesh), *sb)
        txt_sh = make_fused_ttl_fn(
            TT, CFG.replace(lora_encoder="text"), tokens=toks, mesh=mesh,
            n_classes=len(CLASSNAMES))(
            *replicate((params, text_cls, txt_a0), mesh), *sb)
        for got, ref, name in [(tpt_sh.logits, tpt_ref.logits, "tpt"),
                               (ctx_sh, ctx_ref, "tpt_ctx"),
                               (co_sh.logits, co_ref.logits, "cocoop"),
                               (zs_sh, zs_ref, "zeroshot"),
                               (txt_sh.logits, txt_ref.logits, "text")]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4, err_msg=name)
    finally:
        fa.fused_mode.cache_clear()
