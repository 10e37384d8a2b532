"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttl_tpu.adapt.ttl import make_batched_ttl_fn
from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.parallel.eval import make_sharded_ttl_fn, sharded_topk_correct
from ttl_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                   shard_params)

CFG = TTLConfig(batch_size=8, layer_range=(2, 3), rank=4,
                compute_dtype="float32", param_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens([f"class {i}" for i in range(5)]))
    text_cls = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    S = 8
    views = jax.random.normal(jax.random.PRNGKey(2), (S, 8, 3, 64, 64))
    keys = jax.random.split(jax.random.PRNGKey(3), S)
    return params, text_cls, adapters0, views, keys


def test_data_parallel_matches_single_device(setup):
    params, text_cls, adapters0, views, keys = setup
    ref = make_batched_ttl_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, views, keys)

    mesh = make_mesh((8,))
    fn = make_sharded_ttl_fn(TEST_TINY, CFG, mesh)
    res = fn(shard_params(params, mesh), *replicate((text_cls, adapters0),
                                                    mesh),
             shard_batch(views, mesh), shard_batch(keys, mesh))
    np.testing.assert_allclose(np.asarray(res.logits),
                               np.asarray(ref.logits), rtol=2e-4, atol=2e-4)


def test_tensor_parallel_matches_single_device(setup):
    params, text_cls, adapters0, views, keys = setup
    ref = make_batched_ttl_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, views, keys)

    mesh = make_mesh((4, 2))
    fn = make_sharded_ttl_fn(TEST_TINY, CFG, mesh, n_classes=5)
    res = fn(shard_params(params, mesh), *replicate((text_cls, adapters0),
                                                    mesh),
             shard_batch(views, mesh), shard_batch(keys, mesh))
    np.testing.assert_allclose(np.asarray(res.logits),
                               np.asarray(ref.logits), rtol=2e-3, atol=2e-3)


def test_sharded_topk_correct(setup):
    mesh = make_mesh((8,))
    logits = jax.random.normal(jax.random.PRNGKey(0), (8, 10))
    labels = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    out = jax.jit(sharded_topk_correct, static_argnames="topk")(
        shard_batch(logits, mesh), shard_batch(labels, mesh), topk=(1, 5))
    assert int(out[0]) == 8 and int(out[1]) == 8
    wrong = (labels + 1) % 10
    out2 = jax.jit(sharded_topk_correct, static_argnames="topk")(
        shard_batch(logits, mesh), shard_batch(wrong, mesh), topk=(1, 5))
    assert int(out2[0]) == 0


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_resnet_params_shard_replicated_on_model_axis():
    """RN-family towers have no stacked transformer layers; param_spec must
    replicate them (no 3D specs on 2D attnpool arrays)."""
    from ttl_tpu.models.resnet import ResNetVisionConfig, init_resnet_params

    cfg_t = ResNetVisionConfig(layers=(1, 1, 1, 1), width=16, heads=4,
                               proj_dim=16, image_size=64)
    p = {"vision": init_resnet_params(jax.random.PRNGKey(0), cfg_t)}
    mesh = make_mesh((4, 2))
    placed = shard_params(p, mesh)  # must not raise
    leaves = jax.tree.leaves(placed)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves[:3])


def test_tensor_parallel_even_class_count(setup):
    """Regression: even class counts enable the class-axis text shard; a
    replicated-input classifier must be accepted (constraint applied
    inside the jit, not via in_shardings)."""
    params, _, adapters0, views, keys = setup
    toks6 = jnp.asarray(prompt_tokens([f"class {i}" for i in range(6)]))
    text_cls6 = build_text_classifier(params["text"], toks6, TEST_TINY.text,
                                      compute_dtype=jnp.float32)
    ref = make_batched_ttl_fn(TEST_TINY, CFG)(
        params, text_cls6, adapters0, views, keys)

    mesh = make_mesh((4, 2))
    fn = make_sharded_ttl_fn(TEST_TINY, CFG, mesh, n_classes=6)
    res = fn(shard_params(params, mesh),
             *replicate((text_cls6, adapters0), mesh),
             shard_batch(views, mesh), shard_batch(keys, mesh))
    np.testing.assert_allclose(np.asarray(res.logits),
                               np.asarray(ref.logits), rtol=2e-3, atol=2e-3)
