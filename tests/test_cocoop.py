"""CoCoOp variant tests (tiny model, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttl_tpu.adapt.cocoop import (CoCoOpState, init_cocoop,
                                  make_cocoop_adapt_fn, meta_shift)
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.utils.checkpoint import apply_cocoop_ckpt

CFG = TTLConfig(batch_size=8, compute_dtype="float32", cocoop=True,
                tta_steps=1)
CLASSNAMES = ["forest", "river", "highway"]


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    state = init_cocoop(params["text"]["token_embed"].astype(jnp.float32),
                        CLASSNAMES, TEST_TINY.vision.proj_dim,
                        jax.random.PRNGKey(1))
    views = jax.random.normal(jax.random.PRNGKey(2), (8, 3, 64, 64))
    return params, state, views


def test_meta_shift_shapes(setup):
    params, state, _ = setup
    feats = jax.random.normal(jax.random.PRNGKey(0),
                              (5, TEST_TINY.vision.proj_dim))
    shifted = meta_shift(state, feats)
    assert shifted.shape == (5, state.n_ctx, TEST_TINY.text.hidden)
    # different images produce different ctx
    assert not np.allclose(np.asarray(shifted[0]), np.asarray(shifted[1]))


def test_cocoop_adapt_and_infer(setup):
    params, state, views = setup
    fn = jax.jit(make_cocoop_adapt_fn(TEST_TINY, CFG))
    res = fn(params, state, views, jax.random.PRNGKey(3))
    assert res.logits.shape == (3,)
    assert res.adapted_logits.shape == (3,)
    assert np.isfinite(np.asarray(res.losses)).all()
    # reference-faithful logits ignore the adaptation (ttl.py:350-352 quirk)
    res2 = fn(params, state, views, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(res.logits),
                                  np.asarray(res2.logits))


def test_cocoop_ckpt_overlay(setup):
    _, state, _ = setup
    d = TEST_TINY.text.hidden
    pd = TEST_TINY.vision.proj_dim
    sd = {
        "prompt_generator.ctx": np.ones((state.n_ctx, d), np.float32),
        "prompt_generator.meta_net.linear1.weight":
            np.zeros((pd // 16, pd), np.float32),
        "prompt_generator.meta_net.linear1.bias":
            np.zeros((pd // 16,), np.float32),
        "prompt_generator.meta_net.linear2.weight":
            np.zeros((d, pd // 16), np.float32),
        "prompt_generator.meta_net.linear2.bias":
            np.zeros((d,), np.float32),
    }
    new = apply_cocoop_ckpt(state, sd)
    np.testing.assert_array_equal(np.asarray(new.ctx), 1.0)
    # zero meta-net -> shift equals base ctx for any image
    feats = np.random.RandomState(0).randn(2, pd).astype(np.float32)
    shifted = meta_shift(new, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(shifted[0]), np.asarray(new.ctx),
                               atol=1e-6)
