"""Boundary configurations of the fused TTL step.

The reference hard-codes its paper config (64 views, 200-1000 classes,
window 9-11, rank 16); these lock the compiled program's behavior at the
edges of the config space a user can reach from the CLI: a single view
(batch_size=1 - selection k floors at 1, PLPD shuffles a 1-view batch), a
single class, the full-tower adapter window, and rank 1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttl_tpu.adapt.ttl import make_fused_ttl_fn
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters

pytestmark = pytest.mark.slow  # compiles many edge-config programs

BASE = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                 sample_batch=2, layer_range=(1, 2), rank=4,
                 compute_dtype="float32", param_dtype="float32")


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    rng = np.random.RandomState(0)
    canv = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    return params, canv, np.full((2,), 80, np.int32), \
        np.full((2,), 96, np.int32), np.arange(2, dtype=np.int32)


@pytest.mark.parametrize("name,cfg,n_cls", [
    ("single_view", BASE.replace(batch_size=1), 3),
    ("single_class", BASE, 1),
    ("full_window", BASE.replace(layer_range=(0, 3)), 3),
    ("rank_1", BASE.replace(rank=1), 3),
])
def test_edge_config_runs(setup, name, cfg, n_cls):
    params, canv, hs, ws, idxs = setup
    toks = jnp.asarray(prompt_tokens([f"class {i}" for i in range(n_cls)]))
    tc = build_text_classifier(params["text"], toks, TEST_TINY.text,
                               compute_dtype=jnp.float32)
    a0 = init_adapters(jax.random.PRNGKey(1),
                       cfg.layer_range[1] - cfg.layer_range[0] + 1,
                       TEST_TINY.vision.hidden, cfg.rank, cfg.init_method)
    res = make_fused_ttl_fn(TEST_TINY, cfg)(params, tc, a0, canv, hs, ws,
                                            idxs)
    logits = np.asarray(res.logits)
    assert logits.shape == (2, n_cls)
    assert np.all(np.isfinite(logits))
    assert np.all(np.isfinite(np.asarray(res.losses)))


def _run_cfg(setup, cfg, n_cls=3):
    params, canv, hs, ws, idxs = setup
    toks = jnp.asarray(prompt_tokens([f"class {i}" for i in range(n_cls)]))
    tc = build_text_classifier(params["text"], toks, TEST_TINY.text,
                               compute_dtype=jnp.float32)
    a0 = init_adapters(jax.random.PRNGKey(1),
                       cfg.layer_range[1] - cfg.layer_range[0] + 1,
                       TEST_TINY.vision.hidden, cfg.rank, cfg.init_method)
    res = make_fused_ttl_fn(TEST_TINY, cfg)(params, tc, a0, canv, hs, ws,
                                            idxs)
    return a0, res


def test_filter_ent_empty_selection_skips_update(setup):
    """DeYO faithfulness edge (deyo.py:108-113): filter_ent=1 with
    int(batch*selection_p)==0 must leave the adapters untouched - the
    reference returns before the optimizer step, so not even AdamW weight
    decay runs."""
    a0, res = _run_cfg(setup, BASE.replace(filter_ent=1, selection_p=0.01))
    assert np.asarray(res.losses).max() == 0.0
    for s in range(2):
        per_sample = jax.tree.map(lambda a: np.asarray(a[s]), res.adapters)
        jax.tree.map(np.testing.assert_array_equal, per_sample,
                     jax.tree.map(np.asarray, a0))


def test_reweight_plpd_only_is_weight_decay_only(setup):
    """DeYO faithfulness edge (deyo.py:175-177): reweight_ent=0
    reweight_plpd=1 computes a zero loss (the plpd coeff term is commented
    out upstream) but still steps the optimizer - so the adapters move by
    exactly one AdamW decoupled weight-decay step: a *= (1 - lr*wd)."""
    from ttl_tpu.adapt.ttl import ADAMW_WEIGHT_DECAY
    cfg = BASE.replace(reweight_ent=0, reweight_plpd=1)
    a0, res = _run_cfg(setup, cfg)
    assert np.asarray(res.losses).max() == 0.0
    factor = 1.0 - cfg.lr * ADAMW_WEIGHT_DECAY
    for s in range(2):
        per_sample = jax.tree.map(lambda a: np.asarray(a[s]), res.adapters)
        expect = jax.tree.map(lambda a: np.asarray(a) * factor, a0)
        jax.tree.map(
            lambda got, want: np.testing.assert_allclose(got, want,
                                                         rtol=1e-6,
                                                         atol=1e-8),
            per_sample, expect)
