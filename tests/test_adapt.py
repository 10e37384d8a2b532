"""Episodic TTL adaptation-step tests (tiny model, CPU).

Validates the semantics the reference implements with in-place mutation
(ttl.py:300-363): episodic determinism, reset-by-rebinding, entropy descent,
vmap independence, and AdamW config parity with torch.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ttl_tpu.adapt.ttl import (make_batched_ttl_fn, make_optimizer,
                               make_tpt_adapt_fn, make_ttl_adapt_fn)
from ttl_tpu.config import TTLConfig
from ttl_tpu.models import clip as jclip
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import (build_text_classifier,
                                    init_prompt_learner, prompt_tokens)
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters

CFG = TTLConfig(batch_size=8, layer_range=(2, 3), rank=4,
                compute_dtype="float32", test_sets="eurosat")
CLASSNAMES = ["forest", "river", "highway", "pasture", "residential"]


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    params = init_clip_params(key, TEST_TINY)
    toks = jnp.asarray(prompt_tokens(CLASSNAMES))
    text_cls = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    views = jax.random.normal(jax.random.PRNGKey(2),
                              (CFG.batch_size, 3, 64, 64))
    return params, text_cls, adapters0, views, toks


def test_adaptation_moves_logits(setup):
    params, text_cls, adapters0, views, _ = setup
    fn = make_ttl_adapt_fn(TEST_TINY, CFG, zero_shot_aux=True)
    res = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    assert res.logits.shape == (len(CLASSNAMES),)
    assert not np.allclose(np.asarray(res.logits),
                           np.asarray(res.zero_shot_logits))
    assert np.isfinite(np.asarray(res.losses)).all()
    # hot-loop default: the aux pass is off and its slot is zeros
    res0 = make_ttl_adapt_fn(TEST_TINY, CFG)(
        params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(res0.zero_shot_logits), 0.0)
    np.testing.assert_allclose(np.asarray(res0.logits),
                               np.asarray(res.logits), rtol=2e-5, atol=1e-5)


def test_episodic_determinism(setup):
    """Same sample twice -> bit-identical result: the functional equivalent of
    LoRA_reset + optimizer.load_state_dict (ttl.py:338-344)."""
    params, text_cls, adapters0, views, _ = setup
    fn = jax.jit(make_ttl_adapt_fn(TEST_TINY, CFG))
    r1 = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    r2 = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(r1.logits), np.asarray(r2.logits))


def test_adaptation_reduces_view_entropy(setup):
    """Confidence maximization: the mean per-view entropy under the adapted
    LoRA must drop below the zero-shot entropy. (Note the DeYO *loss value*
    itself is not monotone under its own detached-coeff dynamics - coeff
    grows as entropy shrinks when ent > 1 - so descent is asserted on the
    unweighted entropy, which is what TTL actually minimizes.)

    Also checks the tta_steps**2 effective-step quirk (ttl.py:78-81)."""
    from ttl_tpu.ops.entropy import softmax_entropy
    from ttl_tpu.ops.lora import lora_scale

    params, text_cls, adapters0, views, _ = setup
    cfg2 = CFG.replace(tta_steps=2, lr=1e-3)
    fn = make_ttl_adapt_fn(TEST_TINY, cfg2)
    res = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    assert np.asarray(res.losses).shape == (4,)  # 2**2 effective steps

    def mean_view_entropy(adapters):
        vf = jclip.vision_features(
            params["vision"], views, TEST_TINY.vision, adapters=adapters,
            adapter_window=CFG.layer_range,
            lora_scale=lora_scale(CFG.rank, CFG.lora_alpha),
            compute_dtype=jnp.float32)
        logits = jnp.exp(params["logit_scale"]) * \
            jclip.l2_normalize(vf) @ text_cls.T
        return float(jnp.mean(softmax_entropy(logits)))

    assert mean_view_entropy(res.adapters) < mean_view_entropy(adapters0)


def test_vmap_matches_independent_runs(setup):
    params, text_cls, adapters0, views, _ = setup
    single = jax.jit(make_ttl_adapt_fn(TEST_TINY, CFG))
    batched = make_batched_ttl_fn(TEST_TINY, CFG)

    views2 = jnp.stack([views, views[::-1]])
    keys = jax.random.split(jax.random.PRNGKey(9), 2)
    rb = batched(params, text_cls, adapters0, views2, keys)
    for i, v in enumerate([views, views[::-1]]):
        ri = single(params, text_cls, adapters0, v, keys[i])
        np.testing.assert_allclose(np.asarray(rb.logits[i]),
                                   np.asarray(ri.logits), rtol=2e-5, atol=1e-5)


def test_tpt_objective_path(setup):
    """deyo_selection=False: TPT selection + avg-entropy loss on LoRA."""
    params, text_cls, adapters0, views, _ = setup
    fn = make_ttl_adapt_fn(TEST_TINY, CFG.replace(deyo_selection=False))
    res = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(res.logits)).all()


def test_plpd_paths_compile(setup):
    params, text_cls, adapters0, views, _ = setup
    for aug in ("patch", "pixel", "occ"):
        cfgp = CFG.replace(filter_plpd=1, aug_type=aug, patch_len=4,
                           occlusion_size=16, row_start=8, column_start=8)
        fn = make_ttl_adapt_fn(TEST_TINY, cfgp)
        res = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
        assert np.isfinite(np.asarray(res.logits)).all(), aug


def test_text_encoder_lora_path(setup):
    params, text_cls, adapters0, views, toks = setup
    cfg_t = CFG.replace(lora_encoder="text")
    a0 = init_adapters(jax.random.PRNGKey(1), 2, TEST_TINY.text.hidden,
                       CFG.rank, "xavier")
    fn = make_ttl_adapt_fn(TEST_TINY, cfg_t, zero_shot_aux=True)
    res = fn(params, text_cls, a0, views, jax.random.PRNGKey(3), tokens=toks)
    assert np.isfinite(np.asarray(res.logits)).all()
    assert not np.allclose(np.asarray(res.logits),
                           np.asarray(res.zero_shot_logits))


def test_tpt_prompt_path(setup):
    params, _, _, views, _ = setup
    pl = init_prompt_learner(params["text"]["token_embed"], CLASSNAMES)
    fn = jax.jit(make_tpt_adapt_fn(TEST_TINY, CFG.replace(
        lora_encoder="prompt", compute_dtype="float32")))
    res, ctx = fn(params, pl, views, jax.random.PRNGKey(3))
    assert res.logits.shape == (len(CLASSNAMES),)
    assert not np.allclose(np.asarray(ctx), np.asarray(pl.ctx_init))
    # episodic reset: second sample starts from ctx_init again
    res2, _ = fn(params, pl, views, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(res.logits),
                                  np.asarray(res2.logits))


def test_adamw_matches_torch():
    """make_optimizer == torch.optim.AdamW(lr, defaults) over several steps."""
    cfg = TTLConfig(lr=5e-3)
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(3)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=cfg.lr)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g)
        topt.step()

    import optax
    opt = make_optimizer(cfg)
    jp = jnp.asarray(p0)
    state = opt.init(jp)
    for g in grads:
        upd, state = opt.update(jnp.asarray(g), state, jp)
        jp = optax.apply_updates(jp, upd)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_all_views_filtered_skips_optimizer_step(setup):
    """deyo.py:110-113,184: when every view is dropped (here via an
    impossible PLPD threshold) the optimizer step is skipped entirely -
    adapters stay at init, so adapted logits equal zero-shot logits."""
    params, text_cls, adapters0, views, _ = setup
    cfgp = CFG.replace(filter_plpd=1, plpd_threshold=2.0, patch_len=4)
    fn = make_ttl_adapt_fn(TEST_TINY, cfgp, zero_shot_aux=True)
    res = fn(params, text_cls, adapters0, views, jax.random.PRNGKey(3))
    for a, b in zip(jax.tree.leaves(res.adapters),
                    jax.tree.leaves(adapters0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(res.logits),
                               np.asarray(res.zero_shot_logits),
                               rtol=1e-5, atol=1e-6)


def test_fused_qkv_layout_matches_unfused(setup):
    from ttl_tpu.models.clip import fuse_qkv_params, vision_features

    params, _, _, views, _ = setup
    fused = fuse_qkv_params(params["vision"])
    a = vision_features(params["vision"], views[:2], TEST_TINY.vision,
                        compute_dtype=jnp.float32)
    b = vision_features(fused, views[:2], TEST_TINY.vision,
                        compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
