"""EOT truncation of the text context (models/prompts.needed_ctx_len).

CLIP pads every prompt to 77 tokens; the text tower is causal and pools at
the EOT position, so positions after the longest EOT are dead compute.
These tests pin the EXACTNESS claim: every feature/logit the product
computes is identical with and without the truncation, across the
classifier build and all three prompt-consuming adaptation modes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import (build_text_classifier, init_prompt_learner,
                                    needed_ctx_len, prompt_tokens)
from ttl_tpu.models.zoo import TEST_TINY

CLASSNAMES = ["goldfish", "great white shark", "hammerhead", "electric ray"]

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                sample_batch=2, layer_range=(1, 2), rank=4,
                compute_dtype="float32", param_dtype="float32")


def _batch(n=2):
    rng = np.random.RandomState(0)
    return ((rng.rand(n, 96, 96, 3) * 255).astype(np.uint8),
            np.full((n,), 80, np.int32), np.full((n,), 96, np.int32),
            np.arange(n, dtype=np.int32))


def test_needed_ctx_len():
    toks = prompt_tokens(CLASSNAMES)
    L = needed_ctx_len(toks)
    eot_max = int(np.asarray(toks).argmax(-1).max())
    assert L >= eot_max + 1, (L, eot_max)
    assert L % 8 == 0 and L < 77
    # already-short tables are returned unchanged at the cap
    assert needed_ctx_len(np.asarray(toks)[:, :16]) <= 16


def test_classifier_truncation_exact():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens(CLASSNAMES))
    full = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                 compute_dtype=jnp.float32, truncate=False)
    trunc = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                  compute_dtype=jnp.float32, truncate=True)
    np.testing.assert_allclose(np.asarray(trunc), np.asarray(full),
                               rtol=0, atol=1e-6)


def test_text_lora_mode_truncation_exact():
    from ttl_tpu.adapt.ttl import make_fused_ttl_fn
    from ttl_tpu.ops.lora import init_adapters

    cfg = CFG.replace(lora_encoder="text")
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = prompt_tokens(CLASSNAMES)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.text.hidden, cfg.rank, "xavier")
    text_cls = build_text_classifier(params["text"], jnp.asarray(toks),
                                     TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    canv, hs, ws, idxs = _batch()
    res_f = make_fused_ttl_fn(TEST_TINY, cfg, tokens=jnp.asarray(toks))(
        params, text_cls, adapters0, canv, hs, ws, idxs)
    toks_t = jnp.asarray(toks[:, : needed_ctx_len(toks)])
    res_t = make_fused_ttl_fn(TEST_TINY, cfg, tokens=toks_t)(
        params, text_cls, adapters0, canv, hs, ws, idxs)
    np.testing.assert_allclose(np.asarray(res_t.logits),
                               np.asarray(res_f.logits), rtol=0, atol=1e-4)


def test_tpt_mode_truncation_exact():
    from ttl_tpu.adapt.ttl import make_fused_tpt_fn

    cfg = CFG.replace(lora_encoder="prompt")
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    canv, hs, ws, idxs = _batch()
    fn = make_fused_tpt_fn(TEST_TINY, cfg)
    emb = params["text"]["token_embed"].astype(jnp.float32)
    res_f, ctx_f = fn(params, init_prompt_learner(emb, CLASSNAMES,
                                                  truncate=False),
                      canv, hs, ws, idxs)
    res_t, ctx_t = fn(params, init_prompt_learner(emb, CLASSNAMES,
                                                  truncate=True),
                      canv, hs, ws, idxs)
    np.testing.assert_allclose(np.asarray(res_t.logits),
                               np.asarray(res_f.logits), rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ctx_t), np.asarray(ctx_f),
                               rtol=0, atol=1e-5)


@pytest.mark.slow
def test_tpt_position_truncation_exact():
    from ttl_tpu.adapt.ttl import make_fused_tpt_fn

    cfg = CFG.replace(lora_encoder="prompt")
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    canv, hs, ws, idxs = _batch()
    fn = make_fused_tpt_fn(TEST_TINY, cfg)
    emb = params["text"]["token_embed"].astype(jnp.float32)
    for position in ("middle", "front"):
        out = []
        for truncate in (False, True):
            res, _ = fn(params, init_prompt_learner(
                emb, CLASSNAMES, ctx_position=position, truncate=truncate),
                canv, hs, ws, idxs)
            out.append(np.asarray(res.logits))
        np.testing.assert_allclose(out[1], out[0], rtol=0, atol=1e-4,
                                   err_msg=position)


def test_text_mode_builder_truncates_internally():
    """predict/serve pass full-77 tables; the step builders must truncate
    (adapt/ttl._truncate_tokens) so every surface gets the short programs."""
    from ttl_tpu.adapt.ttl import _truncate_tokens
    toks = prompt_tokens(CLASSNAMES)
    t = _truncate_tokens(jnp.asarray(toks))
    assert t.shape[1] == needed_ctx_len(toks) < 77
    assert _truncate_tokens(None) is None


@pytest.mark.slow
def test_cocoop_truncation_exact():
    from ttl_tpu.adapt.cocoop import init_cocoop
    from ttl_tpu.adapt.ttl import make_fused_cocoop_fn

    cfg = CFG.replace(cocoop=True)
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    canv, hs, ws, idxs = _batch()
    fn = make_fused_cocoop_fn(TEST_TINY, cfg)
    emb = params["text"]["token_embed"].astype(jnp.float32)
    outs = []
    for truncate in (False, True):
        st = init_cocoop(emb, CLASSNAMES, TEST_TINY.vision.proj_dim,
                         jax.random.PRNGKey(3), truncate=truncate)
        res = fn(params, st, canv, hs, ws, idxs)
        outs.append((np.asarray(res.logits), np.asarray(res.adapted_logits)))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=0, atol=1e-4)
    np.testing.assert_allclose(outs[1][1], outs[0][1], rtol=0, atol=1e-4)
