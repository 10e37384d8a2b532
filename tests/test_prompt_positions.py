"""PromptLearner class-token positions (end/middle/front,
custom_clip.py:394-461)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ttl_tpu.models.prompts import init_prompt_learner

D = 8
CLASSES = ["cat", "golden retriever", "fire lily"]


@pytest.fixture(scope="module")
def tok_embed():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(49408, D).astype(np.float32))


@pytest.mark.parametrize("pos", ["end", "middle", "front"])
def test_assembly_matches_reference_layout(tok_embed, pos):
    pl = init_prompt_learner(tok_embed, CLASSES, "a_photo_of_a",
                             ctx_position=pos)
    out = np.asarray(pl.assemble())
    # prompts are EOT-truncated to a multiple of 8 (needed_ctx_len; the
    # exactness of the truncation is pinned by test_ctx_truncation.py)
    L = pl.tokenized.shape[1]
    assert L % 8 == 0 and L <= 77
    assert L > int(np.asarray(pl.tokenized).argmax(-1).max())
    assert out.shape == (len(CLASSES), L, D)

    emb = np.asarray(tok_embed[np.asarray(pl.tokenized)])
    ctx = np.asarray(pl.ctx)
    suffix = emb[:, 1 + pl.n_ctx:]
    half = pl.n_ctx // 2
    for ci, nl in enumerate(np.asarray(pl.name_lens)):
        if pos == "end":
            expect = np.concatenate([emb[ci, :1], ctx, suffix[ci]], 0)
        elif pos == "front":
            expect = np.concatenate([emb[ci, :1], suffix[ci, :nl], ctx,
                                     suffix[ci, nl:]], 0)
        else:
            expect = np.concatenate([emb[ci, :1], ctx[:half],
                                     suffix[ci, :nl], ctx[half:],
                                     suffix[ci, nl:]], 0)
        np.testing.assert_allclose(out[ci], expect, atol=1e-6)


def test_reset_restores_ctx(tok_embed):
    pl = init_prompt_learner(tok_embed, CLASSES)
    import dataclasses
    moved = dataclasses.replace(pl, ctx=pl.ctx + 1.0)
    np.testing.assert_array_equal(np.asarray(moved.reset().ctx),
                                  np.asarray(pl.ctx_init))


def test_learned_cls_branch(tok_embed):
    """learned_cls=True: random 1-token class vectors replace class names
    (custom_clip.py:301-310); reset restores both ctx and cls."""
    import jax

    pl = init_prompt_learner(tok_embed, CLASSES, learned_cls=True,
                             key=jax.random.PRNGKey(5))
    assert pl.cls.shape == (len(CLASSES), 1, D)
    out = pl.assemble()
    assert out.shape == (len(CLASSES), pl.tokenized.shape[1], D)
    # the cls vector sits right after the ctx block
    np.testing.assert_allclose(np.asarray(out[:, 1 + pl.n_ctx: 2 + pl.n_ctx]),
                               np.asarray(pl.cls), atol=1e-6)
    import dataclasses
    moved = dataclasses.replace(pl, cls=pl.cls + 1.0, ctx=pl.ctx + 1.0)
    back = moved.reset()
    np.testing.assert_array_equal(np.asarray(back.cls), np.asarray(pl.cls))
    np.testing.assert_array_equal(np.asarray(back.ctx), np.asarray(pl.ctx_init))
