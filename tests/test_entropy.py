"""Golden-value tests for the entropy objectives vs. the reference math.

The reference formulas (ttl.py:41-67, deyo.py:85-181) are re-derived here
with torch (CPU) as an independent oracle, plus hand-computed values.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ttl_tpu.ops import entropy as E


def ref_softmax_entropy(x: torch.Tensor) -> torch.Tensor:
    return -(x.softmax(1) * x.log_softmax(1)).sum(1)


def ref_avg_entropy(outputs: torch.Tensor) -> torch.Tensor:
    logits = outputs - outputs.logsumexp(dim=-1, keepdim=True)
    avg_logits = logits.logsumexp(dim=0) - np.log(logits.shape[0])
    min_real = torch.finfo(avg_logits.dtype).min
    avg_logits = torch.clamp(avg_logits, min=min_real)
    return -(avg_logits * torch.exp(avg_logits)).sum(dim=-1)


@pytest.fixture
def logits64():
    rng = np.random.RandomState(0)
    return rng.randn(64, 1000).astype(np.float32) * 3.0


def test_softmax_entropy_matches_torch(logits64):
    ours = E.softmax_entropy(jnp.asarray(logits64))
    ref = ref_softmax_entropy(torch.from_numpy(logits64)).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_softmax_entropy_uniform_is_log_c():
    ent = E.softmax_entropy(jnp.zeros((3, 10)))
    np.testing.assert_allclose(np.asarray(ent), math.log(10.0), rtol=1e-6)


def test_softmax_entropy_onehot_is_zero():
    x = jnp.array([[100.0, 0.0, 0.0]])
    assert float(E.softmax_entropy(x)[0]) < 1e-3


def test_avg_entropy_matches_torch(logits64):
    ours = float(E.avg_entropy(jnp.asarray(logits64)))
    ref = float(ref_avg_entropy(torch.from_numpy(logits64)))
    assert abs(ours - ref) < 1e-4


def test_avg_entropy_masked_equals_subset(logits64):
    """Masked average over k rows == dense average of those rows."""
    mask = np.zeros(64, dtype=bool)
    mask[[3, 10, 17, 40, 41, 63]] = True
    ours = float(E.avg_entropy(jnp.asarray(logits64), jnp.asarray(mask)))
    ref = float(ref_avg_entropy(torch.from_numpy(logits64[mask])))
    assert abs(ours - ref) < 1e-4


def test_select_confident_matches_reference(logits64):
    t = torch.from_numpy(logits64)
    ent = ref_softmax_entropy(t)
    ref_idx = torch.argsort(ent, descending=False)[: int(64 * 0.1)].numpy()
    sel, idx, mask = E.select_confident(jnp.asarray(logits64), k=6)
    assert set(np.asarray(idx).tolist()) == set(ref_idx.tolist())
    assert int(mask.sum()) == 6
    assert np.asarray(mask)[np.asarray(idx)].all()


def test_data_uncertainty(logits64):
    ours = float(E.data_uncertainty(jnp.asarray(logits64)))
    ref = float(ref_softmax_entropy(torch.from_numpy(logits64)).mean())
    assert abs(ours - ref) < 1e-5


def test_deyo_loss_default_config_matches_reference(logits64):
    """Default TTL config: keep-all filter, entropy reweighting with
    margin_e0=0.4 (unscaled - ttl.py:80), loss = mean(ent * coeff)."""
    t = torch.from_numpy(logits64)
    ent = ref_softmax_entropy(t)
    keep = ent <= math.log(1000)
    kept = ent[keep]
    coeff = 1.0 / torch.exp(kept.detach() - 0.4)
    ref_loss = float((kept * coeff).mean())

    loss, aux = E.deyo_loss(jnp.asarray(logits64))
    assert abs(float(loss) - ref_loss) < 1e-4
    assert int(aux["n_backward"]) == int(keep.sum())


def test_deyo_loss_filter_ent_path(logits64):
    """filter_ent=1: top-p lowest-entropy views only (deyo.py:105)."""
    t = torch.from_numpy(logits64)
    ent = ref_softmax_entropy(t)
    idx = torch.argsort(ent)[: int(64 * 0.1)]
    kept = ent[idx]
    coeff = 1.0 / torch.exp(kept.detach() - 0.4)
    ref_loss = float((kept * coeff).mean())

    loss, aux = E.deyo_loss(jnp.asarray(logits64), filter_ent=True,
                            selection_p=0.1)
    assert abs(float(loss) - ref_loss) < 1e-4
    assert int(aux["n_backward"]) == 6


def test_deyo_loss_gradient_treats_coeff_as_constant(logits64):
    """coeff uses detached entropy (deyo.py:175): the gradient must equal
    d/dx mean(ent * const_coeff)."""
    x = jnp.asarray(logits64[:4, :10])

    g_ours = jax.grad(lambda z: E.deyo_loss(z)[0])(x)

    t = torch.from_numpy(np.asarray(x)).requires_grad_(True)
    ent = ref_softmax_entropy(t)
    coeff = 1.0 / torch.exp(ent.detach() - 0.4)
    (ent * coeff).mean().backward()
    np.testing.assert_allclose(np.asarray(g_ours), t.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_deyo_loss_reweight_plpd_term_is_dead(logits64):
    """The PLPD term of the coefficient is commented out in the reference
    (deyo.py:175-177): reweight_ent=0 reweight_plpd=1 must give coeff==0
    (zero loss AND zero gradient), and adding reweight_plpd on top of
    reweight_ent must change nothing."""
    x = jnp.asarray(logits64)
    plpd = jnp.asarray(np.random.RandomState(1).rand(64).astype(np.float32))
    loss, aux = E.deyo_loss(x, reweight_ent=0.0, reweight_plpd=1.0,
                            plpd=plpd)
    assert float(loss) == 0.0
    assert float(jnp.abs(aux["coeff"]).max()) == 0.0
    # the keep filter still passes every view: the reference reaches
    # scaler.step with zero grads (weight-decay-only update), it does NOT
    # take the backward==0 early exit
    assert int(aux["n_backward"]) == 64

    l_both, _ = E.deyo_loss(x, reweight_ent=1.0, reweight_plpd=1.0,
                            plpd=plpd)
    l_ent, _ = E.deyo_loss(x, reweight_ent=1.0, reweight_plpd=0.0)
    assert abs(float(l_both) - float(l_ent)) < 1e-6

    g = jax.grad(lambda z: E.deyo_loss(
        z, reweight_ent=0.0, reweight_plpd=1.0, plpd=plpd[:4])[0])(x[:4, :10])
    assert float(jnp.abs(g).max()) == 0.0


def test_deyo_loss_filter_ent_empty_selection(logits64):
    """filter_ent=1 with int(N*selection_p)==0 keeps NO views: the reference
    returns before the optimizer step (deyo.py:108-113), so loss==0 and
    n_backward==0 (the signal adapt/ttl.py uses to skip the update)."""
    loss, aux = E.deyo_loss(jnp.asarray(logits64), filter_ent=True,
                            selection_p=0.01)
    assert float(loss) == 0.0
    assert int(aux["n_backward"]) == 0
    assert not bool(np.asarray(aux["keep"]).any())


def test_tpt_loss_gradient_matches_torch(logits64):
    """TPT loss on the selected mask == avg_entropy of the subset, grads too."""
    x64 = logits64[:8, :10]
    _, _, mask = E.select_confident(jnp.asarray(x64), k=3)

    g_ours = jax.grad(lambda z: E.tpt_loss(z, mask))(jnp.asarray(x64))

    t = torch.from_numpy(x64).requires_grad_(True)
    sel = t[np.asarray(mask)]
    ref_avg_entropy(sel).backward()
    np.testing.assert_allclose(np.asarray(g_ours), t.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_quartile_selection_shape(logits64):
    idx = E.quartile_selection(jnp.asarray(logits64), quartile=7)
    assert idx.shape == (8,)
