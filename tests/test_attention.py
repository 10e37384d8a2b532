"""Fused (Pallas) attention vs einsum reference: forward + VJP parity.

On CPU the kernel runs in interpreter mode - same program, same numerics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttl_tpu.ops import attention as fa


@pytest.mark.parametrize("shape,causal", [
    ((2, 3, 197, 64), False),   # ViT-B/16 image sequence
    ((3, 2, 77, 32), True),     # text sequence, causal
    ((1, 1, 16, 64), False),    # already tile-aligned
])
def test_fused_forward_matches_reference(shape, causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    ref = fa.reference_attention(q, k, v, causal)
    out = fa.attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_bshd_layout_matches_reference(causal):
    """attention_bshd (head axis in place) == reference_attention (BHSD)."""
    b, h, s, d = 2, 3, 37, 32
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)

    def to_bshd(t):
        return t.transpose(0, 2, 1, 3)

    ref = fa.reference_attention(q, k, v, causal)
    out = fa.attention_bshd(to_bshd(q), to_bshd(k), to_bshd(v), causal)
    np.testing.assert_allclose(np.asarray(to_bshd(out)), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_vjp_matches_reference():
    shape = (2, 2, 37, 32)  # odd length exercises padding in the backward
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fa.attention(q, k, v, False)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(fa.reference_attention(q, k, v, False)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_fused_vjp_causal():
    shape = (1, 2, 21, 16)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    g1 = jax.grad(lambda q: jnp.sum(fa.attention(q, k, v, True) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(
        fa.reference_attention(q, k, v, True) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape,causal", [
    ((2, 3, 197, 64), False),   # ViT-B/16 image sequence
    ((3, 2, 77, 32), True),     # text sequence, causal
    ((1, 1, 16, 64), False),    # already tile-aligned
])
def test_heads_batched_forward_matches_reference(shape, causal):
    """attention_heads (grid over B, in-kernel batched head dots,
    TTL_FUSED_ATTENTION=heads) == einsum reference."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    ref = fa.reference_attention(q, k, v, causal)
    out = fa.attention_heads(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_heads_batched_vjp_matches_reference(causal):
    shape = (2, 2, 37, 32)  # odd length exercises padding in the backward
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)

    def loss(att):
        return lambda q, k, v: jnp.sum(jnp.sin(att(q, k, v, causal)))

    g1 = jax.grad(loss(fa.attention_heads), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(fa.reference_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


@pytest.mark.parametrize("shape,causal", [
    ((2, 4, 197, 64), False),   # ViT-B/16 image sequence geometry
    ((2, 4, 77, 32), True),     # text sequence, causal
    ((1, 3, 16, 64), False),    # already tile-aligned
])
def test_bshd_fused_forward_matches_reference(shape, causal):
    """attention_bshd_fused (layout-native [B,S,H*D] kernel, grid over B,
    in-kernel per-head lane slices, TTL_FUSED_ATTENTION=bshd) == einsum
    reference."""
    b, h, s, d = shape
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    ref = fa.reference_attention(q, k, v, causal)

    def flat(t):  # BHSD -> the towers' native [B, S, H*D]
        return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)

    out = fa.attention_bshd_fused(flat(q), flat(k), flat(v), h, causal)
    out = out.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_bshd_fused_vjp_matches_reference(causal):
    b, h, s, d = 2, 2, 37, 32  # odd length exercises padding in the backward
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h * d), jnp.float32) for kk in ks)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.sin(fa.attention_bshd_fused(q, k, v, h, causal)))

    def loss_ref(q, k, v):
        def split(t):
            return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        o = fa.reference_attention(split(q), split(k), split(v), causal)
        return jnp.sum(jnp.sin(o.transpose(0, 2, 1, 3).reshape(b, s, h * d)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bshd_fused_tower_routing(monkeypatch):
    """models.clip._attention with TTL_FUSED_ATTENTION=bshd takes the
    no-transpose path and matches the default einsum route at f32."""
    from ttl_tpu.models.clip import _attention

    key = jax.random.PRNGKey(8)
    q, k, v = (jax.random.normal(k_, (2, 50, 512), jnp.float32)
               for k_ in jax.random.split(key, 3))
    fa.fused_mode.cache_clear()
    monkeypatch.setenv("TTL_FUSED_ATTENTION", "")
    ref = _attention(q, k, v, heads=8, causal=False)
    fa.fused_mode.cache_clear()
    monkeypatch.setenv("TTL_FUSED_ATTENTION", "bshd")
    out = _attention(q, k, v, heads=8, causal=False)
    fa.fused_mode.cache_clear()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_mode_env_dispatch(monkeypatch):
    """TTL_FUSED_ATTENTION values -> kernel selection (lru_cache cleared).
    On the CPU test backend the auto default resolves to the einsum path."""
    for env, want in [("", ""), ("1", "per_head"), ("true", "per_head"),
                      ("per_head", "per_head"), ("heads", "heads"),
                      ("bshd", "bshd"), ("0", ""), ("off", ""), ("xla", ""),
                      ("einsum", "")]:
        fa.fused_mode.cache_clear()
        monkeypatch.setenv("TTL_FUSED_ATTENTION", env)
        assert fa.fused_mode() == want, env
        assert fa.use_fused() == bool(want), env
    fa.fused_mode.cache_clear()
    monkeypatch.delenv("TTL_FUSED_ATTENTION")


def test_mesh_kernel_mode_dispatch(monkeypatch):
    """The mesh-route chooser (adapt.ttl._jit_fused's decision): explicit
    bshd routes the shard_map kernel on any backend; the per_head/heads
    grids and explicit off degrade to the GSPMD einsum (never an
    unpartitionable pallas_call under pjit); model-axis meshes always
    einsum; the auto default is backend-gated (einsum on the CPU test
    backend)."""
    for env, want in [("bshd", "bshd"), ("per_head", ""), ("heads", ""),
                      ("off", ""), ("xla", ""), ("", ""), ("auto", "")]:
        monkeypatch.setenv("TTL_FUSED_ATTENTION", env)
        assert fa.mesh_kernel_mode(True) == want, env
        assert fa.mesh_kernel_mode(False) == "", env
    monkeypatch.delenv("TTL_FUSED_ATTENTION")


def test_force_mode_stack():
    """force_mode pins fused_mode for the enclosed trace and restores on
    exit, nesting included (shard_map body inside a GSPMD-pinned build)."""
    fa.fused_mode.cache_clear()
    base = fa.fused_mode()
    with fa.force_mode("bshd"):
        assert fa.fused_mode() == "bshd"
        with fa.force_mode(""):
            assert fa.fused_mode() == ""
        assert fa.fused_mode() == "bshd"
    assert fa.fused_mode() == base


def test_bshd_bwd_concat_fit_predicate():
    """The backward-form chooser classifies the shipped arches: ViT-B
    vision and all text towers take the faster all-heads-concat backward;
    ViT-L vision (measured 19.27 MB scoped VMEM for the concat form, over
    the 16 MB limit) takes per-head lane-slice writes."""
    assert fa.bshd_bwd_concat_fits(12, 197, 64)      # ViT-B/16 vision
    assert fa.bshd_bwd_concat_fits(12, 50, 64)       # ViT-B/32 vision
    assert fa.bshd_bwd_concat_fits(8, 77, 64)        # ViT-B text
    assert fa.bshd_bwd_concat_fits(12, 77, 64)       # ViT-L text
    assert not fa.bshd_bwd_concat_fits(16, 257, 64)  # ViT-L/14 vision


@pytest.mark.parametrize("group", [1, 2, 3, 4])
def test_bshd_bwd_all_groups_match_reference(group):
    """Every backward grouping (per-head lane-slice writes, grouped
    concats incl. a heads-indivisible group, all-heads concat) produces
    the same gradients as the einsum reference."""
    import functools as ft
    import math as m

    b, h, s, d = 2, 4, 37, 32
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q, k, v, do = (jax.random.normal(kk, (b, s, h * d), jnp.float32)
                   for kk in ks)
    kernel = ft.partial(fa._bshd_bwd_kernel, heads=h, seq_len=s,
                        scale=1.0 / m.sqrt(d), causal=False,
                        group=group)
    dq, dk, dv = fa._bshd_call(kernel, 3, q, k, v, extra=(do,))

    def split(t):
        return t.reshape(b, s, h, d).transpose(0, 2, 1, 3)

    def loss(q, k, v):
        o = fa.reference_attention(split(q), split(k), split(v), False)
        return jnp.sum(o.transpose(0, 2, 1, 3).reshape(b, s, h * d) * do)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip((dq, dk, dv), g, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_bshd_tower_level_padding_parity(monkeypatch):
    """Under the bshd route the vision tower pads the token axis ONCE per
    forward (models.clip._maybe_pad_tokens) and passes the true seq_len
    down to the kernel; text towers stay on the einsum (causal gate -
    measured slower on the kernel at text shapes). Features AND adaptation
    gradients must match the default route at f32 on a padding-triggering
    geometry (test-tiny vision: 17 tokens -> pads to 32)."""
    import jax.numpy as jnp

    from ttl_tpu.models import clip as jclip
    from ttl_tpu.models.zoo import TEST_TINY
    from ttl_tpu.ops.lora import init_adapters
    from ttl_tpu.tokenizer.bpe import tokenize

    params = jclip.init_clip_params(jax.random.PRNGKey(0), TEST_TINY,
                                    param_dtype=jnp.float32)
    views = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64),
                              jnp.float32)
    toks = jnp.asarray(tokenize(["a photo of a cat.", "a photo of a dog."]))
    adapters = init_adapters(jax.random.PRNGKey(2), 2,
                             TEST_TINY.vision.hidden, 4, "gaussian")

    def run_all():
        vf = jclip.vision_features(params["vision"], views, TEST_TINY.vision,
                                   adapters=adapters, adapter_window=(2, 3),
                                   compute_dtype=jnp.float32)
        tf = jclip.text_features(params["text"], toks, TEST_TINY.text,
                                 compute_dtype=jnp.float32)

        def loss(ad):
            out = jclip.vision_features(params["vision"], views,
                                        TEST_TINY.vision, adapters=ad,
                                        adapter_window=(2, 3),
                                        compute_dtype=jnp.float32)
            return jnp.sum(jnp.sin(out))

        g = jax.grad(loss)(adapters)
        return vf, tf, g

    fa.fused_mode.cache_clear()
    monkeypatch.setenv("TTL_FUSED_ATTENTION", "off")
    ref = run_all()
    fa.fused_mode.cache_clear()
    monkeypatch.setenv("TTL_FUSED_ATTENTION", "bshd")
    got = run_all()
    fa.fused_mode.cache_clear()

    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=2e-4, atol=2e-5, err_msg="vision")
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=2e-4, atol=2e-5, err_msg="text")
    for (ka, a), (kb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(got[2]),
            jax.tree_util.tree_leaves_with_path(ref[2])):
        assert str(ka) == str(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=f"grad {ka}")


def test_default_mode_gating():
    """The auto default routes to the bshd kernel exactly on a single real
    TPU chip: CPU (tests, virtual meshes, the driver dryrun) and multi-chip
    (pallas_call has no GSPMD partitioning rule) stay on the XLA einsum."""
    assert fa._default_mode("tpu", 1) == "bshd"
    assert fa._default_mode("cpu", 1) == ""
    assert fa._default_mode("cpu", 8) == ""
    assert fa._default_mode("tpu", 8) == ""


def test_heads_mode_vmem_guard():
    """heads_mode_fits classifies the shipped arches: ViT-B (12 heads, 197
    tokens) and both text towers fit scoped VMEM; ViT-L (16 heads, 257
    tokens) does not (measured: 17.18 MB scoped vs the 16 MB limit, a
    compile-time XLA error without the guard)."""
    assert fa.heads_mode_fits(12, 197, 64)        # ViT-B/16 vision
    assert fa.heads_mode_fits(12, 50, 64)         # ViT-B/32 vision
    assert fa.heads_mode_fits(8, 77, 64)          # ViT-B text
    assert fa.heads_mode_fits(12, 77, 64)         # ViT-L text
    assert not fa.heads_mode_fits(16, 257, 64)    # ViT-L/14 vision


def test_heads_mode_falls_back_at_vitl_shapes(monkeypatch, recwarn):
    """models.clip._attention degrades heads->per_head (with a warning)
    when the heads kernel cannot fit, instead of dying in XLA compile;
    the result still matches the einsum reference exactly at f32."""
    import warnings

    from ttl_tpu.models.clip import _attention

    monkeypatch.setenv("TTL_FUSED_ATTENTION", "heads")
    fa.fused_mode.cache_clear()
    key = jax.random.PRNGKey(0)
    # ViT-L head geometry (16 heads x 64) at a shortened token axis still
    # >VMEM-fit threshold? No - use the real 257 to exercise the guard,
    # with a tiny batch to keep the interpreted kernel fast.
    q, k, v = (jax.random.normal(k_, (1, 257, 1024), jnp.float32)
               for k_ in jax.random.split(key, 3))
    with warnings.catch_warnings():
        warnings.simplefilter("always")
        out = _attention(q, k, v, heads=16, causal=False)
    assert any("does not fit scoped VMEM" in str(w.message)
               for w in recwarn.list)
    ref = fa.reference_attention(
        *(t.reshape(1, 257, 16, 64).transpose(0, 2, 1, 3)
          for t in (q, k, v)), False)
    np.testing.assert_allclose(
        np.asarray(out.reshape(1, 257, 16, 64).transpose(0, 2, 1, 3)),
        np.asarray(ref), rtol=2e-4, atol=2e-5)
    fa.fused_mode.cache_clear()


def test_ln_matmul_kernel_matches_reference():
    """Fused LN+matmul Pallas kernel: exact parity with layer_norm+linear.
    (Measured performance-neutral vs XLA on v5e - see module docstring -
    kept as a tested experiment, not wired into the towers.)"""
    from ttl_tpu.ops.ln_matmul import ln_matmul, reference_ln_matmul

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (300, 256), jnp.float32)
    sc = 1 + 0.1 * jax.random.normal(ks[1], (256,))
    bi = 0.1 * jax.random.normal(ks[2], (256,))
    w = 0.05 * jax.random.normal(ks[3], (256, 384), jnp.float32)
    b = 0.1 * jax.random.normal(ks[4], (384,))
    a = ln_matmul(x, sc, bi, w, b)
    r = reference_ln_matmul(x, sc, bi, w, b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                               rtol=1e-5, atol=1e-5)
