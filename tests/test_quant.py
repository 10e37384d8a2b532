"""Int8 frozen-prefix quantization (ops/quant.py, --prefix_quant int8).

The quantized path is a TPU-native perf extension with no reference
equivalent; these tests pin (a) the int8 GEMM's exactness on representable
inputs, (b) its error bound on random inputs, (c) fidelity of the quantized
vision prefix against the full-precision tower, and (d) that the product
surfaces (fused TTL step, runner, CLI, mesh sharding) compose with it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import (init_clip_params, linear, vision_features)
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.ops.quant import (attach_prefix_quant, linear_q,
                               quant_prefix_len, quantize_linear)

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                sample_batch=2, layer_range=(1, 2), rank=4,
                compute_dtype="float32", param_dtype="float32",
                prefix_quant="int8")


def test_linear_q_exact_on_representable():
    # weights and activations already on the int8 grid after scaling ->
    # quantization is lossless and the int32 accumulation is exact
    rng = np.random.RandomState(0)
    w_int = rng.randint(-127, 128, size=(16, 8)).astype(np.float32)
    x_int = rng.randint(-127, 128, size=(4, 16)).astype(np.float32)
    p = {"w": jnp.asarray(w_int) * 0.5, "b": jnp.zeros((8,), jnp.float32)}
    x = jnp.asarray(x_int) * 2.0
    # per-column max|w| must hit 127 * 0.5 so scales are exact powers
    p["w"] = p["w"].at[0].set(127 * 0.5)
    x = x.at[:, 0].set(127 * 2.0)
    np.testing.assert_allclose(np.asarray(linear_q(x, quantize_linear(p))),
                               np.asarray(linear(x, p)), rtol=0, atol=1e-3)


def test_linear_q_error_bound():
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (64, 96), jnp.float32)
    p = {"w": jax.random.normal(kw, (96, 48), jnp.float32) * 0.05,
         "b": jnp.zeros((48,), jnp.float32)}
    y = np.asarray(linear(x, p))
    yq = np.asarray(linear_q(x, quantize_linear(p)))
    rel = np.linalg.norm(yq - y) / np.linalg.norm(y)
    assert rel < 0.02, rel


def test_prefix_quant_feature_fidelity():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    qparams = attach_prefix_quant(params, quant_prefix_len(CFG, TEST_TINY))
    assert "prefix_q" in qparams["vision"]
    # image-adapted mode: only layers below the window carry int8 copies
    assert (qparams["vision"]["prefix_q"]["ln1"]["scale"].shape[0]
            == CFG.layer_range[0])
    adapters = init_adapters(jax.random.PRNGKey(2), 2,
                             TEST_TINY.vision.hidden, CFG.rank, "xavier")
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 64, 64),
                               jnp.float32)
    kw = dict(adapters=adapters, adapter_window=CFG.layer_range,
              compute_dtype=jnp.float32)
    f = np.asarray(vision_features(params["vision"], images,
                                   TEST_TINY.vision, **kw))
    fq = np.asarray(vision_features(qparams["vision"], images,
                                    TEST_TINY.vision, **kw))
    cos = np.sum(f * fq, -1) / (np.linalg.norm(f, axis=-1)
                                * np.linalg.norm(fq, axis=-1))
    assert np.all(cos > 0.99), cos


def test_drop_fp_frees_fully_quantized_tower():
    """Frozen-vision modes (whole tower quantized) never read the fp layer
    stack again; drop_fp replaces it with a zero-length slice (freeing its
    HBM, ADVICE r2) and the quantized zero-shot features are unchanged."""
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    n = TEST_TINY.vision.layers
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 3, 64, 64),
                               jnp.float32)
    q_keep = attach_prefix_quant(params, n)
    q_drop = attach_prefix_quant(params, n, drop_fp=True)
    assert q_drop["vision"]["layers"]["ln1"]["scale"].shape[0] == 0
    f_keep = np.asarray(vision_features(q_keep["vision"], images,
                                        TEST_TINY.vision,
                                        compute_dtype=jnp.float32))
    f_drop = np.asarray(vision_features(q_drop["vision"], images,
                                        TEST_TINY.vision,
                                        compute_dtype=jnp.float32))
    np.testing.assert_array_equal(f_keep, f_drop)
    # an adapted-suffix config (upto < n_layers) must NOT drop: the window
    # and remat'd suffix still read the fp stack
    q_part = attach_prefix_quant(params, 1, drop_fp=True)
    assert q_part["vision"]["layers"]["ln1"]["scale"].shape[0] == n


@pytest.mark.slow
def test_quant_flip_rate_bound():
    """The int8-prefix accuracy stand-in (VERDICT r2 #10): over a random
    canvas sweep the quantized program's adapted top-1 must agree with full
    precision almost always (measured: 0 flips / 64 at these dims; full
    ViT-B/16 numbers in PERF_NOTES via tools/quant_fidelity.py)."""
    from ttl_tpu.adapt.ttl import make_fused_ttl_fn
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens

    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens([f"class {i}" for i in range(20)]))
    tc = build_text_classifier(params["text"], toks, TEST_TINY.text,
                               compute_dtype=jnp.float32)
    a0 = init_adapters(jax.random.PRNGKey(1), 2, TEST_TINY.vision.hidden,
                       CFG.rank, "xavier")
    qparams = attach_prefix_quant(params, quant_prefix_len(CFG, TEST_TINY))
    fn = make_fused_ttl_fn(TEST_TINY, CFG.replace(sample_batch=8))
    rng = np.random.RandomState(0)
    flips, n, maxdev = 0, 0, 0.0
    for b in range(8):
        canv = (rng.rand(8, 96, 96, 3) * 255).astype(np.uint8)
        hs = rng.randint(40, 96, (8,)).astype(np.int32)
        ws = rng.randint(40, 96, (8,)).astype(np.int32)
        idxs = np.arange(8, dtype=np.int32) + b * 8
        lf = np.asarray(fn(params, tc, a0, canv, hs, ws, idxs).logits)
        lq = np.asarray(fn(qparams, tc, a0, canv, hs, ws, idxs).logits)
        flips += int((lf.argmax(-1) != lq.argmax(-1)).sum())
        maxdev = max(maxdev, float(np.abs(lf - lq).max()))
        n += 8
    assert flips / n <= 0.05, (flips, n)
    assert maxdev < 0.05, maxdev


def test_quant_prefix_len_per_mode():
    assert quant_prefix_len(CFG, TEST_TINY) == 1
    for frozen in (CFG.replace(lora_encoder="text"),
                   CFG.replace(lora_encoder="prompt"),
                   CFG.replace(tta_steps=0),
                   CFG.replace(cocoop=True)):
        assert quant_prefix_len(frozen, TEST_TINY) == TEST_TINY.vision.layers


# slow tier: the quant fused-step numeric check is the costliest
# compile in the file; the fast tier keeps the fidelity unit test and
# the runner e2e (same code path at the user surface).
@pytest.mark.slow
def test_fused_ttl_step_with_quant():
    from ttl_tpu.adapt.ttl import make_fused_ttl_fn
    from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens

    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens(["cat", "dog", "ship"]))
    text_cls = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    qparams = attach_prefix_quant(params, quant_prefix_len(CFG, TEST_TINY))

    rng = np.random.RandomState(0)
    canv = (rng.rand(2, 96, 96, 3) * 255).astype(np.uint8)
    hs = np.full((2,), 80, np.int32)
    ws = np.full((2,), 96, np.int32)
    idxs = np.arange(2, dtype=np.int32)

    fn = make_fused_ttl_fn(TEST_TINY, CFG)
    res_q = fn(qparams, text_cls, adapters0, canv, hs, ws, idxs)
    res_f = fn(params, text_cls, adapters0, canv, hs, ws, idxs)
    lq, lf = np.asarray(res_q.logits), np.asarray(res_f.logits)
    assert np.all(np.isfinite(lq))
    # tiny random towers amplify quantization error; the adapted logits must
    # still track the full-precision program closely
    assert np.all(np.abs(lq - lf) < 0.5), np.abs(lq - lf).max()
    # determinism of the quantized program
    res_q2 = fn(qparams, text_cls, adapters0, canv, hs, ws, idxs)
    np.testing.assert_array_equal(lq, np.asarray(res_q2.logits))


def test_runner_end_to_end_with_quant():
    from ttl_tpu.runner import run

    class SyntheticDataset:
        classnames = ["cat", "dog", "ship"]

        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            arr = (rng.rand(72, 96, 3) * 255).astype(np.uint8)
            return arr, i % 3

    cfg = CFG.replace(test_sets="cifar10")
    ds = SyntheticDataset()
    results = run(cfg, datasets={"cifar10": ds}, max_samples=4)
    top1, top5 = results["cifar10"]
    assert 0.0 <= top1 <= 100.0 and 0.0 <= top5 <= 100.0


def test_pallas_quantized_matmul_matches_linear_q():
    # the kernel is a tested experiment (ops/quant_matmul.py): bitwise-exact
    # against the shipped XLA path on CPU interpret-capable shapes
    kx, kw = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(kx, (48, 128), jnp.float32)
    p = {"w": jax.random.normal(kw, (128, 256), jnp.float32) * 0.05,
         "b": jax.random.normal(jax.random.fold_in(kw, 1), (256,),
                                jnp.float32)}
    pq = quantize_linear(p)
    from ttl_tpu.ops.quant_matmul import quantized_matmul
    y_ref = np.asarray(linear_q(x, pq))
    y_k = np.asarray(quantized_matmul(
        x, pq["wq"], pq["scale"][None, :], pq["b"][None, :], tm=16))
    np.testing.assert_allclose(y_k, y_ref, rtol=0, atol=1e-5)


def test_cli_flag():
    from ttl_tpu.cli import build_parser, config_from_args
    cfg = config_from_args(build_parser().parse_args(
        ["--prefix_quant", "int8"]))
    assert cfg.prefix_quant == "int8"
    assert TTLConfig().prefix_quant == "none"


def test_shard_params_with_prefix_q():
    from ttl_tpu.parallel.mesh import make_mesh, param_spec, shard_params
    mesh = make_mesh((4, 2))
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    qparams = attach_prefix_quant(params, 2)
    sharded = shard_params(qparams, mesh)  # must not raise
    assert param_spec("vision/prefix_q/attn/q/wq", mesh) == \
        jax.sharding.PartitionSpec()
    del sharded
