"""Bongard-HOI episodic evaluation driver (tiny model, CPU).

The reference bundles the dataset but no driver (SURVEY.md component 21);
ttl_tpu.adapt.bongard completes the capability: support-prototype 2-way
classifier + optional full TTL adaptation per query.
"""
import json

import numpy as np
import pytest
from PIL import Image

import jax

from ttl_tpu.adapt.bongard import evaluate_bongard
from ttl_tpu.config import TTLConfig
from ttl_tpu.data.bongard import BongardDataset
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.runner import run

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                layer_range=(2, 3), rank=4, test_sets="bongard",
                compute_dtype="float32", param_dtype="float32",
                sample_batch=2, print_freq=1000)


@pytest.fixture(scope="module")
def bongard_ds(tmp_path_factory):
    """Two episodes of visually separable concepts (red-ish vs blue-ish)."""
    root = tmp_path_factory.mktemp("bongard")
    splits = root / "splits"
    splits.mkdir()
    rng = np.random.RandomState(0)

    def save(name, hue):
        img = (rng.rand(72, 80, 3) * 80).astype(np.uint8)
        img[..., hue] = np.minimum(255, img[..., hue] + 160)
        Image.fromarray(img).save(root / name)
        return f"./{name}"

    tasks = []
    for t in range(2):
        pos = [{"im_path": save(f"t{t}_pos_{i}.jpg", 0)} for i in range(7)]
        neg = [{"im_path": save(f"t{t}_neg_{i}.jpg", 2)} for i in range(7)]
        tasks.append([neg, pos, "hold++cup"])
    (splits / "bongard_hoi_test_unseen_obj_unseen_act.json").write_text(
        json.dumps(tasks))
    return BongardDataset(str(root), mode="test", splits_dir=str(splits))


@pytest.fixture(scope="module")
def model():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    return params, adapters0


@pytest.mark.slow
def test_bongard_eval_adapted(bongard_ds, model):
    params, adapters0 = model
    acc = evaluate_bongard(CFG, bongard_ds, TEST_TINY, params, adapters0)
    assert 0.0 <= acc <= 100.0
    acc2 = evaluate_bongard(CFG, bongard_ds, TEST_TINY, params, adapters0)
    assert acc == acc2  # deterministic


def test_bongard_eval_zero_shot(bongard_ds, model):
    params, adapters0 = model
    acc = evaluate_bongard(CFG.replace(tta_steps=0), bongard_ds, TEST_TINY,
                           params, adapters0)
    assert 0.0 <= acc <= 100.0


def test_bongard_through_runner(bongard_ds):
    results = run(CFG, datasets={"bongard": bongard_ds})
    assert "bongard" in results
    assert 0.0 <= results["bongard"][0] <= 100.0
    assert results["bongard"][1] == 100.0  # 2-way task: top-5 is trivial


def test_bongard_prototype_matches_torch_oracle(bongard_ds, model):
    """Torch-side oracle for the tta_steps=0 prototype classifier.

    The driver is novel (the reference ships the dataset but no eval,
    SURVEY.md component 21), so unlike TTL/TPT it has no upstream to diff
    against; this pins its math the same way test_composite_oracle pins the
    episodic step: identical weights + identical eval views -> an independent
    torch reimplementation of the WHOLE prototype path (frozen tower forward,
    L2 normalize, per-polarity mean, re-normalize, scaled cosine logits) must
    reproduce the JAX driver's logits, predictions, and episode accuracy.
    """
    import torch
    from test_composite_oracle import TorchTinyVit

    from ttl_tpu.adapt.bongard import make_support_encoder
    from ttl_tpu.data.views import load_canvas
    from ttl_tpu.ops.image import preprocess_center

    import jax.numpy as jnp

    params, adapters0 = model
    cfg = CFG.replace(tta_steps=0)
    encode = make_support_encoder(TEST_TINY, cfg)
    # B=0 xavier adapters -> the torch tower's LoRA contribution is zero,
    # i.e. the frozen tower evaluate_bongard uses for prototypes/queries
    vit = TorchTinyVit(params["vision"], adapters0, cfg, window=(2, 3))
    ls = float(np.exp(np.asarray(params["logit_scale"], np.float32)))

    total = correct = 0
    for ei in range(len(bongard_ds)):
        ep = bongard_ds[ei]
        paths = list(ep.support_paths) + list(ep.query_paths)
        canv = np.zeros((len(paths), 512, 512, 3), np.uint8)
        hs = np.zeros((len(paths),), np.int32)
        ws = np.zeros((len(paths),), np.int32)
        for k, p in enumerate(paths):
            canv[k], hs[k], ws[k] = load_canvas(p, 512)
        n_sup = len(ep.support_paths)
        labels = np.asarray(ep.support_labels)

        # --- JAX driver math (exactly evaluate_bongard's tta_steps=0 body)
        feats = encode(params, jnp.asarray(canv[:n_sup]),
                       jnp.asarray(hs[:n_sup]), jnp.asarray(ws[:n_sup]))
        from ttl_tpu.models.clip import l2_normalize
        protos = jnp.stack([
            l2_normalize(jnp.mean(feats[labels == c], axis=0))
            for c in (0, 1)])
        qf = encode(params, jnp.asarray(canv[n_sup:]),
                    jnp.asarray(hs[n_sup:]), jnp.asarray(ws[n_sup:]))
        jax_logits = np.asarray(jnp.exp(params["logit_scale"]) * qf
                                @ protos.T, np.float32)

        # --- torch oracle on the same deterministic eval views
        views = np.stack([
            np.asarray(preprocess_center(jnp.asarray(canv[k]), hs[k], ws[k],
                                         cfg.resolution))
            for k in range(len(paths))])
        with torch.no_grad():
            f = vit(torch.from_numpy(views))
            f = f / f.norm(dim=-1, keepdim=True)
            sup = f[:n_sup]
            pt = torch.stack([sup[torch.from_numpy(labels) == c].mean(0)
                              for c in (0, 1)])
            pt = pt / pt.norm(dim=-1, keepdim=True)
            torch_logits = (ls * f[n_sup:] @ pt.T).numpy()

        np.testing.assert_allclose(jax_logits, torch_logits,
                                   rtol=2e-4, atol=2e-4)
        jax_pred = jax_logits.argmax(-1)
        np.testing.assert_array_equal(jax_pred, torch_logits.argmax(-1))
        correct += int((jax_pred == np.asarray(ep.query_labels)).sum())
        total += len(ep.query_paths)

    # and the end-to-end driver reports exactly the oracle's accuracy
    acc = evaluate_bongard(cfg, bongard_ds, TEST_TINY, params, adapters0)
    np.testing.assert_allclose(acc, 100.0 * correct / total, atol=1e-6)
