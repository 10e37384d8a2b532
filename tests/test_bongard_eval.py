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
