"""Offline analysis utilities (attention rollout, overlays, t-SNE) and the
Bongard episodic dataset."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.utils.analysis import (attention_rollout, heatmap_overlay,
                                    tsne_features, vision_attention_maps)


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    return params, imgs


def test_attention_maps_shapes(setup):
    params, imgs = setup
    maps = vision_attention_maps(params["vision"], imgs, TEST_TINY.vision)
    v = TEST_TINY.vision
    assert maps.shape == (v.layers, 2, v.heads, v.seq_len, v.seq_len)
    # rows are probability distributions
    np.testing.assert_allclose(np.asarray(maps.sum(-1)), 1.0, atol=1e-4)


def test_attention_rollout(setup):
    params, imgs = setup
    maps = vision_attention_maps(params["vision"], imgs, TEST_TINY.vision)
    rel = attention_rollout(maps)
    assert rel.shape == (2, TEST_TINY.vision.seq_len - 1)
    r = np.asarray(rel)
    assert np.isfinite(r).all() and r.max() <= 1.0 + 1e-6 and r.min() >= 0


def test_heatmap_overlay(setup):
    params, imgs = setup
    maps = vision_attention_maps(params["vision"], imgs, TEST_TINY.vision)
    rel = attention_rollout(maps)
    img01 = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
    out = heatmap_overlay(img01, np.asarray(rel[0]))
    assert out.shape == (64, 64, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_tsne(tmp_path):
    feats = np.random.RandomState(0).randn(30, 16).astype(np.float32)
    labels = [i % 3 for i in range(30)]
    out = tmp_path / "tsne.png"
    emb = tsne_features(feats, labels, str(out))
    assert emb.shape == (30, 2)
    assert out.exists() and out.stat().st_size > 0


def test_bongard_dataset(tmp_path):
    from ttl_tpu.data.bongard import BongardDataset

    splits = tmp_path / "splits"
    splits.mkdir()
    task = [
        [{"im_path": f"./neg_{i}.jpg"} for i in range(7)],
        [{"im_path": f"./pos_{i}.jpg"} for i in range(7)],
        "ride++bicycle",
    ]
    (splits / "bongard_hoi_test_unseen_obj_unseen_act.json").write_text(
        json.dumps([task]))
    ds = BongardDataset(str(tmp_path), mode="test", with_annotation=True,
                        splits_dir=str(splits))
    assert len(ds) == 1
    ep = ds[0]
    assert len(ep.support_paths) == 12
    assert ep.support_labels == [0] * 6 + [1] * 6
    assert ep.query_labels == [1, 0]
    assert ep.annotation == "ride bicycle"
    # fixed-seed shuffle: deterministic across reads
    assert ds[0].support_paths == ep.support_paths
