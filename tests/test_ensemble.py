"""80-template ensemble classifier (--ensemble; MyClip zeroshot_classifier,
custom_clip_old.py:534-630 / the README's 'Ensemble (80 prompts)' row)."""
import jax
import jax.numpy as jnp
import numpy as np

from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params, l2_normalize, text_features
from ttl_tpu.models.prompts import (build_ensemble_classifier,
                                    load_imagenet_templates)
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.tokenizer.bpe import tokenize

CLASSNAMES = ["goldfish", "tiger shark", "fire lily"]


def test_ensemble_semantics_and_truncation():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    templates = load_imagenet_templates()
    assert len(templates) == 80

    # hand-computed oracle for one class at full 77 length: mean of
    # normalized per-template features, re-normalized
    cls = CLASSNAMES[0]
    toks = jnp.asarray(tokenize([t.format(cls) for t in templates]))
    emb = l2_normalize(text_features(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32))
    mean = jnp.mean(emb, axis=0)
    expect = mean / jnp.linalg.norm(mean)

    for truncate in (False, True):
        table = build_ensemble_classifier(
            params["text"], CLASSNAMES, TEST_TINY.text,
            compute_dtype=jnp.float32, truncate=truncate)
        assert table.shape == (len(CLASSNAMES), TEST_TINY.text.proj_dim)
        np.testing.assert_allclose(np.asarray(table[0]), np.asarray(expect),
                                   rtol=0, atol=1e-5)
        norms = np.linalg.norm(np.asarray(table), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_ensemble_zero_shot_run():
    from ttl_tpu.runner import run

    class SyntheticDataset:
        classnames = CLASSNAMES

        def __len__(self):
            return 4

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            return (rng.rand(72, 96, 3) * 255).astype(np.uint8), i % 3

    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                    sample_batch=2, layer_range=(1, 2), rank=4,
                    compute_dtype="float32", param_dtype="float32",
                    test_sets="cifar10", tta_steps=0, ensemble=True)
    results = run(cfg, datasets={"cifar10": SyntheticDataset()},
                  max_samples=4)
    top1, top5 = results["cifar10"]
    assert 0.0 <= top1 <= 100.0 and 0.0 <= top5 <= 100.0


def test_cli_flag():
    from ttl_tpu.cli import build_parser, config_from_args
    cfg = config_from_args(build_parser().parse_args(["--ensemble"]))
    assert cfg.ensemble
    assert not TTLConfig().ensemble


def test_ensemble_rejected_where_ignored():
    """--ensemble must error, not silently no-op, in modes that never
    consume the frozen single-template classifier."""
    import pytest

    from ttl_tpu.runner import evaluate_dataset

    base = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                     sample_batch=2, layer_range=(1, 2), rank=4,
                     compute_dtype="float32", param_dtype="float32",
                     ensemble=True)
    for cfg in (base.replace(lora_encoder="text"),
                base.replace(lora_encoder="prompt"),
                base.replace(cocoop=True)):
        with pytest.raises(ValueError, match="ensemble"):
            evaluate_dataset("cifar10", cfg, None, None, None, dataset=[])
