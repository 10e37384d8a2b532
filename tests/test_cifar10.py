"""CIFAR-10 pickle-batch loader + zero-shot smoke (BASELINE.json config 1)."""
import os
import pickle

import numpy as np
import pytest

from ttl_tpu.config import TTLConfig
from ttl_tpu.data.cifar10 import Cifar10Dataset
from ttl_tpu.data.registry import build_dataset
from ttl_tpu.runner import run


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    d = root / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.RandomState(0)
    n = 20
    data = (rng.rand(n, 3072) * 255).astype(np.uint8)
    labels = [int(x) for x in rng.randint(0, 10, size=n)]
    with open(d / "test_batch", "wb") as f:
        pickle.dump({b"data": data, b"labels": labels}, f)
    names = [b"airplane", b"automobile", b"bird", b"cat", b"deer",
             b"dog", b"frog", b"horse", b"ship", b"truck"]
    with open(d / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": names}, f)
    return str(root)


def test_loader_shapes_and_meta(cifar_root):
    ds = Cifar10Dataset(os.path.join(cifar_root, "cifar-10-batches-py"))
    assert len(ds) == 20
    img, label = ds[3]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert 0 <= label < 10
    assert ds.classnames[0] == "airplane" and len(ds.classnames) == 10


def test_missing_batches_actionable_error(tmp_path):
    with pytest.raises(FileNotFoundError, match="batches.meta|stripped"):
        Cifar10Dataset(str(tmp_path))


def test_zero_shot_eval_through_runner(cifar_root):
    """The BASELINE config-1 path: registry -> loader -> zero-shot eval."""
    cfg = TTLConfig(arch="test-tiny", resolution=64, test_sets="cifar10",
                    data=cifar_root, tta_steps=0, compute_dtype="float32",
                    param_dtype="float32", sample_batch=4, print_freq=1000)
    ds = build_dataset("cifar10", cfg)
    assert len(ds) == 20
    results = run(cfg, datasets={"cifar10": ds})
    assert 0.0 <= results["cifar10"][0] <= 100.0
