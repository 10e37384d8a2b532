"""Batch offline prediction CLI (label-free directory -> JSONL)."""
import io
import json

import numpy as np
import pytest
from PIL import Image

from ttl_tpu.config import TTLConfig
from ttl_tpu.predict import ImageDirDataset, predict_directory

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                layer_range=(2, 3), rank=4, compute_dtype="float32",
                param_dtype="float32", sample_batch=2)
CLASSES = ["forest", "river", "highway"]


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    (root / "sub").mkdir()
    for i in range(5):
        arr = (rng.rand(70 + 5 * i, 90, 3) * 255).astype(np.uint8)
        where = root / "sub" if i % 2 else root
        Image.fromarray(arr).save(where / f"img_{i}.jpg")
    return str(root)


@pytest.mark.slow
def test_predict_directory_jsonl(image_dir):
    sink = io.StringIO()
    n = predict_directory(CFG.replace(data=image_dir), CLASSES, topk=3,
                          out=sink)
    rows = [json.loads(ln) for ln in sink.getvalue().splitlines()]
    assert n == len(rows) == 5
    ds = ImageDirDataset(image_dir)
    assert sorted(r["path"] for r in rows) == sorted(ds.paths)
    for r in rows:
        assert r["label"] in CLASSES and r["zero_shot_label"] in CLASSES
        probs = [t["prob"] for t in r["topk"]]
        assert probs == sorted(probs, reverse=True)
        assert abs(sum(probs) - 1.0) < 1e-3  # topk == all 3 classes

    # deterministic: same directory, same predictions
    sink2 = io.StringIO()
    predict_directory(CFG.replace(data=image_dir), CLASSES, topk=3,
                      out=sink2)
    assert sink2.getvalue() == sink.getvalue()


def test_predict_zero_shot_mode(image_dir):
    sink = io.StringIO()
    n = predict_directory(CFG.replace(data=image_dir, tta_steps=0), CLASSES,
                          out=sink)
    assert n == 5
    for ln in sink.getvalue().splitlines():
        r = json.loads(ln)
        assert r["label"] == r["zero_shot_label"]  # no adaptation


def test_empty_directory_errors(tmp_path):
    with pytest.raises(FileNotFoundError, match="no images"):
        ImageDirDataset(str(tmp_path))


def test_predict_validates_modes(image_dir):
    with pytest.raises(ValueError, match="ResNet vision tower"):
        predict_directory(CFG.replace(data=image_dir, arch="RN50"), CLASSES)
    with pytest.raises(ValueError, match="LoRA modes"):
        predict_directory(CFG.replace(data=image_dir,
                                      lora_encoder="prompt"), CLASSES)
