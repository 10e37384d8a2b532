"""True CLI smoke: python -m ttl_tpu as a subprocess over an on-disk
ImageFolder dataset (tiny arch, CPU)."""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from ttl_tpu.utils.profiling import PhaseTimer, op_stats

pytestmark = pytest.mark.slow  # CLI subprocess end-to-end (~8 min)


@pytest.fixture(scope="module")
def imagenet_a_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    d = root / "imagenet-adversarial" / "imagenet-a"
    rng = np.random.RandomState(0)
    for wnid in ("n01498041", "n01531178"):
        (d / wnid).mkdir(parents=True)
        for i in range(2):
            arr = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / wnid / f"img_{i}.jpg")
    return str(root)


def test_cli_end_to_end_subprocess(imagenet_a_tree):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    out = subprocess.run(
        [sys.executable, "-m", "ttl_tpu", imagenet_a_tree,
         "--test_sets", "A", "--arch", "test-tiny", "--resolution", "64",
         "-b", "8", "--layer_range", "2,3", "--rank", "4",
         "--compute_dtype", "float32", "--param_dtype", "float32",
         "--sample_batch", "2", "--max_samples", "4"],
        # ~30s since jaxcache.honor_platform_env: the historical "~6 min
        # CPU compile" was actually the relay plugin ignoring
        # JAX_PLATFORMS=cpu and waiting out its connect timeout; headroom
        # kept for loaded machines
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Result Summary" in out.stdout
    assert "Acc@1" in out.stdout


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("decode"):
        pass
    with t.phase("decode"):
        pass
    with t.phase("adapt"):
        pass
    assert t.counts["decode"] == 2 and t.counts["adapt"] == 1
    assert "decode" in t.summary() and "adapt" in t.summary()


def test_op_stats_empty_dir(tmp_path):
    assert op_stats(str(tmp_path)) == []
