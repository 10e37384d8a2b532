"""Multi-host evaluation test: 2 virtual hosts (jax.distributed over CPU,
4 virtual devices each) must reproduce the single-host run exactly.

The runner's multi-host path: per-host input shards of the seed-shared
shuffled order -> global arrays via make_array_from_process_local_data ->
one fused sharded program per global batch -> cross-host metric psum
(parallel.eval.make_count_fn). Per-sample view keys are folded from dataset
positions, so a sample's logits are identical no matter which host loads it
- the multi-host totals must equal the single-host totals bit-for-bit.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

import pytest

pytestmark = pytest.mark.slow  # spawns 2 jax.distributed processes

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# 13 samples / sample_batch 8: exercises last-batch padding AND uneven
# host shards (host0 gets 7, host1 gets 6 -> filler batch alignment)
N_SAMPLES = 13
WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    pid = int(sys.argv[1])
    jax.distributed.initialize(sys.argv[2], num_processes=2, process_id=pid)
    import numpy as np
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.data.views import ArrayDataset
    from ttl_tpu.runner import run

    data = np.load(sys.argv[3])
    ds = ArrayDataset(data["images"], data["labels"])
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                    layer_range=(2, 3), rank=4, test_sets="eurosat",
                    compute_dtype="float32", param_dtype="float32",
                    sample_batch=8, print_freq=1000)
    results = run(cfg, datasets={"eurosat": ds})
    print("RESULT:" + json.dumps(results["eurosat"]), flush=True)
""")


def test_two_host_eval_matches_single_host(tmp_path):
    rng = np.random.RandomState(0)
    images = (rng.rand(N_SAMPLES, 80, 96, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 10, size=N_SAMPLES)
    npz = tmp_path / "ds.npz"
    np.savez(npz, images=images, labels=labels)
    script = tmp_path / "worker.py"
    script.write_text(WORKER)

    # single-host reference, in-process (conftest's 8-device CPU mesh -
    # same global device count as 2 hosts x 4)
    from ttl_tpu.config import TTLConfig
    from ttl_tpu.data.views import ArrayDataset
    from ttl_tpu.runner import run
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                    layer_range=(2, 3), rank=4, test_sets="eurosat",
                    compute_dtype="float32", param_dtype="float32",
                    sample_batch=8, print_freq=1000)
    ref = run(cfg, datasets={"eurosat": ArrayDataset(images, labels)})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        coord = f"127.0.0.1:{s.getsockname()[1]}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), coord, str(npz)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for i in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    result_lines = [ln for ln in outs[0][0].splitlines()
                    if ln.startswith("RESULT:")]
    assert result_lines, outs[0][0][-2000:]
    mh = json.loads(result_lines[0][len("RESULT:"):])
    np.testing.assert_allclose(mh, ref["eurosat"], rtol=0, atol=1e-9)
