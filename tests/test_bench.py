"""bench.py measurement-path tests (tiny model, CPU 8-device mesh).

The driver runs bench.py on real TPU hardware; these tests pin that both
of its measurement paths - the single-device fused step and the
data-mesh aggregate that activates whenever jax.device_count() > 1 -
compile and execute, and that the aggregate path computes the same
per-sample numerics as the single-device one (VERDICT r2 weak #1/#3:
the aggregate must be measurable the moment multi-chip hardware exists).
"""
import numpy as np
import pytest

import jax

from bench import measure
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.parallel.mesh import make_mesh

CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                layer_range=(2, 3), rank=4, compute_dtype="float32",
                param_dtype="float32", sample_batch=8)


def _setup(S):
    import jax.numpy as jnp
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    toks = jnp.asarray(prompt_tokens([f"class {i}" for i in range(5)]))
    text_cls = build_text_classifier(params["text"], toks, TEST_TINY.text,
                                     compute_dtype=jnp.float32)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, CFG.rank, "xavier")
    rng = np.random.RandomState(0)
    canv = (rng.rand(S, 96, 96, 3) * 255).astype(np.uint8)
    hs = np.full((S,), 96, np.int32)
    ws = np.full((S,), 96, np.int32)
    return params, text_cls, adapters0, canv, hs, ws


def test_emit_once_prints_exactly_once(capsys):
    """The watchdog and the main path race to print the one result line;
    whoever arrives second must be a no-op."""
    import bench
    bench._PRINTED.clear()
    try:
        bench.emit_once({"a": 1})
        bench.emit_once({"a": 2})
    finally:
        lines = capsys.readouterr().out.strip().splitlines()
        bench._PRINTED.clear()
    assert lines == ['{"a": 1}']


def test_load_last_known_good_skips_null_artifacts():
    """The relay-dark fallback context figure: newest committed BENCH_r*
    with a real value (r03 is the null outage artifact and must be
    skipped)."""
    from bench import load_last_known_good
    lkg = load_last_known_good()
    assert lkg is not None and lkg["value"] > 0
    assert lkg["artifact"] != "BENCH_r03.json"


def test_measure_single_device():
    args = _setup(8)
    sps = measure(TEST_TINY, CFG, *args, windows=1, iters=2)
    assert np.isfinite(sps) and sps > 0


@pytest.mark.slow
def test_bench_main_contract():
    """Drive the driver artifact itself: `python bench.py` at test-tiny on a
    CPU mesh with a tight budget must exit 0 and print ONE JSON line with
    the primary fields, listing the budget-skipped optional stages."""
    import json
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    # pin TTL_BENCH_S: an ambient export would change the measured S and
    # break the sample_batch==10 assertion below (ADVICE r4)
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               TTL_BENCH_PLATFORM="cpu", TTL_BENCH_ARCH="test-tiny",
               TTL_BENCH_S="10",
               TTL_BENCH_BUDGET_S="45", TTL_BENCH_WATCHDOG_GRACE_S="600")
    r = subprocess.run([sys.executable, str(root / "bench.py")],
                       capture_output=True, text=True, timeout=540, env=env,
                       cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert out["unit"] == "samples/s/chip" and out["value"] > 0
    assert "test-tiny" in out["metric"]
    # the primary figure is a single-device rate, so its provisional
    # vs_baseline must be against the PER-CHIP pace (25/s) even with 8
    # devices attached (the aggregate stage, skipped here, overwrites it)
    # value is rounded to 2 decimals, vs_baseline computed from the
    # unrounded rate: they can differ by up to 0.005/25 = 2e-4 absolute
    assert out["vs_baseline"] == pytest.approx(out["value"] / 25.0,
                                               abs=3e-4)
    # budget 45s is below every optional-stage threshold, so all four must
    # be skipped (the 8-device CPU mesh makes `aggregate` reachable)
    assert set(out["skipped_stages"]) == {
        "1000_classes", "aggregate", "int8_prefix", "busy_trace"}
    # the pre-flight probe ran (CPU self-test mode) and passed, and the
    # final headline is the window-campaign figure, not the provisional one
    assert out["probe_ok"] is True and out["probe_attempts"] >= 1
    assert "provisional" not in out
    # the settled default S=10 (PERF_NOTES "Default S") is recorded in the
    # artifact so every BENCH_r* figure is tied to its batch size
    assert out["sample_batch"] == 10


@pytest.mark.slow
def test_bench_dark_relay_structured_fallback():
    """A fully dark relay must still produce ONE parseable JSON line with
    exit 0 (VERDICT r3: BENCH_r03 shipped rc=3/parsed=null after an outage;
    a null artifact must be impossible). Simulated dark path: the probe
    command always fails and the 'connect' hangs past the budget."""
    import json
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               TTL_BENCH_PLATFORM="cpu", TTL_BENCH_ARCH="test-tiny",
               TTL_BENCH_BUDGET_S="10", TTL_BENCH_WATCHDOG_GRACE_S="3",
               TTL_BENCH_PROBE_CMD="false", TTL_BENCH_HANG_S="600")
    r = subprocess.run([sys.executable, str(root / "bench.py")],
                       capture_output=True, text=True, timeout=300, env=env,
                       cwd=root)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert out["error"] == "relay_dark"
    assert out["probe_ok"] is False and out["probe_attempts"] >= 2
    # context figure from the newest committed BENCH artifact, clearly
    # labeled as stale rather than presented as a fresh value
    assert out["last_known_good"]["value"] > 0
    assert "artifact" in out["last_known_good"]
    assert "NOT a fresh measurement" in out["note"]


@pytest.mark.slow
def test_perf_r02_busy_smoke():
    """tools/perf_r02.py --busy: the sweep tool's contention-free
    co-primary (busy ms/step from an xprof trace) must stay drivable on
    CPU at test-tiny, so S-sweep decisions are never wall-only again
    (PERF_NOTES measurement protocol)."""
    import json
    import os
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(root / "tools" / "perf_r02.py"), "fused",
         "--arch", "test-tiny", "--s", "4", "--classes", "5",
         "--windows", "1", "--iters", "2", "--busy", "--ops", "3"],
        capture_output=True, text=True, timeout=420, env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    (line,) = [ln for ln in r.stdout.strip().splitlines()
               if ln.startswith("{")]
    row = json.loads(line)
    assert row["samples_per_sec"] > 0
    assert row["busy_ms_per_step"] > 0
    assert row["busy_sps"] > 0
    # --ops bucket breakdown rides the same trace
    assert len(row["top_ops"]) == 3
    assert all(o["ms_per_step"] >= 0 for o in row["top_ops"])


@pytest.mark.slow
def test_bench_arches_contract():
    """tools/bench_arches.py: one command -> BENCH_ARCHES.json + one JSON
    line, rows measured under the bench.py discipline (VERDICT r3 next #4:
    the arch table must be reproducible, not manual-session lore)."""
    import json
    import os
    import pathlib
    import subprocess
    import sys
    import tempfile

    root = pathlib.Path(__file__).resolve().parent.parent
    out_path = pathlib.Path(tempfile.mkdtemp()) / "arches.json"
    env = dict(os.environ, TTL_BENCH_PLATFORM="cpu",
               TTL_BENCH_BUDGET_S="240", TTL_BENCH_WATCHDOG_GRACE_S="600")
    r = subprocess.run(
        [sys.executable, str(root / "tools" / "bench_arches.py"),
         "--rows", "test-tiny", "--classes", "5", "--s", "4",
         "--windows", "1", "--iters", "2", "--out", str(out_path)],
        capture_output=True, text=True, timeout=420, env=env, cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert len(lines) == 1, r.stdout
    out = json.loads(lines[0])
    assert out == json.loads(out_path.read_text())
    assert out["missing_rows"] == [] and out["probe_ok"] is True
    (row,) = out["rows"]
    assert row["arch"] == "test-tiny" and row["wall_sps"] > 0
    assert row["layer_range"] == [1, 3]  # arch-relative last-3 window


@pytest.mark.slow
def test_measure_mesh_aggregate():
    """The multi-device bench path: same program sharded over the full
    data mesh, rate measured over the whole (n_dev * per-chip) batch."""
    n_dev = jax.device_count()
    assert n_dev == 8  # conftest forces the 8-device CPU mesh
    S = 2 * n_dev
    args = _setup(S)
    mesh = make_mesh((n_dev,))
    sps = measure(TEST_TINY, CFG.replace(sample_batch=S), *args,
                  windows=1, iters=2, mesh=mesh)
    assert np.isfinite(sps) and sps > 0
