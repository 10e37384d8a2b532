"""Contract tests for the round-5 measurement tools (CPU drive).

Both tools carry decision-bearing evidence (VITL_CEILING.json,
UPLOAD_AB.json); these pin their CLI surface and arithmetic so they stay
drivable without TPU hardware, the same way tests/test_bench.py pins
bench.py.
"""
import json
import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_vitl_ceiling_floor_derivation():
    """--floor-only: the exact-FLOP derivation, including the built-in
    cross-check that the formula reproduces the ViT-B accounting
    (PERF_NOTES 'Ceiling accounting': 1.68 TFLOP 9-layer/64-view prefix,
    ~2.9 TFLOP/sample)."""
    env = dict(os.environ, TTL_BENCH_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "vitl_ceiling.py"),
         "--floor-only"],
        capture_output=True, text=True, timeout=300, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout[r.stdout.index("{"):])
    f = out["floor"]
    assert f["arch"] == "ViT-L/14"
    assert (f["layers"], f["hidden"], f["heads"], f["tokens"]) == \
        (24, 1024, 16, 257)
    assert f["window"] == [21, 23]  # arch-relative default
    # the recorded VITL_CEILING.json numbers (drift here = the derivation
    # changed and the PERF_NOTES section must be re-verified)
    assert f["total_tflop_per_sample"] == pytest.approx(11.774, abs=0.01)
    assert f["absolute_sps_ceiling"] == pytest.approx(16.73, abs=0.05)


@pytest.mark.slow
def test_upload_ab_cpu_contract(tmp_path):
    """The A/B tool runs both arms through the real evaluate_dataset path
    and emits one summary JSON with both rates."""
    out_path = tmp_path / "ab.json"
    env = dict(os.environ, TTL_BENCH_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "upload_ab.py"),
         "--arch", "test-tiny", "--n", "8", "--s", "4", "--canvas", "128",
         "--repeats", "1", "--out", str(out_path)],
        capture_output=True, text=True, timeout=540, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(out_path.read_text())
    assert out["overlap_on_sps"] > 0 and out["overlap_off_sps"] > 0
    assert out["speedup"] == pytest.approx(
        out["overlap_on_sps"] / out["overlap_off_sps"], rel=0.01)
    # the env toggle must not leak out of the tool into later runs
    arms = [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{") and '"arm"' in ln]
    assert {a["arm"] for a in arms} == {"on", "off"}


@pytest.mark.slow
def test_bucket_ab_cpu_contract(tmp_path):
    """Canvas-bucket A/B: both arms through evaluate_dataset, one summary
    JSON with both rates (bit-identical accuracy is pinned separately by
    tests/test_end_to_end.py::test_bucket_canvas_does_not_change_results)."""
    out_path = tmp_path / "ab.json"
    env = dict(os.environ, TTL_BENCH_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "bucket_ab.py"),
         "--arch", "test-tiny", "--n", "8", "--s", "4",
         "--repeats", "1", "--out", str(out_path)],
        capture_output=True, text=True, timeout=540, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(out_path.read_text())
    assert out["buckets_on_sps"] > 0 and out["buckets_off_sps"] > 0
    assert out["speedup"] == pytest.approx(
        out["buckets_on_sps"] / out["buckets_off_sps"], rel=0.01)
