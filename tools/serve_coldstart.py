#!/usr/bin/env python
"""Serve cold-start measurement (VERDICT r3 next #9 / NEXT_STEPS r4 #0).

Times `python -m ttl_tpu.serve` from process start to the READY line
("ttl_tpu serving on ..."), then the first-request latency - the serving
counterpart of the 18 s warm CLI startup claim. Startup on the relay is
RTT-bound (PERF_NOTES: eager init cost ~73 s before the jitted-init fix),
and relay *connection* degradation inflates exactly this number, so the
tool probes first and refuses to report from a slow-connect window.

Usage: python tools/serve_coldstart.py [--arch ViT-B/16] [--runs 2]
       TTL_BENCH_PLATFORM=cpu python tools/serve_coldstart.py --arch test-tiny

Prints one JSON line; paste into PERF_NOTES.md.
"""
import argparse
import io
import json
import os
import pathlib
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def one_run(args, env) -> dict:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    cmd = [sys.executable, "-m", "ttl_tpu.serve", "--port", str(port),
           "--arch", args.arch, "--sample_batch", str(args.sample_batch)]
    if args.arch == "test-tiny":
        cmd += ["--resolution", "64"]
    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True, cwd=ROOT,
                            env=env)
    try:
        # READY marker, watched from a reader thread: a hung relay connect
        # prints nothing, and a blocking readline on the main thread would
        # ignore --timeout entirely (the deadline must fire with NO output)
        import threading
        got_ready = threading.Event()
        ready_at = [None]

        def watch():
            for line in proc.stdout:
                if "ttl_tpu serving on" in line:
                    ready_at[0] = time.time() - t0
                    got_ready.set()
                    return
            got_ready.set()  # EOF: process died

        threading.Thread(target=watch, daemon=True).start()
        got_ready.wait(args.timeout)
        ready = ready_at[0]
        if ready is None:
            return {"error": f"no READY line within {args.timeout:.0f}s"}

        from PIL import Image
        img = Image.fromarray((np.random.RandomState(0)
                               .rand(224, 224, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG")
        t1 = time.time()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=args.timeout) as r:
            out = json.loads(r.read())
        assert "label" in out, out
        return {"ready_s": round(ready, 1),
                "first_request_s": round(time.time() - t1, 2)}
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--sample_batch", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2,
                    help="fresh-process runs (first may pay compile; the "
                         "best is the warm cold-start figure)")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    env = dict(os.environ)
    if os.environ.get("TTL_BENCH_PLATFORM"):
        env["JAX_PLATFORMS"] = os.environ["TTL_BENCH_PLATFORM"]

    # connection-health gate: cold start is only comparable on a
    # verified-fast-connect window (PERF_NOTES outage anatomy)
    if not os.environ.get("TTL_BENCH_PLATFORM"):
        probe = subprocess.run(
            [sys.executable, str(ROOT / "tools" / "relay_probe.py"),
             "--timeout", "60"], capture_output=True, text=True)
        if probe.returncode != 0:
            print(json.dumps({"error": "relay_dark_or_degraded",
                              "detail": probe.stderr.strip()[-200:]}))
            sys.exit(2)
        print(f"probe: {probe.stdout.strip()}", file=sys.stderr)

    runs = []
    for i in range(args.runs):
        r = one_run(args, env)
        runs.append(r)
        print(f"run {i}: {r}", file=sys.stderr, flush=True)
    good = [r for r in runs if "ready_s" in r]
    out = {"arch": args.arch, "runs": runs}
    if good:
        out["best_ready_s"] = min(r["ready_s"] for r in good)
        out["best_first_request_s"] = min(r["first_request_s"] for r in good)
    print(json.dumps(out))
    sys.exit(0 if good else 1)


if __name__ == "__main__":
    main()
