#!/usr/bin/env python
"""Probe the tunneled TPU relay before committing to a long device run.

The relay goes fully dark for 15-60 min at a time (PERF_NOTES.md measurement
protocol): dispatch still "works" but even a tiny device->host fetch hangs
forever. Run this (it self-bounds via SIGALRM) before bench/perf/parity runs:

  python tools/relay_probe.py [--timeout 90]

Exit 0 and a latency line if the relay answers a matmul+fetch within the
timeout; exit 2 with a diagnostic if it does not (do CPU work, retry later -
a hang here is a relay outage, not a bug in this repo).
"""
import argparse
import os
import signal
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=float, default=90.0,
                    help="seconds before declaring the relay dark")
    ap.add_argument("--cpu", action="store_true",
                    help="probe the CPU backend instead (self-test)")
    args = ap.parse_args()

    def dark(how: str):
        print(f"RELAY DARK: no matmul+fetch round trip within "
              f"{args.timeout:.0f}s ({how}) - do CPU work and retry later "
              f"(PERF_NOTES.md measurement protocol)", file=sys.stderr,
              flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, lambda s, f: dark("alarm"))
    # setitimer keeps fractional timeouts; alarm(int(0.5)) would be
    # alarm(0), i.e. no timeout at all
    signal.setitimer(signal.ITIMER_REAL, args.timeout)
    # second line of defense: SIGALRM is only delivered when the main
    # thread re-enters Python, and a hard connect-phase hang can block in C
    # past that (observed on the relay) - a watchdog thread still runs
    import threading
    t = threading.Timer(args.timeout + 10, dark, args=("watchdog thread",))
    t.daemon = True
    t.start()

    import numpy as np

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    dev = jax.devices()
    x = jax.jit(lambda a: a @ a)(jax.numpy.ones((128, 128)))
    first = np.asarray(x)[0, 0]
    t1 = time.time()
    # second fetch separates process/tunnel startup from steady-state RTT
    y = jax.jit(lambda a: a * 2)(jax.numpy.ones((8,)))
    np.asarray(y)
    t2 = time.time()
    signal.setitimer(signal.ITIMER_REAL, 0)
    print(f"relay ok: {dev[0].platform}:{dev[0].device_kind} "
          f"startup+compile+fetch {t1 - t0:.1f}s, "
          f"steady fetch {t2 - t1:.2f}s "
          f"(result {first:.0f})")


if __name__ == "__main__":
    main()
