"""Profiling and tracing utilities.

The reference's only timing signal is a wall-clock AverageMeter
(ttl.py:302,357). Here:

- `trace(dir)` wraps a region in a jax.profiler trace (xplane output,
  viewable in XProf/TensorBoard);
- `op_stats(trace_dir)` parses the captured xplane into a per-op table
  (self-time, bound-by, FLOP rate) using the local xprof converter - the
  same analysis used to find the HBM-bound LN/attention ops in this repo's
  perf work;
- `phase_timer` is a lightweight named wall-clock accumulator for the eval
  loop phases (decode / view-gen / adapt / fetch).
"""
from __future__ import annotations

import contextlib
import glob
import json
import time
from collections import defaultdict
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    with jax.profiler.trace(log_dir):
        yield


def _device_rows(trace_dir: str):
    """Parse the newest xplane in trace_dir into (device_rows, col_fn), or
    None when no converter/trace is available. Internal helper shared by
    op_stats and device_busy_us."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        try:
            from tensorboard_plugin_profile.convert import \
                raw_to_tool_data as rtd
        except ImportError:
            return None
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        return None
    data, _ = rtd.xspace_to_tool_data([files[-1]], "framework_op_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())[0]
    ids = [c["id"] for c in table["cols"]]
    rows = [[c["v"] if c else None for c in r["c"]] for r in table["rows"]]

    def col(r, name):
        return r[ids.index(name)]

    dev = [r for r in rows if col(r, "host_or_device") == "Device"]
    return dev, col


def op_stats(trace_dir: str, top: int = 15) -> List[Dict]:
    """Summarize the newest xplane in trace_dir: top device ops by
    self-time. Returns a list of dicts; prints nothing."""
    parsed = _device_rows(trace_dir)
    if parsed is None:
        return []
    dev, col = parsed
    total = sum(float(col(r, "total_self_time") or 0) for r in dev)
    dev.sort(key=lambda r: -float(col(r, "total_self_time") or 0))
    out = []
    for r in dev[:top]:
        st = float(col(r, "total_self_time") or 0)
        out.append({
            "operation": col(r, "operation"),
            "type": col(r, "type"),
            "self_time_us": st,
            "fraction": st / total if total else 0.0,
            "bound_by": col(r, "bound_by"),
            "occurrences": col(r, "occurrences"),
        })
    return out


def device_busy_us(trace_dir: str):
    """UNTRUNCATED non-IDLE device self-time (us) summed over every device
    op in the newest xplane, or None when no trace/converter is available.

    Decision-bearing busy figures must use this rather than summing a
    truncated op_stats(top=N) listing, which silently drops ops beyond N
    and inflates the derived busy-sps (ADVICE r4)."""
    parsed = _device_rows(trace_dir)
    if parsed is None:
        return None
    dev, col = parsed
    if not dev:
        return None
    return sum(float(col(r, "total_self_time") or 0) for r in dev
               if col(r, "operation") != "IDLE")


class PhaseTimer:
    """Named wall-clock accumulator: with timer.phase("adapt"): ..."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {self.totals[k]:.3f}s/{self.counts[k]}"
            for k in sorted(self.totals))
