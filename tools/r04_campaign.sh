#!/usr/bin/env bash
# Round-4 quiet-window measurement campaign: every TPU figure this round
# needs, in priority order, each self-bounded - run it whenever the relay
# answers (tools/relay_probe.py gates it). Outputs land in /tmp/r04/ and
# the repo-root artifacts (BENCH_ARCHES.json).
#
#   ./tools/r04_campaign.sh            # everything
#   ./tools/r04_campaign.sh bench      # one stage
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r04
STAGE=${1:-all}

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  if [[ "$STAGE" != all && "$STAGE" != "$name" ]]; then return 0; fi
  echo "=== $name (timeout ${t}s) ==="
  timeout "$t" "$@" 2>/tmp/r04/$name.err | tee /tmp/r04/$name.out
  echo "=== $name rc=$? ==="
}

if ! timeout 120 python tools/relay_probe.py --timeout 90; then
  echo "relay dark - retry later"; exit 2
fi

run bench       900 python bench.py
run arches     1700 python tools/bench_arches.py
run attn_floor  900 python tools/attn_floor.py --b 64 512
run coldstart  1300 python tools/serve_coldstart.py --runs 2
run quant1000  1800 python tools/quant_fidelity.py --samples 512 --classes 1000
# S sweet-spot: 1000-class validation before any default change (NEXT_STEPS).
# --busy: wall alone is not evidence on this relay (measurement protocol).
run s10        900 python tools/perf_r02.py fused --s 10 --classes 1000 --windows 3 --busy
run s12        900 python tools/perf_r02.py fused --s 12 --classes 1000 --windows 3 --busy
echo "campaign done; outputs in /tmp/r04/"
