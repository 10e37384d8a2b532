#!/usr/bin/env bash
# Round-5 measurement campaign: every TPU figure of the kernel-era default,
# in priority order, each self-bounded — run it whenever the relay answers
# (tools/relay_probe.py gates it). Outputs land in /tmp/r05/ and the
# repo-root artifacts (BENCH_ARCHES.json, VITL_CEILING*.json,
# ATTN_BWD_FLOOR results).
#
#   ./tools/r05_campaign.sh                 # everything
#   ./tools/r05_campaign.sh bench quant_vitl  # a subset, in script order
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r05
STAGES=${*:-all}

run() { # name timeout cmd...
  local name=$1 t=$2; shift 2
  if [[ "$STAGES" != all && " $STAGES " != *" $name "* ]]; then return 0; fi
  echo "=== $name (timeout ${t}s) ==="
  timeout "$t" "$@" 2>/tmp/r05/$name.err | tee /tmp/r05/$name.out
  echo "=== $name rc=$? ==="
}

if ! timeout 120 python tools/relay_probe.py --timeout 90; then
  echo "relay dark - retry later"; exit 2
fi

run bench        900 python bench.py
run arches      1700 python tools/bench_arches.py
run vitl        1300 python tools/vitl_ceiling.py
run vitl_int8   1300 python tools/vitl_ceiling.py --prefix_quant int8 \
                     --out VITL_CEILING_INT8.json
run attn_bwd    1200 python tools/attn_bwd_floor.py
run mesh1        900 python tools/drive_mesh1_kernel.py
run coldstart   1300 python tools/serve_coldstart.py --runs 2
run attn_ab     1800 python tools/attn_ab.py
run bucket_ab   1200 python tools/bucket_ab.py --out BUCKET_AB.json
run quant_vitl  1800 python tools/quant_fidelity.py --arch ViT-L/14 \
                     --samples 256 --classes 200 --sample_batch 4
