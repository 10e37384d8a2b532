#!/usr/bin/env bash
# Full-dimension multi-chip certification (opt-in; VERDICT r4 next #1).
#
# Runs the complete dryrun_multichip(8) INCLUDING the full-dim ViT-B/16
# fused LoRA step on the {data:4, model:2} virtual CPU mesh. The full-dim
# stage is ~13-20 min of XLA:CPU GSPMD compile cold (the persistent cache
# does not cover it), which is why the driver's default dryrun skips it —
# this script is the reproducible way to re-certify after touching the
# sharding layout (parallel/mesh.py), the fused program (adapt/ttl.py), or
# the model defs (models/clip.py).
set -euo pipefail
cd "$(dirname "$0")/.."
exec env JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    TTL_DRYRUN_FULLDIM=1 \
    timeout "${CERTIFY_TIMEOUT:-2400}" \
    python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
