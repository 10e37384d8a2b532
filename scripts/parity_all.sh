#!/usr/bin/env bash
# One-command accuracy parity vs the reference's full published table
# (/root/reference/README.md:92-101; BASELINE.md). Wraps tools/parity_all.py:
# download (egress required) -> convert -> cached .npz -> every runnable
# published-row config, each with per-set Top-1 assertions at +-0.3%.
#
#   ./scripts/parity_all.sh DATA_ROOT                      # downloads ViT-B/16
#   ./scripts/parity_all.sh DATA_ROOT --ckpt ViT-B-16.pt   # local checkpoint
#   ./scripts/parity_all.sh DATA_ROOT --coop_ckpt coop.pth --cocoop_ckpt c.pth
#
# DATA_ROOT layout is the reference's (docs/MIGRATION.md section 4):
#   imagenet-adversarial/imagenet-a/             IN-A     (TTL 60.51 +-0.3)
#   imagenetv2-matched-frequency-format-val/     IN-V2    (TTL 64.55 +-0.3)
#   imagenet-rendition/imagenet-r/               IN-R     (TTL 77.54 +-0.3)
#   sketch/images/                               IN-Sketch(TTL 48.61 +-0.3)
#   imagenet/images/val/                         add --test_sets I/A/V/R/K
#
# Exit 0 = every attempted row within tolerance; details in
# PARITY_RESULTS.json. The coop/cocoop rows are skipped (with a reason)
# unless their trained prompt checkpoints are supplied.
set -euo pipefail
DATA=${1:?usage: parity_all.sh DATA_ROOT [tools/parity_all.py flags...]}
shift
exec python "$(dirname "$0")/../tools/parity_all.py" "$DATA" "$@"
