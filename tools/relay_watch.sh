#!/usr/bin/env bash
# Watch the relay and auto-fire the current measurement campaign on the
# first healthy probe. Bounded: gives up after MAX_S seconds (default 10h).
# Log: /tmp/relay_watch.log   Campaign outputs: /tmp/r05/ + repo artifacts.
# Override the campaign with RELAY_WATCH_CAMPAIGN=./tools/r04_campaign.sh.
set -u
cd "$(dirname "$0")/.."
MAX_S=${RELAY_WATCH_MAX_S:-36000}
INTERVAL=${RELAY_WATCH_INTERVAL_S:-180}
start=$(date +%s)
attempt=0
while :; do
  attempt=$((attempt + 1))
  now=$(date +%s)
  if (( now - start > MAX_S )); then
    echo "[relay_watch] giving up after ${attempt} attempts / $((now-start))s"
    exit 2
  fi
  echo "[relay_watch] probe attempt ${attempt} at $(date -u +%H:%M:%S)"
  if timeout 120 python tools/relay_probe.py --timeout 90 >/tmp/relay_probe_last.log 2>&1; then
    echo "[relay_watch] relay HEALTHY at $(date -u +%H:%M:%S) - firing campaign"
    "${RELAY_WATCH_CAMPAIGN:-./tools/r05_campaign.sh}" "${@:-all}"
    rc=$?
    echo "[relay_watch] campaign rc=$rc"
    exit $rc
  fi
  sleep "$INTERVAL"
done
