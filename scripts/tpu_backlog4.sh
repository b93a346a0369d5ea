#!/bin/sh
# Round-4 TPU sweep #1 (fires after tpu_backlog3.sh completes):
# 1. ESM vs PCF whole-frame A/B incl. the half-res-atlas ESM variant
#    (the round-4 gather-floor redesign, VERDICT r3 items 1+4).
# 2. High-poly Mtris/s row (--grid 33, ~530K tris) for BASELINE.md
#    (VERDICT r3 item 5 — r2 task #8's missing done-condition).
# 3. Honest flagship bench with ESM for the headline comparison.
set -x
cd "$(dirname "$0")/.."

run() { "$@" || { echo "RETRY: $*" >&2; sleep 90; "$@"; }; }

run python scripts/dbg_local.py esm
run python scripts/bench_highpoly.py --grid 33
run env LSR_BENCH_SHADOW_FILTER=esm python bench.py
echo "TPU BACKLOG4 COMPLETE"
