#!/bin/sh
# Follow-up serial TPU backlog (runs after tpu_backlog.sh finishes):
# 1. dbg_pipe — localize the pipeline-vs-hand-frame perf gap (Phase F is
#    ~2x slower per pixel than bench.py on a lighter scene) + the Phase G
#    soak anomaly (1275 ms/frame at 320x180).
# 2. tpu goldens — confirm the per-chunk shadowed-flag shade-kernel commit
#    is bit-exact under Mosaic on hardware.
set -x
cd "$(dirname "$0")/.."

run() { "$@" || { echo "RETRY: $*" >&2; sleep 90; "$@"; }; }

run python scripts/dbg_local.py r3ab
run python scripts/dbg_vis3.py
run python scripts/dbg_pipe.py all
run python scripts/tpu_goldens.py
echo "TPU BACKLOG2 COMPLETE"
