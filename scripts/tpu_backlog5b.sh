#!/bin/bash
# Round-5 backlog, remainder (attr ran standalone): setup2 moved FIRST so
# the high-poly setup attribution lands early enough in the round to act
# on (VERDICT item 6); then the protocol re-baseline at HEAD.  Sequential:
# one TPU process at a time (tunnel contention corrupts timing).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5

# 1. High-poly setup sub-stage attribution (VERDICT item 6 groundwork).
timeout 1800 python scripts/dbg_setup2.py 33 2>&1 | tee /tmp/r5/setup2.log

# 2. Fresh goldens for the shipping kernels (r4 verdict: the committed
#    hashes predate chunk=8/apow1 and the static light-type
#    specialization; re-record, don't just verify).
timeout 1800 python scripts/tpu_goldens.py --update \
    2>&1 | tee /tmp/r5/goldens.log

# 3. Phases at protocol on the production ESM stack: goldens gate
#    (verify mode now), Phase I + stats + ssao rows, Phase I-posts,
#    Phase F + F_pass rows, Phase G soak with G_control rows.
LSR_PHASE_FILTER=esm timeout 7200 python scripts/run_phases.py \
    2>&1 | tee /tmp/r5/phases_esm.log

# 4. Phase F in the reference-exact PCF mode (both filter modes recorded;
#    skip the phases already covered above).
LSR_PHASE_FILTER=pcf LSR_PHASE_I=0 LSR_PHASE_I_POSTS=0 LSR_PHASE_G=0 \
    LSR_PHASE_GOLDENS=0 timeout 5400 python scripts/run_phases.py \
    2>&1 | tee /tmp/r5/phases_pcf.log

# 5. End-of-round flagship bench on the promoted defaults.
timeout 2400 python bench.py 2>&1 | tee /tmp/r5/bench.log
