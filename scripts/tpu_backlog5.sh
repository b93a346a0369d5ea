#!/bin/bash
# Round-5 protocol re-baseline at HEAD (VERDICT r4 items 2-4) + remaining
# hardware A/Bs.  Run AFTER the perf defaults are settled so every
# committed artifact carries a HEAD run_id.  Sequential: one TPU process
# at a time (tunnel contention corrupts timing).
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5

# 0. ESM attribution at HEAD (VERDICT item 4): one interleaved best-of-3
#    over pcf-ref / esm-ref / esm-promoted / esm-promoted-r4crop with
#    parity deltas.  (The crashed 20260820T0346 run produced r0-only rows;
#    this is the clean replacement.  resolve variant dropped: VMEM OOM.)
timeout 2400 python scripts/dbg_local.py attr \
    2>&1 | tee /tmp/r5/attr.log

# 1. Fresh goldens for the shipping kernels (r4 verdict: the committed
#    hashes predate chunk=8/apow1 and the static light-type
#    specialization; re-record, don't just verify).
timeout 1800 python scripts/tpu_goldens.py --update \
    2>&1 | tee /tmp/r5/goldens.log

# 2. Phases at protocol on the production ESM stack: goldens gate
#    (verify mode now), Phase I + stats + ssao rows, Phase I-posts,
#    Phase F + F_pass rows, Phase G soak with G_control rows.
LSR_PHASE_FILTER=esm timeout 7200 python scripts/run_phases.py \
    2>&1 | tee /tmp/r5/phases_esm.log

# 3. Phase F in the reference-exact PCF mode (both filter modes recorded;
#    skip the phases already covered above).
LSR_PHASE_FILTER=pcf LSR_PHASE_I=0 LSR_PHASE_I_POSTS=0 LSR_PHASE_G=0 \
    LSR_PHASE_GOLDENS=0 timeout 5400 python scripts/run_phases.py \
    2>&1 | tee /tmp/r5/phases_pcf.log

# 4. High-poly setup attribution (VERDICT item 6 groundwork).
timeout 1800 python scripts/dbg_setup2.py 33 2>&1 | tee /tmp/r5/setup2.log

# 5. End-of-round flagship bench on the promoted defaults.
timeout 2400 python bench.py 2>&1 | tee /tmp/r5/bench.log
