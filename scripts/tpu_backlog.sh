#!/bin/sh
# Serial TPU work backlog for round 3 (single chip — never parallel).
# Judge-facing runs FIRST (headline bench + full protocol re-baseline) in
# case the tunnel window is short; then the kernel A/Bs that inform
# production knob flips; then scaling/config/demo refreshes and a final
# warm bench.  Each step retries once (the first cold remote compile
# after a code change sometimes dies silently; the disk compile cache
# makes retries fast).
set -x
cd "$(dirname "$0")/.."

run() { "$@" || { echo "RETRY: $*" >&2; sleep 90; "$@"; }; }

run python bench.py
run sh scripts/run_phases_all.sh
run python scripts/dbg_local.py r3ab
run python scripts/dbg_local.py crop
run python scripts/dbg_local.py frame
run python scripts/dbg_shade.py
run python scripts/bench_highpoly.py
run python scripts/measure_configs.py
for d in hello_rendering_paths hello_local_shadows hello_shadows \
         hello_normal_mapping hello_ibl_skybox hello_shaders \
         hello_wireframe hello_blinn_phong hello_full_pipeline \
         hello_water hello_pixel_primitives hello_shading_models \
         hello_light_types hello_parallelization; do
    run python "demos/$d.py"
done
run python bench.py
echo "TPU BACKLOG COMPLETE"
