"""A/B: PluggablePipeline frame vs hand-built flagship frame, SAME workload.

Phase F records the pipeline's forward+ frame at ~237 ms @720p (48 lights,
2 monkeys) while bench.py's hand-built frame measures 263 ms @1080p with
256 lights and 25 monkeys — the pipeline is ~2x slower per pixel on a much
lighter scene.  This script measures, in ONE process on the real chip:

  1. pipeline execute_jitted @720p        (the Phase F configuration)
  2. hand frame (bench.make_flagship_frame) @720p on the SAME scene_state
  3. pipeline execute_jitted @320x180     (the Phase G soak configuration)
  4. per-pass segmented attribution of (1)

Timing: slope method (utils/devtime) — tunnel-floor-free.

Run: python scripts/dbg_pipe.py [all|ab|soak|seg]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax

    from scripts.run_phases import build_preset_pipelines
    from lsr_tpu.utils.devtime import probe, slope_ms

    W, H = 1280, 720

    if which in ("all", "ab", "seg"):
        comps, pipes = build_preset_pipelines(
            W, H, {"forward_plus"}, with_pipes=True)
        fn = comps["forward_plus"]
        probe(fn(0))

        # 1) pipeline @720p, frame index cycling like Phase F
        idx = {"i": 0}

        def pipe_frame():
            out = fn(idx["i"])
            idx["i"] = (idx["i"] + 1) % 24
            return out

        _, pipe_ms = slope_ms(pipe_frame, iters=(3, 9))
        print(f"{'pipeline forward_plus @720p':44s} {pipe_ms:8.2f} ms",
              flush=True)

        # 2) hand frame on the SAME scene
        from bench import make_flagship_frame
        from scripts.run_phases import _staged_camera, scene_state

        base = scene_state(W, H)
        from lsr_tpu.lighting.local_shadows import default_vis_crop

        frame, spot_ids, point_ids = make_flagship_frame(
            base["geom"], base["objects"], base["lights"],
            base["shade_ctx"], W, H,
            shadow_size=2048, local_map=1024, local_point=512,
            vis_crop=default_vis_crop(H, W))
        frame_j = jax.jit(frame)
        cams = [_staged_camera(W, H, i) for i in range(24)]
        probe(frame_j(cams[0], base["shade_ctx"]))
        jdx = {"i": 0}

        def hand_frame():
            out = frame_j(cams[jdx["i"]], base["shade_ctx"])
            jdx["i"] = (jdx["i"] + 1) % 24
            return out

        _, hand_ms = slope_ms(hand_frame, iters=(3, 9))
        print(f"{'hand flagship frame @720p (same scene)':44s} "
              f"{hand_ms:8.2f} ms", flush=True)
        print(f"# pipeline / hand = {pipe_ms / max(hand_ms, 1e-6):.2f}x",
              flush=True)

        if which in ("all", "seg"):
            from lsr_tpu.pipeline.executor import RenderContext

            pipe, fp, state_fn = pipes["forward_plus"]
            ctx2 = RenderContext()
            pipe.execute_segmented(ctx2, state_fn(0), fp, iters=(1, 3))
            for k, v in sorted(ctx2.debug.pass_ms.items(),
                               key=lambda kv: -kv[1]):
                print(f"  seg {k:28s} {v:8.2f} ms", flush=True)

    if which in ("all", "soak"):
        comps2 = build_preset_pipelines(320, 180, {"forward_classic"})
        fn2 = comps2["forward_classic"]
        probe(fn2(0))
        kdx = {"i": 0}

        def soak_frame():
            out = fn2(kdx["i"])
            kdx["i"] = (kdx["i"] + 1) % 24
            return out

        _, soak_ms = slope_ms(soak_frame, iters=(3, 9))
        print(f"{'pipeline forward_classic @320x180 (soak)':44s} "
              f"{soak_ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
