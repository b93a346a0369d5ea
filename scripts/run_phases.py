"""Phase F/G/I harness runner over the real renderer.

The analog of hello_rendering_paths' env-configured harness phases:
- Phase I: per-composition headless renders at 320x180, LDR-hashed across
  our two rasterizer backends (Pallas direct kernel vs pure-XLA brute) —
  the cross-backend image parity check,
- Phase F: warmup+sampled frame timing per composition -> JSONL,
- Phase G: short soak cycling compositions with light-count perturbation.

Env knobs: LSR_PHASE_{F,G,I}=0/1, LSR_PHASE_W/H, LSR_PHASE_F_WARMUP/SAMPLES,
LSR_PHASE_G_SECONDS.  Artifacts land in artifacts/*.jsonl.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import functools

import numpy as np


def build_compositions(width, height):
    import jax
    import jax.numpy as jnp

    from lsr_tpu.core import math3d as m3
    from lsr_tpu.io.obj import load_obj, make_plane
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.brute import rasterize_brute
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import SceneBuilder, make_camera
    from lsr_tpu.shading.common import make_materials
    from lsr_tpu.shading.models import (
        SHADING_MODELS,
        composite_over_background,
        make_shade_context,
    )

    monkey = load_obj(
        "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"
    )
    sb = SceneBuilder()
    sb.add(monkey, np.asarray(m3.translate([0, 0.2, 0]) @ m3.rotate_y(0.5)))
    sb.add(monkey, np.asarray(m3.translate([-2.0, 0.2, 1.5]) @ m3.rotate_y(2.0)),
           material=1)
    sb.add(make_plane(6.0, y=-1.0), material=2, casts_shadow=False)
    geom, objects = sb.build()
    cam = make_camera(width, height, (0.6, 1.6, -4.5), (0, 0, 0))

    lb = LightSetBuilder()
    rng = np.random.default_rng(4)
    for _ in range(32):
        lb.point(tuple(rng.uniform([-3, 0.2, -3], [3, 2, 3]).tolist()),
                 color=tuple(rng.uniform(0.3, 1.0, 3).tolist()),
                 intensity=1.4, range=2.4)
    lights = lb.build()
    mats = make_materials(
        base_color=[(0.85, 0.5, 0.3), (0.4, 0.65, 0.85), (0.55, 0.56, 0.6)],
        roughness=[0.4, 0.3, 0.8], metallic=[0.05, 0.4, 0.0])
    ctx = make_shade_context(mats, light_dir_ws=(0.35, -0.7, 0.5),
                             camera_pos=(0.6, 1.6, -4.5), light_intensity=2.2)

    def setup_for(vp):
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, width, height)

    def vp_at(i):
        a = 0.03 * jnp.asarray(i, jnp.float32)
        c = make_camera(width, height,
                        jnp.stack([0.6 + 0.2 * jnp.sin(a),
                                   jnp.float32(1.6), jnp.float32(-4.5)]),
                        (0, 0, 0))
        return c

    def forward_frame(i, backend, model):
        c = vp_at(i)
        setup = setup_for(c.viewproj)
        if backend == "pallas_direct":
            depth, tid, _ = rasterize_direct(setup, width, height, c.zn, c.zf)
        else:
            depth, tid = rasterize_brute(setup, width, height, c.zn, c.zf)
        gb = interpolate_gbuffer(setup, depth, tid)
        shaded = SHADING_MODELS[model](gb, ctx)
        bg = jnp.broadcast_to(jnp.asarray((0.05, 0.07, 0.12), jnp.float32),
                              shaded.shape)
        return tonemap_pass(composite_over_background(shaded, gb, bg))

    def fplus_frame(i, backend, mode):
        c = vp_at(i)
        setup = setup_for(c.viewproj)
        if backend == "pallas_direct":
            depth, tid, _ = rasterize_direct(setup, width, height, c.zn, c.zf)
        else:
            depth, tid = rasterize_brute(setup, width, height, c.zn, c.zf)
        gb = interpolate_gbuffer(setup, depth, tid)
        # Both backends use the SAME light accumulation (the fused kernel)
        # so the parity hash isolates the rasterizer difference; kernel-vs-XLA
        # accumulation equivalence is covered by unit tests at 3e-4 tolerance
        # (different fp op order => not hash-identical by design).
        hdr, _ = shade_forward_plus(
            gb, ctx, lights, c.view, c.proj, c.zn, c.zf, width, height,
            tile_size=16, cap=64, mode=mode, use_kernel=True,
        )
        return tonemap_pass(hdr)

    jit = functools.partial(jax.jit, static_argnames=("backend", "model"))
    jitf = functools.partial(jax.jit, static_argnames=("backend", "mode"))
    forward_j = jit(forward_frame)
    fplus_j = jitf(fplus_frame)

    comps = {
        "forward_blinn": {
            "pallas_direct": lambda i: forward_j(i, backend="pallas_direct",
                                                 model="blinn_phong"),
            "xla_brute": lambda i: forward_j(i, backend="xla_brute",
                                             model="blinn_phong"),
        },
        "forward_pbr": {
            "pallas_direct": lambda i: forward_j(i, backend="pallas_direct",
                                                 model="pbr_mr"),
            "xla_brute": lambda i: forward_j(i, backend="xla_brute",
                                             model="pbr_mr"),
        },
        "forward_plus_tiled": {
            "pallas_direct": lambda i: fplus_j(i, backend="pallas_direct",
                                               mode="tiled"),
            "xla_brute": lambda i: fplus_j(i, backend="xla_brute",
                                           mode="tiled"),
        },
    }
    return comps


def main():
    from lsr_tpu.utils.harness import (
        SoakAcceptance,
        run_backend_parity,
        run_benchmark,
        run_soak,
    )

    width = int(os.environ.get("LSR_PHASE_W", "320"))
    height = int(os.environ.get("LSR_PHASE_H", "180"))
    comps = build_compositions(width, height)

    if os.environ.get("LSR_PHASE_I", "1") == "1":
        res = run_backend_parity(comps, warmup=2, samples=6)
        for name, r in res.items():
            print(f"phase I {name}: match={r['match']}")

    if os.environ.get("LSR_PHASE_F", "1") == "1":
        warmup = int(os.environ.get("LSR_PHASE_F_WARMUP", "10"))
        samples = int(os.environ.get("LSR_PHASE_F_SAMPLES", "30"))
        for name, backends in comps.items():
            r = run_benchmark(name, backends["pallas_direct"],
                              warmup=warmup, samples=samples,
                              meta={"w": width, "h": height})
            print(f"phase F {name}: avg {r.ms_avg:.2f} ms "
                  f"({1000.0 / r.ms_avg:.1f} fps)")

    if os.environ.get("LSR_PHASE_G", "1") == "1":
        secs = float(os.environ.get("LSR_PHASE_G_SECONDS", "20"))
        soak_comps = {n: b["pallas_direct"] for n, b in comps.items()}
        rep = run_soak(soak_comps, duration_s=secs, frames_per_cycle=30,
                       acceptance=SoakAcceptance(max_avg_frame_ms=100.0))
        print(f"phase G: {rep}")


if __name__ == "__main__":
    main()
