"""Flagship benchmark: Forward+ tiled, 256 lights, multi-monkey @1080p.

Mirrors the reference's flagship workload (hello_rendering_paths.cpp:89-99:
1280x720 default / our north-star 1920x1080, 16-px light tiles, <=128 lights
per tile) measured Phase-F style (warmup + sampled frames).

The frame is the HONEST flagship composition (hello_rendering_paths.cpp:8360
frame structure): sun shadow map (2048^2, PCF r2) re-rendered every frame +
raster + G-buffer interp + forward+ (sun w/ shadow visibility + 256 binned
local lights) + tonemap + FXAA, with a moving camera so no frame-invariant
work can be hoisted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the 60 FPS north-star target (BASELINE.md) since the
reference publishes no numbers.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import json

import numpy as np


def build_scene():
    import jax.numpy as jnp

    from lsr_tpu.core import math3d as m3
    from lsr_tpu.io.fast_obj import load_obj_fast as load_obj
    from lsr_tpu.io.obj import make_plane
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.scene.scene import SceneBuilder
    from lsr_tpu.shading.common import checkerboard_texture, make_materials
    from lsr_tpu.shading.models import make_shade_context

    monkey = load_obj(
        "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"
    )
    rng = np.random.default_rng(42)
    sb = SceneBuilder()
    grid = 5
    for i in range(grid * grid):
        x = (i % grid - grid // 2) * 2.4
        z = (i // grid - grid // 2) * 2.4
        rot = float(rng.uniform(0, 2 * np.pi))
        sb.add(monkey, np.asarray(
            m3.translate([x, 0.0, z]) @ m3.rotate_y(rot)), material=i % 4)
    sb.add(make_plane(10.0, y=-1.0), material=4, casts_shadow=False)
    geom, objects = sb.build()

    lb = LightSetBuilder()
    n_lights = int(os.environ.get("LSR_BENCH_LIGHTS", "256"))
    # The shadow budget picks the FIRST 8 spots + 2 points in visit order
    # (plan_shadow_casters); emit those first so the budgeted casters sit
    # over the scene like the reference workload.
    for i in range(8):
        x, z = float(rng.uniform(-5, 5)), float(rng.uniform(-5, 5))
        color = tuple(rng.uniform(0.2, 1.0, 3).tolist())
        lb.spot((x, 3.0, z), (0, -1, 0), color=color, intensity=2.4,
                range=5.0, inner_angle=0.4, outer_angle=0.7)
    for i in range(2):
        x, z = float(rng.uniform(-3, 3)), float(rng.uniform(-3, 3))
        lb.point((x, 1.2, z), color=tuple(rng.uniform(0.2, 1.0, 3).tolist()),
                 intensity=1.8, range=3.5)
    for i in range(max(0, n_lights - 10)):
        x = float(rng.uniform(-7, 7))
        z = float(rng.uniform(-7, 7))
        y = float(rng.uniform(0.2, 2.2))
        color = tuple(rng.uniform(0.2, 1.0, 3).tolist())
        if i % 4 == 0:
            lb.spot((x, y + 1.0, z), (0, -1, 0), color=color, intensity=2.0,
                    range=3.5, inner_angle=0.35, outer_angle=0.6)
        else:
            lb.point((x, y, z), color=color, intensity=1.5, range=2.5)
    lights = lb.build()

    eye = (6.0, 6.5, -10.0)
    mats = make_materials(
        base_color=[(0.85, 0.5, 0.3), (0.4, 0.65, 0.85), (0.6, 0.8, 0.45),
                    (0.9, 0.85, 0.5), (0.5, 0.5, 0.55)],
        metallic=[0.05, 0.4, 0.0, 0.8, 0.0],
        roughness=[0.4, 0.25, 0.7, 0.35, 0.9],
        tex_id=[-1, -1, -1, -1, 0],
    )
    ctx = make_shade_context(
        mats, light_dir_ws=(0.35, -0.75, 0.45), light_color=(1.0, 0.96, 0.9),
        light_intensity=2.0, camera_pos=eye,
        textures=jnp.asarray(checkerboard_texture(128))[None],
    )
    return geom, objects, lights, ctx, eye


def make_flagship_frame(geom, objects, lights, ctx, width, height,
                        shadow_size=2048, local_map=1024, local_point=512,
                        with_local=True, with_cull=True, vis_scale=1,
                        vis_crop=(), cap=2048, use_resolve=None,
                        resolve_layout=None, shadow_filter=None,
                        sun_vis_scale=None, static_local=False,
                        static_sun=False, with_post=True,
                        atlas_packed=None):
    """The HONEST flagship frame fn (hello_rendering_paths.cpp:8360
    structure): per-frame cull -> sun + local shadow atlas -> raster ->
    forward+ -> tonemap -> FXAA.  Returns (frame(cam, ctx) -> outputs)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lsr_tpu.core.frame import ShadowPassParams
    from lsr_tpu.geometry.occlusion import (
        occlusion_cull_aabbs, render_occluder_depth)
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.lighting.local_shadows import (
        plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.lighting.shadow_sample import make_shadow_context
    from lsr_tpu.passes.forward_plus import (
        resolve_forward_plus, shade_forward_plus)
    from lsr_tpu.passes.post import fxaa_pass
    from lsr_tpu.passes.shadow import render_shadow_map
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import object_world_aabbs

    sun_dir = np.asarray([0.35, -0.75, 0.45], np.float32)
    shadow_params = ShadowPassParams(map_size=shadow_size, pcf_radius=2)
    spot_ids, point_ids = plan_shadow_casters(lights) if with_local \
        else ((), ())
    if use_resolve is None:
        use_resolve = os.environ.get("LSR_BENCH_RESOLVE", "0") == "1"
    if resolve_layout is None:
        resolve_layout = os.environ.get("LSR_BENCH_RESOLVE_LAYOUT", "lanes")
    if shadow_filter is None:
        # "pcf" = reference-exact window filter; "esm" = prefiltered soft
        # maps, one 1-lane fetch per (pixel, light) — the round-4
        # gather-floor lever (PARITY.md deviation class).
        # Aligned with main()'s production default (ADVICE r4): direct
        # callers omitting shadow_filter get the same config as the CLI.
        shadow_filter = os.environ.get("LSR_BENCH_SHADOW_FILTER", "esm")
    if sun_vis_scale is None:
        sun_vis_scale = int(os.environ.get("LSR_BENCH_SUN_VIS_SCALE", "1"))
    if atlas_packed is None:
        # Atlas strategy (see _render_slot_stack): "map" = per-slot
        # lax.map(setup+raster); "packed" = batched setup + one tall
        # raster; "hybrid" = batched setup + per-slot rasters.  Default set
        # by the r5 esm5 interleaved A/B at HEAD (2026-08-20 01:28, all
        # bit-exact): whole-frame map 186.1 / hybrid 186.2 / packed 189.5
        # ms — a tie except packed — and stage-only map 65.5 / hybrid 86.1
        # / packed 91.2 ms, so map is the promoted strategy (the r5 esm3
        # in-frame cond finding that motivated hybrid does not reproduce at
        # whole-frame level after the depth-only setup landed).
        mode = os.environ.get("LSR_BENCH_ATLAS", "map")
        atlas_packed = {"map": False, "packed": True}.get(mode, "hybrid")

    # Attribution knockouts (scripts/dbg_local.py esm3): pre-render the
    # local atlas / sun map ONCE at build time and bake them as jit
    # constants, so a frame-level A/B isolates exactly that stage's cost.
    prebuilt_local = prebuilt_sun = None
    if static_local and with_local and (spot_ids or point_ids):
        prebuilt_local = jax.device_get(render_local_shadow_maps(
            geom, objects, lights, spot_ids, point_ids,
            map_size=local_map, point_size=local_point, pcf_radius=2,
            vis_scale=vis_scale, vis_crop=tuple(vis_crop),
            filter_mode=shadow_filter))
        prebuilt_local = jax.tree.map(jnp.asarray, prebuilt_local)
    if static_sun:
        from lsr_tpu.passes.shadow import render_shadow_map as _rsm
        sm_d, sm_vp = _rsm(geom, objects, jnp.asarray(sun_dir),
                           map_size=shadow_size)
        prebuilt_sun = (jnp.asarray(jax.device_get(sm_d)),
                        jnp.asarray(jax.device_get(sm_vp)))

    def frame(cam, ctx_t):
        # Full flagship composition (hello_rendering_paths.cpp:8360 frame):
        # per-frame frustum + occlusion scene cull (:94-97) -> sun shadow
        # 2048^2 + 8-spot/2-point local shadow atlas (:104-109, re-recorded
        # every frame) -> raster -> interp -> forward+ (sun PCF + local
        # shadow planes + binned local lights) -> tonemap -> FXAA.
        objs = objects
        lights_f = lights
        caster_en = None
        if with_cull:
            wmin, wmax = object_world_aabbs(objects)
            vis = objects.visible & frustum_cull_objects(
                cam.viewproj, wmin, wmax)
            occ = render_occluder_depth(
                geom, objects, cam.viewproj, cam.zn, cam.zf, 320, 180,
                occluder_mask=vis)
            vis = vis & occlusion_cull_aabbs(
                occ, cam.viewproj, wmin, wmax, cam.zn, cam.zf)
            objs = dataclasses.replace(objects, visible=vis)
            # Per-frame LIGHT culling (hello_rendering_paths.cpp:94-97
            # culls the light set with the same frustum + occlusion
            # proxies): culled lights drop out of the bins AND out of the
            # local-shadow atlas/vis work (caster_enabled below).
            from lsr_tpu.lighting.light_culling import cull_lights_camera

            lmask = cull_lights_camera(lights, cam.viewproj, occ_depth=occ,
                                       zn=cam.zn, zf=cam.zf)
            lights_f = dataclasses.replace(
                lights, enabled=lights.enabled & lmask)
            ids = list(spot_ids) + list(point_ids)
            if ids:
                caster_en = lights_f.enabled[jnp.asarray(ids)]

        local_sh = None
        if prebuilt_local is not None:
            local_sh = prebuilt_local
        elif with_local and (spot_ids or point_ids):
            local_sh = render_local_shadow_maps(
                geom, objects, lights_f, spot_ids, point_ids,
                map_size=local_map, point_size=local_point,
                # The reference flagship samples spot AND point shadows at
                # the sun's pcf radius 2 (hello_rendering_paths.cpp:6397,
                # :6650 pass sun_shadow_params.w=2.0 per light).
                pcf_radius=2, vis_scale=vis_scale,
                vis_crop=tuple(vis_crop), caster_enabled=caster_en,
                filter_mode=shadow_filter, atlas_packed=atlas_packed)

        if prebuilt_sun is not None:
            sm_depth, light_vp = prebuilt_sun
        else:
            sm_depth, light_vp = render_shadow_map(
                geom, objects, jnp.asarray(sun_dir), map_size=shadow_size)
        shadow_ctx = make_shadow_context(
            sm_depth, light_vp,
            bias_const=shadow_params.bias_const,
            bias_slope=shadow_params.bias_slope,
            strength=shadow_params.strength,
            pcf_radius=shadow_params.pcf_radius,
            pcf_step=shadow_params.pcf_step,
            filter_mode=shadow_filter,
        )
        ctx_sh = dataclasses.replace(ctx_t, shadow=shadow_ctx)

        setup = scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objs.model, objs.normal_mat,
            cam.viewproj, width, height, obj_visible=objs.visible,
        )
        depth, tid, max_bin = rasterize_direct(
            setup, width, height, cam.zn, cam.zf,
            # Tile-order spatial sort: 6.2 vs 8.1 ms at 1080p, bit-exact
            # incl. tids via the lexicographic tie resolve (dbg_local r3ab).
            spatial_sort=True,
        )
        if use_resolve:
            # Fully-fused resolve: interp + sun + lights (+ local shadow
            # planes) + ambient in ONE Pallas kernel; no intermediate
            # G-buffer.  LSR_BENCH_RESOLVE=1 / _LAYOUT pick this from env.
            hdr, stats = resolve_forward_plus(
                setup, depth, tid, ctx_sh, lights_f, cam.view, cam.proj,
                cam.zn, cam.zf, width, height, cap=128,
                sun_model="pbr_mr", local_shadows=local_sh,
                rec_layout=resolve_layout, sun_vis_scale=sun_vis_scale,
            )
        else:
            gb = interpolate_gbuffer(setup, depth, tid,
                                     materials=ctx.materials,
                                     want_face_normal=False)
            hdr, stats = shade_forward_plus(
                gb, ctx_sh, lights_f, cam.view, cam.proj, cam.zn, cam.zf,
                width, height, tile_size=16, cap=128,
                # tiled_depth_range: per-tile depth bounds cut binned list
                # work (72.9 vs 75.9 ms whole-frame, scripts/dbg_frame2.py).
                mode="tiled_depth_range",
                sun_model="pbr_mr",
                local_shadows=local_sh,
                sun_vis_scale=sun_vis_scale,
            )
        if with_post:
            ldr = tonemap_pass(hdr)
            ldr = fxaa_pass(ldr)
        else:
            # knockout: skip post (clip first — out-of-range float->uint8
            # is implementation-defined in XLA).
            ldr = jnp.clip(hdr * 255.0, 0.0, 255.0).astype(jnp.uint8)
        n_valid = jnp.sum(setup.valid)
        return (ldr, n_valid, max_bin, stats["max_lights_per_bin"],
                stats["overflow_bins"])

    return frame, spot_ids, point_ids


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lsr_tpu.scene.scene import make_camera

    width = int(os.environ.get("LSR_BENCH_W", "1920"))
    height = int(os.environ.get("LSR_BENCH_H", "1080"))
    frames = int(os.environ.get("LSR_BENCH_FRAMES", "60"))
    warmup = int(os.environ.get("LSR_BENCH_WARMUP", "10"))
    cap = int(os.environ.get("LSR_BENCH_CAP", "2048"))
    # Production default is the round-4 ESM stack: prefiltered (ESM) sun +
    # local maps, half-res atlas, half-res visibility planes — 248.3 ->
    # 162.6 ms whole-frame vs exact-PCF at reference budgets (dbg_local
    # esm2 A/B, interleaved).  One knob restores the reference-exact
    # config: LSR_BENCH_SHADOW_FILTER=pcf flips every default back to the
    # reference budgets (sun 2048^2, spot 1024^2, point 512^2, full-res
    # vis; hello_rendering_paths.cpp:104-109) and the exact window-PCF
    # filter the parity tests pin (PARITY.md deviation class).
    sf = os.environ.get("LSR_BENCH_SHADOW_FILTER", "esm")
    esm = sf == "esm"
    shadow_size = int(os.environ.get(
        "LSR_BENCH_SHADOW", "1024" if esm else "2048"))
    local_map = int(os.environ.get(
        "LSR_BENCH_LOCAL_MAP", "512" if esm else "1024"))
    local_point = int(os.environ.get(
        "LSR_BENCH_LOCAL_POINT", "256" if esm else "512"))
    with_local = os.environ.get("LSR_BENCH_LOCAL", "1") == "1"
    with_cull = os.environ.get("LSR_BENCH_CULL", "1") == "1"
    vis_scale = int(os.environ.get(
        "LSR_BENCH_VIS_SCALE", "2" if esm else "1"))
    sun_vis_scale = int(os.environ.get(
        "LSR_BENCH_SUN_VIS_SCALE", "2" if esm else "1"))
    # "chxcw" e.g. "512x1024"; "" = full-screen; "auto" = half-screen.
    crop_env = os.environ.get("LSR_BENCH_VIS_CROP", "auto")
    if crop_env == "auto":
        from lsr_tpu.lighting.local_shadows import default_vis_crop

        vis_crop = default_vis_crop(height, width)
    else:
        vis_crop = (tuple(int(t) for t in crop_env.split("x"))
                    if crop_env else ())

    geom, objects, lights, ctx, eye0 = build_scene()
    frame, spot_ids, point_ids = make_flagship_frame(
        geom, objects, lights, ctx, width, height,
        shadow_size=shadow_size, local_map=local_map,
        local_point=local_point, with_local=with_local,
        with_cull=with_cull, vis_scale=vis_scale, vis_crop=vis_crop,
        cap=cap, shadow_filter=sf, sun_vis_scale=sun_vis_scale)

    frame_j = jax.jit(frame)

    def cam_at(i):
        # Orbiting camera: every frame distinct, nothing hoistable.
        ang = 0.02 * i
        eye = (float(eye0[0] * np.cos(ang) - eye0[2] * np.sin(ang)),
               float(eye0[1]),
               float(eye0[0] * np.sin(ang) + eye0[2] * np.cos(ang)))
        cam = make_camera(width, height, eye, (0, 0, 0), fov=np.pi / 3.2)
        return cam, dataclasses.replace(
            ctx, camera_pos=jnp.asarray(eye, jnp.float32))

    # Pre-stage every frame's camera/context on the DEVICE before timing:
    # per-frame host->device uploads through the remote tunnel cost tens of
    # ms each and would otherwise dominate the measurement (174 vs 82
    # ms/frame measured for the identical program).
    staged = [jax.device_put(cam_at(i)) for i in range(warmup + frames)]

    cam0, ctx0 = staged[0]
    ldr, n_valid, max_bin, max_lights, overflow = jax.block_until_ready(
        frame_j(cam0, ctx0)
    )
    tris = int(n_valid)
    print(
        f"# compile ok: {tris} tris, max_bin={int(max_bin)} (cap {cap}), "
        f"max_lights_per_tile={int(max_lights)}, "
        f"overflowed_bins={int(overflow)}",
        file=sys.stderr,
    )

    # jax.block_until_ready does NOT actually wait on the axon tunnel
    # backend; a host READBACK of a scalar probe is the only reliable
    # queue drain (scripts/tpu_timing.py).  The probe's ~0.2 s constant
    # drain latency amortizes over the `frames` frames.
    probe = jax.jit(lambda a: jnp.sum(a.ravel()[:128].astype(jnp.float32)))

    for i in range(warmup):
        cam_i, ctx_i = staged[i]
        out = frame_j(cam_i, ctx_i)
    float(np.asarray(probe(out[0])))

    t0 = time.perf_counter()
    for i in range(frames):
        cam_i, ctx_i = staged[warmup + i]
        out = frame_j(cam_i, ctx_i)
    float(np.asarray(probe(out[0])))
    dt = time.perf_counter() - t0

    fps = frames / dt
    mtris = tris * fps / 1e6
    wk = f"shadow {shadow_size}"
    if with_local:
        wk += (f" + local atlas {len(spot_ids)}x{local_map}"
               f"+{len(point_ids)}x6x{local_point}")
    if with_cull:
        wk += " + cull 320x180"
    if sf != "pcf":
        wk += f" + {sf} filter (vis/{vis_scale}, sun vis/{sun_vis_scale})"
    print(
        f"# {fps:.2f} fps ({dt / frames * 1000:.2f} ms/frame), "
        f"{mtris:.2f} Mtris/s at {width}x{height} "
        f"(full frame: {wk} + forward+ + tonemap + fxaa)",
        file=sys.stderr,
    )
    extra = {}
    if esm and os.environ.get("LSR_BENCH_PCF_CONTROL", "0") == "1":
        # Same-window exact-PCF reference-budget control (VERDICT r4 weak
        # #6: the fixed-workload trend must ride along with the promoted
        # metric).  Same process, same tunnel window, fewer frames.
        frame_p, _, _ = make_flagship_frame(
            geom, objects, lights, ctx, width, height,
            shadow_size=2048, local_map=1024, local_point=512,
            with_local=with_local, with_cull=with_cull, vis_scale=1,
            vis_crop=vis_crop, cap=cap, shadow_filter="pcf",
            sun_vis_scale=1)
        frame_pj = jax.jit(frame_p)
        n_ctl = min(20, frames)
        out = jax.block_until_ready(frame_pj(*staged[0]))
        float(np.asarray(probe(out[0])))
        t0 = time.perf_counter()
        for i in range(n_ctl):
            out = frame_pj(*staged[warmup + i])
        float(np.asarray(probe(out[0])))
        ctl_ms = (time.perf_counter() - t0) * 1000.0 / n_ctl
        print(f"# pcf-ref-budgets control: {ctl_ms:.1f} ms/frame "
              f"({1000.0 / ctl_ms:.2f} fps), same window", file=sys.stderr)
        extra = {"pcf_ref_budgets_control_ms": round(ctl_ms, 1),
                 "pcf_ref_budgets_control_fps": round(1000.0 / ctl_ms, 2)}
    print(json.dumps({
        "metric": (f"flagship_{width}x{height}_{lights.count}lights"
                   f"_shadow{shadow_size}_{sf}_fps"),
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
