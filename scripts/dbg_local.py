"""In-process A/B of local-shadow pieces: pack stride, stacked raster,
batched vs per-plane vis gathers.  Usage: python scripts/dbg_local.py [part]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from tpu_timing import bench_fn  # noqa: E402  (slope-method timing)


def part_pack():
    from lsr_tpu.lighting.shadow_sample import pack_shadow_taps

    d = jnp.asarray(np.random.default_rng(0).random((8, 1024, 1024), np.float32))
    for stride in (4, 6, 8):
        f = jax.jit(lambda dd, s=stride: jax.vmap(
            lambda x: pack_shadow_taps(x, 1, s))(dd))
        bench_fn(f"pack r1 stride={stride} 8x1024^2", f, d)
    d2 = jnp.asarray(np.random.default_rng(0).random((2048, 2048), np.float32))
    for stride in (4, 8):
        f = jax.jit(lambda dd, s=stride: pack_shadow_taps(dd, 2, s))
        bench_fn(f"pack r2 stride={stride} 2048^2", f, d2)


def part_raster():
    import bench as bench_mod
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.lighting.local_shadows import (
        _render_slot_stack, _spot_viewproj, _stack_slot_setups,
        plan_shadow_casters)
    from lsr_tpu.raster.setup import CULL_NONE, DEPTH_NDC01, scene_setup
    from lsr_tpu.raster.tiled import rasterize_chunklist, rasterize_direct
    from lsr_tpu.scene.scene import object_world_aabbs

    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    spot_ids, point_ids = plan_shadow_casters(lights)
    vps = jnp.stack([
        _spot_viewproj(lights.position[s], lights.direction[s],
                       lights.outer_angle[s], lights.range[s])
        for s in spot_ids])
    caster_mask = objects.casts_shadow & objects.visible
    wmin, wmax = object_world_aabbs(objects)
    size = 1024

    def slot_setup(vp):
        sm = caster_mask & frustum_cull_objects(vp, wmin, wmax)
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, size, size, cull_mode=CULL_NONE, obj_visible=sm)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def map_raster(vps):
        def rs(vp):
            d, _, _ = rasterize_direct(
                slot_setup(vp), size, size, zero, one,
                depth_mode=DEPTH_NDC01, track_ids=False)
            return d
        return jax.lax.map(rs, vps)

    def stack_raster(vps):
        st = _stack_slot_setups(jax.vmap(slot_setup)(vps), size)
        d, _, _ = rasterize_direct(
            st, size, 8 * size, zero, one,
            depth_mode=DEPTH_NDC01, track_ids=False, band_h=size)
        return d

    def stack_raster_tuned(vps):
        st = _stack_slot_setups(jax.vmap(slot_setup)(vps), size)
        d, _, _ = rasterize_direct(
            st, size, 8 * size, zero, one,
            depth_mode=DEPTH_NDC01, track_ids=False, band_h=size,
            chunk=32)
        return d

    def stack_chunk(vps):
        st = _stack_slot_setups(jax.vmap(slot_setup)(vps), size)
        d, _, mc = rasterize_chunklist(
            st, size, 8 * size, zero, one,
            depth_mode=DEPTH_NDC01, track_ids=False)
        return d, mc

    def setup_only_map(vps):
        return jax.lax.map(lambda vp: slot_setup(vp).coef.sum(), vps)

    def setup_only_vmap(vps):
        return jax.vmap(slot_setup)(vps).coef.sum()

    bench_fn("setup 8x lax.map", jax.jit(setup_only_map), vps)
    bench_fn("setup 8x vmap", jax.jit(setup_only_vmap), vps)
    from lsr_tpu.raster.setup import scene_setup_slots

    def multi_setup(vps):
        sm = caster_mask[None] & jax.vmap(
            lambda vp: frustum_cull_objects(vp, wmin, wmax))(vps)
        return scene_setup_slots(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vps, size, cull_mode=CULL_NONE, obj_visible_slots=sm)

    def multi_map_raster(vps, th, tw):
        setups = multi_setup(vps)

        def rs(st):
            d, _, _ = rasterize_direct(
                st, size, size, zero, one, depth_mode=DEPTH_NDC01,
                track_ids=False, tile_h=th, tile_w=tw)
            return d
        return jax.lax.map(rs, setups)

    bench_fn("setup 8x multi (scene_setup_slots)", jax.jit(
        lambda v: multi_setup(v).coef.sum()), vps)
    d_map = bench_fn("raster 8x1024 lax.map(direct)", jax.jit(map_raster), vps)
    d_mm = bench_fn("raster 8x1024 multi+map 128", jax.jit(
        lambda v: multi_map_raster(v, 128, 128)), vps)
    d_mm256 = bench_fn("raster 8x1024 multi+map 256", jax.jit(
        lambda v: multi_map_raster(v, 256, 256)), vps)
    print("  multi == map:", bool(jnp.array_equal(d_map, d_mm)))
    print("  multi256 == map:", bool(jnp.array_equal(d_map, d_mm256)))


def part_vis():
    import dataclasses

    import bench as bench_mod
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting.local_shadows import (
        local_shadow_vis_stack, plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    spot_ids, point_ids = plan_shadow_casters(lights)

    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    gb = interpolate_gbuffer(setup, depth, tid)
    wp = jax.block_until_ready(gb.world_pos)
    nm = jax.block_until_ready(_norm(gb.normal_ws))

    sh = jax.jit(lambda: render_local_shadow_maps(
        geom, objects, lights, spot_ids, point_ids,
        map_size=1024, point_size=512, pcf_radius=1))()
    sh = jax.block_until_ready(sh)

    def batched(wp, nm, sc):
        s2 = dataclasses.replace(sh, vis_scale=sc)
        return local_shadow_vis_stack(s2, wp, nm)

    # Per-plane variant (the round-2 formulation) for A/B.
    def per_plane(wp, nm, sc):
        if sc > 1:
            wps, nms = wp[::sc, ::sc], nm[::sc, ::sc]
        else:
            wps, nms = wp, nm
        planes = []
        for k in range(sh.n_shadowed):
            if sh.kinds[k] == ls.SHADOW_POINT_CUBE:
                planes.append(ls._point_planes(sh, [k], wps, nms)[0])
            else:
                planes.append(ls._spot_planes(sh, [k], wps, nms)[0])
        planes.append(jnp.ones(wps.shape[:-1], jnp.float32))
        st = jnp.stack(planes, -1)
        if sc > 1:
            st = jax.image.resize(st, wp.shape[:-1] + (st.shape[-1],),
                                  "bilinear")
        return st

    for sc in (1, 2):
        o1 = bench_fn(f"vis batched sc={sc}", jax.jit(
            lambda a, b, s=sc: batched(a, b, s)), wp, nm)
        o2 = bench_fn(f"vis per-plane sc={sc}", jax.jit(
            lambda a, b, s=sc: per_plane(a, b, s)), wp, nm)
        print("  match:", bool(jnp.allclose(o1, o2, atol=1e-6)))

    # Spot-only sub-variants: isolate gather row count vs batching.
    spot_ks = [k for k in range(sh.n_shadowed)
               if sh.kinds[k] != ls.SHADOW_POINT_CUBE]
    bench_fn("spot planes batched(8) sc=1", jax.jit(
        lambda a, b: ls._spot_planes(sh, spot_ks, a, b)), wp, nm)

    def spot_groups(wp, nm, g):
        outs = []
        for i in range(0, len(spot_ks), g):
            outs.append(ls._spot_planes(sh, spot_ks[i:i + g], wp, nm))
        return jnp.concatenate(outs, 0)

    for g in (1, 2, 4):
        bench_fn(f"spot planes groups of {g} sc=1", jax.jit(
            lambda a, b, gg=g: spot_groups(a, b, gg)), wp, nm)


def part_setup():
    """Break scene_setup into stages (vmapped 8x, the atlas workload)."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import (
        _spot_viewproj, plan_shadow_casters)
    from lsr_tpu.raster.setup import (
        CULL_NONE, assemble_and_clip, build_setup, vertex_stage)

    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    spot_ids, point_ids = plan_shadow_casters(lights)
    vps = jnp.stack([
        _spot_viewproj(lights.position[s], lights.direction[s],
                       lights.outer_angle[s], lights.range[s])
        for s in spot_ids])
    size = 1024

    def vstage(vp):
        return vertex_stage(geom.positions, geom.normals, geom.uvs,
                            geom.vtx_obj, objects.model, objects.normal_mat,
                            vp)

    out = bench_fn("vertex_stage 8x", jax.jit(jax.vmap(vstage)), vps)
    world, clip, nws = jax.block_until_ready(out)

    def clipstage(w, c, n):
        return assemble_and_clip(c, w, n, geom.uvs, geom.indices,
                                 geom.tri_obj)

    out2 = bench_fn("assemble_and_clip 8x", jax.jit(jax.vmap(clipstage)),
                    world, clip, nws)
    clip2, attrs2, valid2, obj2 = jax.block_until_ready(out2)

    def bstage(c, a, v, o):
        return build_setup(c, a, v, o, size, size, cull_mode=CULL_NONE)

    bench_fn("build_setup 8x", jax.jit(jax.vmap(bstage)),
             clip2, attrs2, valid2, obj2)


def part_crop():
    """A/B the vis_crop knob at the flagship workload (1080p, 8 spots +
    2 points): full-screen planes vs static crops of decreasing size."""
    import dataclasses

    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import (
        local_shadow_vis_stack, plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    spot_ids, point_ids = plan_shadow_casters(lights)

    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    gb = interpolate_gbuffer(setup, depth, tid)
    wp, nm = gb.world_pos, _norm(gb.normal_ws)

    sh = jax.jit(lambda: render_local_shadow_maps(
        geom, objects, lights, spot_ids, point_ids,
        map_size=1024, point_size=512, pcf_radius=1))()

    ref = None
    # (680, 1024) was the round-3 single default (zero fallbacks over the
    # bench orbit; measured footprints: spots <=652x897, points <=535x558);
    # default_vis_crop is now a 2-level cascade whose level 0 catches the
    # point planes (and near-axis spot frames) at half the rows.
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    for crop in ((), (680, 1024), (512, 1024),
                 default_vis_crop(h, w),
                 ((560, 640), (680, 1024), (864, 1536))):
        s2 = dataclasses.replace(sh, vis_crop=crop)
        # sh passed as a jit ARGUMENT: closing over it bakes the tap tables
        # into the executable as constants, and with the crop cascade's
        # nested conds the serialized executable exceeds the remote
        # compiler's limit (observed: 2.4GB metadata -> HTTP 500).
        o = bench_fn(f"vis stack crop={crop or 'full'}",
                     jax.jit(local_shadow_vis_stack), s2, wp, nm)
        if ref is None:
            ref = o
        else:
            d = jnp.max(jnp.abs(o - ref))
            print(f"  max|diff| vs full: {float(d):.2e}")


def part_frame():
    """Whole-frame in-process A/B of the vis_crop cascade (stage wins can
    vanish at frame level — measure the honest flagship frame)."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)

    variants = {
        "single(680,1024)": (((680, 1024),), False),
        "cascade-default": (default_vis_crop(h, w), False),
        "cascade+resolve-lanes": (default_vis_crop(h, w), True),
    }
    fns = {}
    for name, (crop, resolve) in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, vis_crop=crop,
            use_resolve=resolve)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    outs = {}
    for rnd in range(2):  # interleaved rounds
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship frame {name} r{rnd}", f,
                                  cam, ctx)
    a, b = (np.asarray(outs[k]) for k in ("single(680,1024)",
                                          "cascade-default"))
    print("  crop outputs equal:", bool((a == b).all()),
          "max|d|:", float(np.abs(a.astype(int) - b.astype(int)).max()))
    r = np.asarray(outs["cascade+resolve-lanes"])
    dr = np.abs(r.astype(int) - b.astype(int))
    print(f"  resolve vs classic: max|d| {dr.max()} "
          f"frac>2 {(dr.max(-1) > 2).mean():.2e} (approx path, small "
          f"deltas expected)")


def part_esm():
    """Round-4 A/B: ESM prefiltered shadow filtering vs exact PCF, at the
    whole-frame level (the only truth) + the vis-stack stage.  Also probes
    ESM with half-res local maps (the prefilter makes half-res viable at
    unchanged visual budgets — VERDICT r3 item 4)."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    variants = {
        "pcf(baseline)": dict(shadow_filter="pcf"),
        "esm": dict(shadow_filter="esm"),
        "esm-half-atlas": dict(shadow_filter="esm", local_map=512,
                               local_point=256),
        "esm-nocrop": dict(shadow_filter="esm", vis_crop=()),
    }
    fns = {}
    for name, kw in variants.items():
        kw.setdefault("vis_crop", crop)
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    outs = {}
    for rnd in range(2):  # interleaved rounds
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship frame {name} r{rnd}", f,
                                  cam, ctx)
    base = np.asarray(outs["pcf(baseline)"]).astype(int)
    for name in variants:
        if name == "pcf(baseline)":
            continue
        d = np.abs(np.asarray(outs[name]).astype(int) - base)
        print(f"  {name} vs pcf: max|d| {d.max()} "
              f"frac>2LSB {(d.max(-1) > 2).mean():.3e} "
              f"(penumbra-only deltas expected)")


def part_esm2():
    """Round-4 sweep #2: attribute the ESM frame's time at WHOLE-FRAME
    level (knockouts) and probe the compounding levers — half-res atlas,
    half-res visibility planes (vis_scale=2: ESM penumbrae are low-
    frequency, so strided evaluation + bilinear up is the principled
    companion), fused resolve, and a 1024^2 ESM sun map."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    base_kw = dict(shadow_filter="esm", local_map=512, local_point=256,
                   vis_crop=crop)
    variants = {
        "pcf(anchor)": dict(shadow_filter="pcf", vis_crop=crop),
        "esm-half": dict(base_kw),
        "esm-half-vs2": dict(base_kw, vis_scale=2),
        "esm-half-nolocal": dict(base_kw, with_local=False),
        "esm-half-vs2-sun1024": dict(base_kw, vis_scale=2,
                                     shadow_size=1024),
        "esm-quarter-vs2": dict(shadow_filter="esm", local_map=256,
                                local_point=128, vis_scale=2,
                                vis_crop=crop),
        "esm-half-vs2-sunvs2": dict(base_kw, vis_scale=2,
                                    sun_vis_scale=2),
        "esm-half-vs2-all": dict(base_kw, vis_scale=2, sun_vis_scale=2,
                                 shadow_size=1024),
        # LAST: the fused-resolve compile has wedged the remote compiler
        # before (2.4GB serialized executable -> HTTP 500, r3 note); keep
        # every other variant's numbers safe if it wedges again.
        "esm-half-vs2-resolve": dict(base_kw, vis_scale=2,
                                     use_resolve=True,
                                     resolve_layout="lanes"),
    }
    fns = {}
    for name, kw in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    outs = {}
    for rnd in range(2):  # interleaved rounds
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship frame {name} r{rnd}", f,
                                  cam, ctx)
    base = np.asarray(outs["pcf(anchor)"]).astype(int)
    for name in variants:
        if name in ("pcf(anchor)", "esm-half-nolocal"):
            continue
        d = np.abs(np.asarray(outs[name]).astype(int) - base)
        print(f"  {name} vs pcf: max|d| {d.max()} "
              f"frac>2LSB {(d.max(-1) > 2).mean():.3e}")


def part_esm3():
    """Round-4 sweep #3: ATTRIBUTE the promoted ESM frame (162.6 ms) at
    frame level via static-stage knockouts (pre-rendered atlas/sun baked as
    jit constants — the frame minus exactly that stage's compute), plus
    stage-only timings for the pieces the knockouts implicate."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    base = dict(shadow_filter="esm", local_map=512, local_point=256,
                vis_scale=2, sun_vis_scale=2, shadow_size=1024,
                vis_crop=crop)
    variants = {
        "promoted(full)": dict(base),
        "static-atlas": dict(base, static_local=True),
        "static-sun": dict(base, static_sun=True),
        "static-both": dict(base, static_local=True, static_sun=True),
        "nopost": dict(base, with_post=False),
        "nocull": dict(base, with_cull=False),
    }
    fns = {}
    for name, kw in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    res = {}
    for rnd in range(2):  # interleaved rounds
        for name, f in fns.items():
            bench_fn(f"flagship frame {name} r{rnd}", f, cam, ctx)
            res.setdefault(name, []).append(bench_fn.last_ms)
    full = min(res["promoted(full)"])
    for name in variants:
        if name != "promoted(full)":
            print(f"  stage cost ({name:12s}): "
                  f"{full - min(res[name]):7.2f} ms")

    # Stage-only timings for the local atlas internals at promoted budgets.
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.lighting import shadow_sample as _ss
    from lsr_tpu.lighting.local_shadows import (
        plan_shadow_casters, plan_slot_stacks, render_local_shadow_maps)
    from lsr_tpu.raster.setup import CULL_NONE, DEPTH_NDC01, scene_setup
    from lsr_tpu.raster.tiled import SORT_DEPTH_SETUP, rasterize_direct
    from lsr_tpu.scene.scene import object_world_aabbs

    spot_ids, point_ids = plan_shadow_casters(lights)
    bench_fn("atlas total (render_local_shadow_maps)", jax.jit(
        lambda lt: render_local_shadow_maps(
            geom, objects, lt, spot_ids, point_ids, map_size=512,
            point_size=256, pcf_radius=2, vis_scale=2, vis_crop=crop,
            filter_mode="esm").spot_taps.sum()), lights)
    (_, _, _, _, _, spot_vp, point_vp) = plan_slot_stacks(
        lights, spot_ids, point_ids)
    caster_mask = objects.casts_shadow & objects.visible
    wmin, wmax = object_world_aabbs(objects)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)

    def slot_setup(vp, size):
        sm = caster_mask & frustum_cull_objects(vp, wmin, wmax)
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, size, size, cull_mode=CULL_NONE, obj_visible=sm)

    def setup_only(vps, size):
        return jax.lax.map(
            lambda vp: slot_setup(vp, size).coef.sum(), vps)

    def raster_map(vps, size):
        def rs(vp):
            d, _, _ = rasterize_direct(
                slot_setup(vp, size), size, size, zero, one,
                depth_mode=DEPTH_NDC01, track_ids=False,
                tile_h=128, tile_w=128, spatial_sort=SORT_DEPTH_SETUP)
            return d
        return jax.lax.map(rs, vps)

    bench_fn("atlas setup-only 8x512", jax.jit(
        lambda v: setup_only(v, 512)), spot_vp)
    bench_fn("atlas setup-only 12x256", jax.jit(
        lambda v: setup_only(v, 256)), point_vp)
    d8 = bench_fn("atlas setup+raster 8x512", jax.jit(
        lambda v: raster_map(v, 512)), spot_vp)
    d12 = bench_fn("atlas setup+raster 12x256", jax.jit(
        lambda v: raster_map(v, 256)), point_vp)
    bench_fn("esm prefilter+pack 8x512", jax.jit(lambda d: jax.vmap(
        lambda x: _ss.pack_soft_u16(_ss.prefilter_esm(x, 2, 80.0)))(
            d).sum()), d8)
    bench_fn("esm prefilter+pack 12x256", jax.jit(lambda d: jax.vmap(
        lambda x: _ss.pack_soft_u16(_ss.prefilter_esm(x, 2, 80.0)))(
            d).sum()), d12)


def part_esm4():
    """Round-4 sweep #4: fused resolve (interp folded into the shade
    kernel) vs the classic interp+shade split, at the PROMOTED ESM config.
    Isolated in its own process: the lanes-layout resolve compile has
    wedged the remote compiler before (2.4GB executable -> HTTP 500), so
    it must not share a run with anything whose numbers we need."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    base = dict(shadow_filter="esm", local_map=512, local_point=256,
                vis_scale=2, sun_vis_scale=2, shadow_size=1024,
                vis_crop=crop)
    variants = {
        "promoted(classic)": dict(base),
        "promoted+resolve": dict(base, use_resolve=True,
                                 resolve_layout="lanes"),
    }
    fns, outs = {}, {}
    for name, kw in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    for rnd in range(2):
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship frame {name} r{rnd}", f,
                                  cam, ctx)
    a = np.asarray(outs["promoted(classic)"]).astype(int)
    b = np.asarray(outs["promoted+resolve"]).astype(int)
    d = np.abs(a - b)
    print(f"  resolve vs classic: max|d| {d.max()} "
          f"frac>2LSB {(d.max(-1) > 2).mean():.3e} (approx path)")


def part_esm5():
    """Round-4 sweep #5: packed atlas raster (one vmapped setup + one
    tall-framebuffer launch per stack) vs the lax.map slot loop, at the
    promoted ESM half-res config — whole-frame AND stage-only, with a
    bit-exactness check on the final image."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import (
        default_vis_crop, plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    base = dict(shadow_filter="esm", local_map=512, local_point=256,
                vis_scale=2, sun_vis_scale=2, shadow_size=1024,
                vis_crop=crop)
    variants = {
        "promoted(map)": dict(base),
        "promoted(packed)": dict(base, atlas_packed=True),
        "promoted(hybrid)": dict(base, atlas_packed="hybrid"),
    }
    fns, outs = {}, {}
    for name, kw in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    for rnd in range(2):
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship frame {name} r{rnd}", f,
                                  cam, ctx)
    a = np.asarray(outs["promoted(map)"]).astype(int)
    for vn in ("promoted(packed)", "promoted(hybrid)"):
        b = np.asarray(outs[vn]).astype(int)
        d = np.abs(a - b)
        print(f"  {vn} vs map: equal={bool((d == 0).all())} max|d| "
              f"{d.max()} frac>2LSB {(d.max(-1) > 2).mean():.3e}")

    # Stage-only: the atlas call alone, both strategies (sum BOTH stacks
    # so neither is dead-code-eliminated).
    spot_ids, point_ids = plan_shadow_casters(lights)
    for name, pk in (("map", False), ("packed", True),
                     ("hybrid", "hybrid")):
        bench_fn(f"atlas total ({name})", jax.jit(
            lambda lt, p=pk: render_local_shadow_maps(
                geom, objects, lt, spot_ids, point_ids, map_size=512,
                point_size=256, pcf_radius=2, vis_scale=2, vis_crop=crop,
                filter_mode="esm", atlas_packed=p).spot_taps.sum()
            + render_local_shadow_maps(
                geom, objects, lt, spot_ids, point_ids, map_size=512,
                point_size=256, pcf_radius=2, vis_scale=2, vis_crop=crop,
                filter_mode="esm", atlas_packed=p).point_taps.sum()),
            lights)


def part_esm6():
    """Round-4 sweep #6: split the packed-atlas loss (esm5: 120 vs 67 ms)
    into vmapped-setup vs stacking vs the tall raster, and probe hybrids
    (vmap setup + lax.map raster; chunk=32 stacked raster)."""
    import bench as bench_mod
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.lighting.local_shadows import (
        _stack_slot_setups, plan_shadow_casters, plan_slot_stacks)
    from lsr_tpu.raster.setup import CULL_NONE, DEPTH_NDC01, scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import object_world_aabbs

    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    spot_ids, point_ids = plan_shadow_casters(lights)
    (_, _, _, _, _, spot_vp, point_vp) = plan_slot_stacks(
        lights, spot_ids, point_ids)
    caster_mask = objects.casts_shadow & objects.visible
    wmin, wmax = object_world_aabbs(objects)
    one, zero = jnp.float32(1.0), jnp.float32(0.0)

    def slot_setup(vp, size):
        sm = caster_mask & frustum_cull_objects(vp, wmin, wmax)
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, size, size, cull_mode=CULL_NONE, obj_visible=sm)

    for name, vps, size in (("8x512", spot_vp, 512),
                            ("12x256", point_vp, 256)):
        n = vps.shape[0]
        bench_fn(f"vmap setup {name}", jax.jit(
            lambda v, s=size: jax.vmap(
                lambda vp: slot_setup(vp, s).coef.sum())(v)), vps)
        bench_fn(f"vmap setup+stack {name}", jax.jit(
            lambda v, s=size: _stack_slot_setups(
                jax.vmap(lambda vp: slot_setup(vp, s))(v), s).coef.sum()),
            vps)

        def stacked(v, s=size, nn=n, chunk=16):
            st = _stack_slot_setups(
                jax.vmap(lambda vp: slot_setup(vp, s))(v), s)
            d, _, _ = rasterize_direct(
                st, s, nn * s, zero, one, depth_mode=DEPTH_NDC01,
                track_ids=False, tile_h=min(128, s), tile_w=min(128, s),
                band_h=s, chunk=chunk)
            return d
        bench_fn(f"stacked raster {name} chunk16", jax.jit(stacked), vps)
        bench_fn(f"stacked raster {name} chunk32", jax.jit(
            lambda v: stacked(v, chunk=32)), vps)

        def hybrid(v, s=size):
            setups = jax.vmap(lambda vp: slot_setup(vp, s))(v)

            def rs(st):
                d, _, _ = rasterize_direct(
                    st, s, s, zero, one, depth_mode=DEPTH_NDC01,
                    track_ids=False, tile_h=min(128, s), tile_w=min(128, s))
                return d
            return jax.lax.map(rs, setups)
        bench_fn(f"vmap setup + map raster {name}", jax.jit(hybrid), vps)


def part_r3ab():
    """Round-3 candidates, in-process A/B: (a) depth-raster spatial sort
    (atlas + sun map), (b) u16-packed tap tables (local + sun vis)."""
    import dataclasses

    import bench as bench_mod
    from lsr_tpu.camera.light_camera import build_dir_light_camera
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting import shadow_sample as ss
    from lsr_tpu.raster import tiled
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import CULL_NONE, DEPTH_NDC01, scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera, shadow_caster_aabb
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    spot_ids, point_ids = ls.plan_shadow_casters(lights)
    caster = objects.casts_shadow & objects.visible

    # --- (a) spatial sort: 8x1024 spot stack + 2048^2 sun map -----------
    (kinds, base_slots, c_pos, c_rng, strengths, spot_vp, point_vp) = \
        ls.plan_slot_stacks(lights, spot_ids, point_ids)
    u16_was = ss.TAPS_U16
    ss.TAPS_U16 = False            # isolate the raster change
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.scene.scene import object_world_aabbs

    wmin, wmax = object_world_aabbs(objects)
    size = 1024
    one, zero = jnp.float32(1.0), jnp.float32(0.0)

    def spot_stack(vps, sort, chunk, sub):
        def rs(vp):
            sm = caster & frustum_cull_objects(vp, wmin, wmax)
            st = scene_setup(
                geom.positions, geom.normals, geom.uvs, geom.indices,
                geom.vtx_obj, geom.tri_obj, objects.model,
                objects.normal_mat, vp, size, size, cull_mode=CULL_NONE,
                obj_visible=sm)
            d, _, _ = rasterize_direct(
                st, size, size, zero, one, depth_mode=DEPTH_NDC01,
                track_ids=False, tile_h=128, tile_w=128,
                spatial_sort=sort, chunk=chunk, sub_rows=sub)
            return d
        return jax.lax.map(rs, vps)

    outs = {}
    for sort, chunk, sub in ((False, 16, 4), (True, 16, 4), (True, 8, 4),
                             (True, 16, 8), (True, 8, 8), (False, 16, 8)):
        f = jax.jit(lambda vp, a=sort, c=chunk, s=sub: spot_stack(
            vp, a, c, s))
        outs[(sort, chunk, sub)] = np.asarray(bench_fn(
            f"spot depth 8x1024 sort={int(sort)} ck={chunk} sub={sub}",
            f, spot_vp))
    base = outs[(False, 16, 4)]
    for k, v in outs.items():
        if not (v == base).all():
            print(f"  MISMATCH at {k}", flush=True)
    ss.TAPS_U16 = u16_was

    S = 2048
    smin, smax = shadow_caster_aabb(objects)
    _, _, light_vp = build_dir_light_camera(
        smin, smax, jnp.asarray([0.35, -0.75, 0.45], jnp.float32), S)
    sm_setup = jax.jit(lambda: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        light_vp, S, S, cull_mode=CULL_NONE, obj_visible=caster))()
    souts = {}
    for sort, chunk, sub in ((False, 16, 4), (True, 16, 4), (True, 8, 8),
                             (True, 16, 8)):
        f = jax.jit(lambda s, so=sort, ck=chunk, sb=sub: rasterize_direct(
            s, S, S, jnp.float32(0.0), jnp.float32(1.0),
            depth_mode=DEPTH_NDC01, track_ids=False,
            tile_h=128, tile_w=128, spatial_sort=so, chunk=ck,
            sub_rows=sb)[0])
        souts[(sort, chunk, sub)] = np.asarray(bench_fn(
            f"sun raster 2048^2 sort={int(sort)} ck={chunk} sub={sub}",
            f, sm_setup))
    sbase = souts[(False, 16, 4)]
    for k, v in souts.items():
        if not (v == sbase).all():
            print(f"  SUN MISMATCH at {k}", flush=True)

    # --- (b) u16 taps: local vis stack + sun visibility -----------------
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)

    # --- (a2) main-view raster sort (tie_tid makes tids bit-exact) ------
    for sort in (True,):
        f = jax.jit(lambda s, so=sort: rasterize_direct(
            s, w, h, cam.zn, cam.zf, spatial_sort=so)[:2])
        md, mt = bench_fn(f"main raster 1080p sort={int(sort)}", f, setup)
        fb = jax.jit(lambda s: rasterize_direct(s, w, h, cam.zn,
                                                cam.zf)[:2])
        bd, bt = bench_fn("main raster 1080p sort=0", fb, setup)
        if not (np.asarray(md) == np.asarray(bd)).all():
            print("  MAIN DEPTH MISMATCH", flush=True)
        if not (np.asarray(mt) == np.asarray(bt)).all():
            print("  MAIN TID MISMATCH", flush=True)
    gb = interpolate_gbuffer(setup, depth, tid)
    wp, nm = gb.world_pos, _norm(gb.normal_ws)
    crop = ls.default_vis_crop(h, w)

    vouts = {}
    for u16 in (False, True):
        ss.TAPS_U16 = u16
        fmaps = jax.jit(lambda: ls.render_local_shadow_maps.__wrapped__(
            geom, objects, lights, spot_ids, point_ids,
            # r=2 = the production flagship config (reference samples
            # locals at the sun's radius 2, hello_rendering_paths.cpp:6397)
            map_size=1024, point_size=512, pcf_radius=2, vis_crop=crop))
        sh = fmaps()
        bench_fn(f"atlas render+pack u16={int(u16)}", fmaps)
        # sh as a jit ARGUMENT (not closure): constant tap tables + the
        # crop-cascade conds overflow the remote compiler's executable
        # serialization (2.4GB metadata -> HTTP 500).
        vouts[u16] = np.asarray(bench_fn(
            f"local vis stack u16={int(u16)}",
            jax.jit(ls.local_shadow_vis_stack), sh, wp, nm))
    d = np.abs(vouts[False] - vouts[True])
    print(f"  vis stack u16 max|diff| {d.max():.3e} "
          f"frac>1e-6 {(d > 1e-6).mean():.2e}", flush=True)

    sun_depth = sbase
    ndl = jnp.clip(jnp.sum(nm * _norm(
        -jnp.asarray([0.35, -0.75, 0.45], jnp.float32))[None, None], -1),
        0.0, 1.0)
    uouts = {}
    for u16 in (False, True):
        ss.TAPS_U16 = u16
        ctx_s = ss.make_shadow_context(jnp.asarray(sun_depth), light_vp,
                                       pcf_radius=2)
        uouts[u16] = np.asarray(bench_fn(
            f"sun visibility u16={int(u16)}",
            jax.jit(ss.shadow_visibility_dir), ctx_s, wp, ndl))
    d = np.abs(uouts[False] - uouts[True])
    print(f"  sun vis u16 max|diff| {d.max():.3e} "
          f"frac>1e-6 {(d > 1e-6).mean():.2e}", flush=True)
    ss.TAPS_U16 = u16_was

    # --- (c) fused resolve: planes (XLA transpose) vs lanes (in-kernel
    # extracts) vs the classic interp->shade production path -------------
    import dataclasses as _dc

    from lsr_tpu.passes.forward_plus import (
        resolve_forward_plus, shade_forward_plus)
    from lsr_tpu.passes.shadow import make_sun_shadow

    sun_sh = make_sun_shadow(geom, objects,
                             jnp.asarray([0.35, -0.75, 0.45], jnp.float32))
    ctx_sh = _dc.replace(ctx, shadow=sun_sh)
    router = {}
    for layout in ("planes", "lanes"):
        f = jax.jit(lambda s, d_, t_, c, lo=layout: resolve_forward_plus(
            s, d_, t_, c, lights, cam.view, cam.proj, cam.zn, cam.zf,
            w, h, cap=128, rec_layout=lo)[0])
        router[layout] = np.asarray(bench_fn(
            f"fused resolve 1080p {layout}", f, setup, depth, tid, ctx_sh))
    if not (router["planes"] == router["lanes"]).all():
        dd = np.abs(router["planes"] - router["lanes"])
        print(f"  RESOLVE LAYOUT DIFF max {dd.max():.3e}", flush=True)

    def classic(s, d_, t_, c):
        gbl = interpolate_gbuffer(s, d_, t_, materials=c.materials)
        return shade_forward_plus(
            gbl, c, lights, cam.view, cam.proj, cam.zn, cam.zf,
            w, h, tile_size=16, cap=128, mode="tiled")[0]

    bench_fn("classic interp+shade 1080p", jax.jit(classic),
             setup, depth, tid, ctx_sh)


def part_vis4(stage_only=False):
    """Round-5: A/B the vis-grid-scaled crop cascade (_scaled_crop_sizes)
    against the r4 effective cascade (full-res levels min'd onto the vis/2
    grid = one near-full-grid (540, 640) level), stage-only AND
    whole-frame, plus a bit-exactness check of the final image."""
    import bench as bench_mod
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting.local_shadows import (
        default_vis_crop, plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    spot_ids, point_ids = plan_shadow_casters(lights)
    crops = {
        "scaled(new)": default_vis_crop(h, w),
        # The OLD effective level set at vis/2: (1080,1280)/2 = (540, 640)
        # + full-grid fallback (all other r4 levels min'd to >= grid).
        "r4-effective": ((1080, 1280),),
    }

    # Stage-only: the vis stack on the real frame's G-buffer.
    setup = jax.jit(lambda c: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        c.viewproj, w, h, obj_visible=objects.visible))(cam)
    depth, tid, _ = jax.jit(lambda s, c: rasterize_direct(
        s, w, h, c.zn, c.zf, spatial_sort=True))(setup, cam)
    gb = jax.jit(lambda s, d, t: interpolate_gbuffer(
        s, d, t, materials=ctx.materials, want_face_normal=False))(
            setup, depth, tid)
    wp = jax.block_until_ready(gb.world_pos)
    nm = jax.block_until_ready(_norm(gb.normal_ws))
    for name, crop in crops.items():
        sh = jax.jit(lambda lt, cr=tuple(crop): render_local_shadow_maps(
            geom, objects, lt, spot_ids, point_ids, map_size=512,
            point_size=256, pcf_radius=2, vis_scale=2, vis_crop=cr,
            filter_mode="esm"))(lights)
        for rnd in range(2):
            bench_fn(f"vis stack {name} r{rnd}", jax.jit(
                ls.local_shadow_vis_stack), sh, wp, nm)
    if stage_only:
        return

    # Whole-frame, interleaved.
    fns, outs = {}, {}
    for name, crop in crops.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, shadow_filter="esm",
            local_map=512, local_point=256, vis_scale=2, sun_vis_scale=2,
            shadow_size=1024, vis_crop=tuple(crop))
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
    for rnd in range(2):
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship {name} r{rnd}", f, cam, ctx)
    a = np.asarray(outs["scaled(new)"]).astype(int)
    b = np.asarray(outs["r4-effective"]).astype(int)
    d = np.abs(a - b)
    print(f"  scaled vs r4: max|d| {d.max()} "
          f"frac>2LSB {(d.max(-1) > 2).mean():.3e}")


def part_attr():
    """Round-5 ESM attribution (VERDICT r4 item 4), ONE interleaved run:
    (1) exact PCF at reference budgets, (2) ESM at the SAME reference
    budgets (isolates the filter redesign from every resolution knob),
    (3) the promoted half-res ESM stack, (4) the promoted stack with the
    r4-effective vis crop (isolates the r5 crop-cascade scaling win).
    Plus parity deltas of each vs the PCF anchor."""
    import bench as bench_mod
    from lsr_tpu.lighting.local_shadows import default_vis_crop
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)

    ref = dict(shadow_size=2048, local_map=1024, local_point=512,
               vis_scale=1, sun_vis_scale=1, vis_crop=crop)
    promoted = dict(shadow_filter="esm", shadow_size=1024, local_map=512,
                    local_point=256, vis_scale=2, sun_vis_scale=2,
                    vis_crop=crop)
    variants = {
        "pcf-ref-budgets": dict(ref, shadow_filter="pcf"),
        "esm-ref-budgets": dict(ref, shadow_filter="esm"),
        "esm-promoted": dict(promoted),
        "esm-promoted-r4crop": dict(promoted, vis_crop=((1080, 1280),)),
        # NOT varied: use_resolve=True (the r3-queued fused-resolve lever).
        # Measured infeasible at this config (run 20260820T0346): XLA's
        # register allocator spills 477.5 MB of scoped VMEM compiling
        # resolve_fused_pallas at 1080p/256 lights/64-channel gbuffer —
        # compile aborts (486.71M used of 128M vmem).  The interp fold
        # needs a restructured kernel (fori light loop / smaller gbuffer
        # window), not a flag flip; finding recorded in ARCHITECTURE §8.
    }
    fns, outs = {}, {}
    for name, kw in variants.items():
        frame, _, _ = bench_mod.make_flagship_frame(
            geom, objects, lights, ctx, w, h, **kw)
        fns[name] = jax.jit(lambda c, x, f=frame: f(c, x)[0])
        print(f"built {name}", flush=True)
    res = {}
    for rnd in range(3):
        for name, f in fns.items():
            outs[name] = bench_fn(f"flagship {name} r{rnd}", f, cam, ctx)
            res.setdefault(name, []).append(bench_fn.last_ms)
    print("  === best-of-3 interleaved ===")
    for name, ms in res.items():
        print(f"  {name:24s} {min(ms):8.2f} ms")
    base = np.asarray(outs["pcf-ref-budgets"]).astype(int)
    for name in variants:
        if name == "pcf-ref-budgets":
            continue
        d = np.abs(np.asarray(outs[name]).astype(int) - base)
        print(f"  {name} vs pcf-ref: max|d| {d.max()} "
              f"frac>2LSB {(d.max(-1) > 2).mean():.3e}")


def part_core():
    """Round-5: split the static-both core (~87 ms at HEAD, esm3 r5) into
    its stages at the promoted ESM config — main setup, raster, interp,
    local vis stack, sun visibility, fused shade, binning, post — each
    slope-timed in-process on the real frame's inputs."""
    import dataclasses as _dc

    import bench as bench_mod
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting.local_shadows import (
        default_vis_crop, plan_shadow_casters, render_local_shadow_maps)
    from lsr_tpu.lighting.shadow_sample import (
        make_shadow_context, shadow_visibility_dir)
    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.post import fxaa_pass
    from lsr_tpu.passes.shadow import render_shadow_map
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    crop = default_vis_crop(h, w)
    spot_ids, point_ids = plan_shadow_casters(lights)

    # Build the frame's intermediates once (device-resident).
    sh = jax.jit(lambda lt: render_local_shadow_maps(
        geom, objects, lt, spot_ids, point_ids, map_size=512,
        point_size=256, pcf_radius=2, vis_scale=2, vis_crop=crop,
        filter_mode="esm"))(lights)
    sm_depth, light_vp = jax.jit(lambda: render_shadow_map(
        geom, objects, jnp.asarray([0.35, -0.75, 0.45], jnp.float32),
        map_size=1024))()
    sun_sh = make_shadow_context(sm_depth, light_vp, pcf_radius=2,
                                 filter_mode="esm")
    ctx_sh = _dc.replace(ctx, shadow=sun_sh)

    f_setup = jax.jit(lambda c: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        c.viewproj, w, h, obj_visible=objects.visible))
    setup = bench_fn("main scene_setup", f_setup, cam)
    f_rast = jax.jit(lambda s, c: rasterize_direct(
        s, w, h, c.zn, c.zf, spatial_sort=True)[:2])
    depth, tid = bench_fn("main raster (direct, sorted)", f_rast, setup, cam)
    f_interp = jax.jit(lambda s, d, t: interpolate_gbuffer(
        s, d, t, materials=ctx.materials, want_face_normal=False))
    gb = bench_fn("interp gbuffer", f_interp, setup, depth, tid)
    wp = jax.block_until_ready(gb.world_pos)
    nm = jax.block_until_ready(_norm(gb.normal_ws))

    bench_fn("local vis stack (esm vis/2 crop)", jax.jit(
        ls.local_shadow_vis_stack), sh, wp, nm)
    ndl = jnp.clip(jnp.sum(nm * _norm(
        -jnp.asarray([0.35, -0.75, 0.45], jnp.float32))[None, None], -1),
        0.0, 1.0)
    bench_fn("sun visibility (esm, vis/2)", jax.jit(
        lambda c2, wp2, nd: shadow_visibility_dir(
            c2, wp2[::2, ::2], nd[::2, ::2])), sun_sh, wp, ndl)

    def shade(gb2, c2):
        hdr, _ = shade_forward_plus(
            gb2, c2, lights, cam.view, cam.proj, cam.zn, cam.zf, w, h,
            tile_size=16, cap=128, mode="tiled_depth_range",
            sun_model="pbr_mr", local_shadows=sh, sun_vis_scale=2)
        return hdr
    hdr = bench_fn("shade_forward_plus (whole: vis+bin+kernel)",
                   jax.jit(shade), gb, ctx_sh)

    # Shade WITHOUT local shadows (isolates the vis planes + select cost
    # inside the shade path).
    def shade_nolocal(gb2, c2):
        hdr2, _ = shade_forward_plus(
            gb2, c2, lights, cam.view, cam.proj, cam.zn, cam.zf, w, h,
            tile_size=16, cap=128, mode="tiled_depth_range",
            sun_model="pbr_mr", local_shadows=None, sun_vis_scale=2)
        return hdr2
    bench_fn("shade_forward_plus (no local shadows)",
             jax.jit(shade_nolocal), gb, ctx_sh)

    # Binning alone.
    from lsr_tpu.lighting.light_culling import (
        cull_lights_tiled, tile_depth_ranges_from_buffer)

    def binonly(d):
        tdr = tile_depth_ranges_from_buffer(d, cam.zn, cam.zf, w, h, 128,
                                            tile_h=64)
        lists, counts, st = cull_lights_tiled(
            lights, cam.view, cam.proj, w, h, tile_size=128, tile_h=64,
            cap=256, tile_depth_range=tdr)
        return lists.sum() + counts.sum()
    bench_fn("light binning (tdr + cull_tiled)", jax.jit(binonly), depth)

    f_post = jax.jit(lambda x: fxaa_pass(tonemap_pass(x)))
    bench_fn("post (tonemap+fxaa)", f_post, hdr)
    """A/B the per-frame scene-cull step's occluder raster kernel."""
    import bench as bench_mod
    from lsr_tpu.geometry.occlusion import (
        occlusion_cull_aabbs, render_occluder_depth)
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.scene.scene import make_camera, object_world_aabbs

    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(1920, 1080, eye, (0, 0, 0), fov=np.pi / 3.2)
    wmin, wmax = object_world_aabbs(objects)

    def cull(vp, kernel):
        vis = objects.visible & frustum_cull_objects(vp, wmin, wmax)
        occ = render_occluder_depth(
            geom, objects, vp, cam.zn, cam.zf, 320, 180,
            occluder_mask=vis, kernel=kernel)
        return vis & occlusion_cull_aabbs(occ, vp, wmin, wmax,
                                          cam.zn, cam.zf)

    outs = {}
    for kernel in ("binned", "direct"):
        outs[kernel] = bench_fn(
            f"scene_cull occluder={kernel}", jax.jit(
                lambda vp, k=kernel: cull(vp, k)), cam.viewproj)
    print("  direct == binned:",
          bool(jnp.array_equal(outs["direct"], outs["binned"])))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("setup",):
        part_setup()
    if which in ("pack", "all"):
        part_pack()
    if which in ("crop",):
        part_crop()
    if which in ("frame",):
        part_frame()
    if which in ("cull",):
        part_cull()
    if which in ("core",):
        part_core()
    if which in ("vis4",):
        part_vis4()
    if which in ("vis4s",):
        part_vis4(stage_only=True)
    if which in ("attr",):
        part_attr()
    if which in ("r3ab",):
        part_r3ab()
    if which in ("esm",):
        part_esm()
    if which in ("esm2",):
        part_esm2()
    if which in ("esm3",):
        part_esm3()
    if which in ("esm4",):
        part_esm4()
    if which in ("esm5",):
        part_esm5()
    if which in ("esm6",):
        part_esm6()
    if which in ("raster", "all"):
        part_raster()
    if which in ("vis", "all"):
        part_vis()
