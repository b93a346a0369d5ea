"""A/B: tap-table anchor stride for the PCF gathers (local + sun vis).

At r=2/u16 the window lane count and the table row count trade off:
  stride 4 -> win 8,  64 taps = 32 u32 lanes, (S/4)^2 rows
  stride 6 -> win 10, 100 taps = 50 u32 lanes, (S/6)^2 rows  (current local)
  stride 8 -> win 12, 144 taps = 72 u32 lanes, (S/8)^2 rows  (current sun)
The gather row rate is table-size-bound (memory: tpu-gather-cost-model),
and per-row cost may also scale with lane-group count — which way the
trade goes at r=2 is only answerable on hardware.  Exactness: all strides
produce identical lit fractions (the lane mask always selects the same
(2r+1)^2 texels); max|diff| printed as a guard.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import bench_fn  # noqa: E402


def main():
    import bench as bench_mod
    from lsr_tpu.camera.light_camera import build_dir_light_camera
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting import shadow_sample as ss
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import CULL_NONE, scene_setup
    from lsr_tpu.raster.setup import DEPTH_NDC01
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera, shadow_caster_aabb
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    spot_ids, point_ids = ls.plan_shadow_casters(lights)

    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    gb = interpolate_gbuffer(setup, depth, tid)
    wp, nm = gb.world_pos, _norm(gb.normal_ws)
    crop = ls.default_vis_crop(h, w)

    # --- local vis stack: _TAP_STRIDE sweep -----------------------------
    stride_was = ls._TAP_STRIDE
    vouts = {}
    for stride in (4, 6, 8):
        ls._TAP_STRIDE = stride
        fmaps = jax.jit(lambda: ls.render_local_shadow_maps.__wrapped__(
            geom, objects, lights, spot_ids, point_ids,
            map_size=1024, point_size=512, pcf_radius=2, vis_crop=crop))
        sh = fmaps()
        bench_fn(f"atlas render+pack stride={stride}", fmaps)
        # sh as a jit ARGUMENT (closure consts + crop conds overflow the
        # remote compiler's executable serialization; see dbg_local r3ab).
        vouts[stride] = np.asarray(bench_fn(
            f"local vis stack stride={stride}",
            jax.jit(ls.local_shadow_vis_stack), sh, wp, nm))
    ls._TAP_STRIDE = stride_was
    for stride in (4, 8):
        d = np.abs(vouts[stride] - vouts[6])
        print(f"  local stride {stride} vs 6: max|diff| {d.max():.3e}",
              flush=True)

    # --- sun visibility: tap_stride sweep --------------------------------
    S = 2048
    smin, smax = shadow_caster_aabb(objects)
    _, _, light_vp = build_dir_light_camera(
        smin, smax, jnp.asarray([0.35, -0.75, 0.45], jnp.float32), S)
    caster = objects.casts_shadow & objects.visible
    sm_setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        light_vp, S, S, cull_mode=CULL_NONE, obj_visible=caster)
    sun_depth, _, _ = jax.jit(
        lambda s: rasterize_direct(s, S, S, jnp.float32(0.0),
                                   jnp.float32(1.0),
                                   depth_mode=DEPTH_NDC01,
                                   track_ids=False))(sm_setup)
    sun_dir = _norm(-jnp.asarray([0.35, -0.75, 0.45], jnp.float32))
    ndl = jnp.clip(jnp.sum(nm * sun_dir[None, None], -1), 0.0, 1.0)

    souts = {}
    for stride in (4, 6, 8):
        shctx = jax.jit(
            lambda d, st=stride: ss.make_shadow_context(
                d, light_vp, pcf_radius=2, tap_stride=st))(sun_depth)
        bench_fn(f"sun pack stride={stride}",
                 jax.jit(lambda d, st=stride: ss.make_shadow_context(
                     d, light_vp, pcf_radius=2, tap_stride=st).depth_taps),
                 sun_depth)
        souts[stride] = np.asarray(bench_fn(
            f"sun visibility stride={stride}",
            jax.jit(ss.shadow_visibility_dir), shctx, wp, ndl))
    for stride in (4, 6):
        d = np.abs(souts[stride] - souts[8])
        print(f"  sun stride {stride} vs 8: max|diff| {d.max():.3e}",
              flush=True)


if __name__ == "__main__":
    main()
