"""A/B spot-plane visibility gather variants (row clamp, per-slot tables).

The vis stack is 286 ms at 1080p (dbg_local part_vis): 8 spot planes x 2M
pixels = 16M gather rows from a shared 60MB tap table at ~60M rows/s.  This
script isolates what governs the rate: row locality (clamping out-of-cone
pixels to row 0) and table size (per-slot 7.5MB tables).
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import bench_fn


def main():
    import bench as bench_mod
    from lsr_tpu.core.gather import take_rows
    from lsr_tpu.lighting import local_shadows as ls
    from lsr_tpu.lighting.local_shadows import (
        plan_shadow_casters, render_local_shadow_maps)
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
    wp = gb.world_pos
    nm = _norm(gb.normal_ws)

    sh = jax.jit(lambda: render_local_shadow_maps(
        geom, objects, lights, spot_ids, point_ids,
        map_size=1024, point_size=512, pcf_radius=1))()

    spot_ks = [k for k in range(sh.n_shadowed)
               if sh.kinds[k] != ls.SHADOW_POINT_CUBE]

    def planes_base(wp, nm):
        return ls._spot_planes(sh, spot_ks, wp, nm)

    # Variant A: clamp rows to 0 outside in_map (locality probe).
    def spot_planes_clamped(sh, ks, world_pos, normal, per_slot):
        base = np.asarray([sh.base_slots[k] for k in ks], np.int32)
        pos = sh.caster_pos[np.asarray(ks)]
        vp = sh.spot_viewproj[base]
        rel, rel_len, bias = ls._bias_ndl(sh, pos, world_pos, normal)
        vp_b = vp[:, None, None, :]
        px, py, pz, pw = ls._project_rows(vp_b, world_pos[None])
        w_ok = jnp.abs(pw) >= 1e-8
        w_safe = jnp.where(w_ok, pw, 1.0)
        u = (px / w_safe) * 0.5 + 0.5
        v = (py / w_safe) * 0.5 + 0.5
        z01 = (pz / w_safe) * 0.5 + 0.5
        s = sh.spot_size
        n_anchor = -(-s // ls._TAP_STRIDE)
        if per_slot:
            slot_rows = jnp.zeros((len(ks), 1, 1), jnp.int32)
        else:
            slot_rows = jnp.asarray(
                (base * n_anchor * n_anchor)[:, None, None])
        in_reach = jnp.ones(pw.shape, bool)
        rows, rx, ry, in_map = ls._uvz_to_rows(
            u, v, z01, pw, w_ok, in_reach, s, slot_rows)
        rows = jnp.where(in_map, rows, 0)
        z_test = z01 - bias
        r = sh.pcf_radius
        if per_slot:
            na2 = n_anchor * n_anchor
            outs = []
            for i, k in enumerate(ks):
                tab = jax.lax.dynamic_slice_in_dim(
                    sh.spot_taps, int(base[i]) * na2, na2, 0)
                outs.append(ls._pcf_from_rows(
                    tab, rows[i:i + 1], rx[i:i + 1], ry[i:i + 1],
                    z_test[i:i + 1], r)[0])
            lit = jnp.stack(outs)
        else:
            lit = ls._pcf_from_rows(sh.spot_taps, rows, rx, ry, z_test, r)
        strength = jnp.clip(sh.strength[np.asarray(ks)], 0.0, 1.0)
        vis = 1.0 + (lit - 1.0) * strength[:, None, None]
        return jnp.where(in_map, vis, 1.0)

    o0 = bench_fn("spot planes base (shared table)", jax.jit(planes_base),
                  wp, nm)
    o1 = bench_fn("spot planes row-clamped", jax.jit(
        lambda a, b: spot_planes_clamped(sh, spot_ks, a, b, False)), wp, nm)
    print("  clamp == base:", bool(jnp.allclose(o0, o1, atol=1e-6)))
    o2 = bench_fn("spot planes per-slot tables + clamp", jax.jit(
        lambda a, b: spot_planes_clamped(sh, spot_ks, a, b, True)), wp, nm)
    print("  per-slot == base:", bool(jnp.allclose(o0, o2, atol=1e-6)))

    # In-cone pixel fraction (how much locality the clamp buys).
    base = np.asarray([sh.base_slots[k] for k in spot_ks], np.int32)
    vp = sh.spot_viewproj[base][:, None, None, :]
    px, py, pz, pw = ls._project_rows(vp, wp[None])
    w_ok = jnp.abs(pw) >= 1e-8
    w_safe = jnp.where(w_ok, pw, 1.0)
    u = (px / w_safe) * 0.5 + 0.5
    v = (py / w_safe) * 0.5 + 0.5
    z01 = (pz / w_safe) * 0.5 + 0.5
    in_map = (w_ok & (pw > 0) & (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
              & (z01 > 0) & (z01 < 1))
    frac = np.asarray(jnp.mean(in_map.astype(jnp.float32), axis=(1, 2)))
    print("  in-cone pixel fraction per spot:", np.round(frac, 3))


if __name__ == "__main__":
    main()
