"""A/B rasterize_direct vs rasterize_chunklist on the bench workloads:
8x1024^2 spot slots, 12x512^2 point faces, sun 2048^2, main 1080p view.
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
    from lsr_tpu.geometry.volumes import frustum_cull_objects
    from lsr_tpu.lighting.local_shadows import (
        _point_face_viewprojs, _spot_viewproj, plan_shadow_casters)
    from lsr_tpu.raster.setup import (
        CULL_NONE, DEPTH_NDC01, scene_setup)
    from lsr_tpu.raster.tiled import rasterize_chunklist, rasterize_direct
    from lsr_tpu.scene.scene import make_camera, object_world_aabbs

    geom, objects, lights, ctx, eye = bench_mod.build_scene()
    spot_ids, point_ids = plan_shadow_casters(lights)
    wmin, wmax = object_world_aabbs(objects)
    caster_mask = objects.casts_shadow & objects.visible
    zero, one = jnp.float32(0.0), jnp.float32(1.0)

    def slot_setup(vp, size):
        sm = caster_mask & frustum_cull_objects(vp, wmin, wmax)
        return scene_setup(
            geom.positions, geom.normals, geom.uvs, geom.indices,
            geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
            vp, size, size, cull_mode=CULL_NONE, obj_visible=sm)

    def stack_bench(name_sz, vps, size, variants):
        for vname, fn in variants:
            out = bench_fn(f"{name_sz} {vname}", jax.jit(fn), vps)
        return out

    for label, vps, size in (
        ("spot 8x1024", jnp.stack([
            _spot_viewproj(lights.position[s], lights.direction[s],
                           lights.outer_angle[s], lights.range[s])
            for s in spot_ids]), 1024),
        ("point 12x512", jnp.stack([
            vp for p in point_ids
            for vp in _point_face_viewprojs(lights.position[p],
                                            lights.range[p])]), 512),
    ):
        def map_direct(vps, size=size):
            def rs(vp):
                d, _, _ = rasterize_direct(
                    slot_setup(vp, size), size, size, zero, one,
                    depth_mode=DEPTH_NDC01, track_ids=False,
                    tile_h=128, tile_w=128)
                return d
            return jax.lax.map(rs, vps)

        def map_chunk(vps, size=size):
            def rs(vp):
                d, _, _ = rasterize_chunklist(
                    slot_setup(vp, size), size, size, zero, one,
                    depth_mode=DEPTH_NDC01, track_ids=False)
                return d
            return jax.lax.map(rs, vps)

        d0 = bench_fn(f"{label} map(direct)", jax.jit(map_direct), vps)
        d1 = bench_fn(f"{label} map(chunklist)", jax.jit(map_chunk), vps)
        print("  match:", bool(jnp.array_equal(d0, d1)))

    # Sun shadow 2048^2.
    from lsr_tpu.passes.shadow import render_shadow_map
    sun = jnp.asarray([0.35, -0.75, 0.45], jnp.float32)

    def sun_map(_):
        d, vp = render_shadow_map(geom, objects, sun, map_size=2048)
        return d
    bench_fn("sun shadow 2048 (current path)", jax.jit(sun_map), zero)

    # Main view 1080p: direct vs chunklist (with ids).
    w, h = 1920, 1080
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    msetup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    msetup = jax.block_until_ready(msetup)

    def main_direct(s):
        d, t, _ = rasterize_direct(s, w, h, cam.zn, cam.zf)
        return d, t

    def main_chunk(s):
        d, t, _ = rasterize_chunklist(s, w, h, cam.zn, cam.zf)
        return d, t

    o0 = bench_fn("main 1080p direct", jax.jit(main_direct), msetup)
    o1 = bench_fn("main 1080p chunklist", jax.jit(main_chunk), msetup)
    print("  depth match:", bool(jnp.array_equal(o0[0], o1[0])),
          " tid match:", bool(jnp.array_equal(o0[1], o1[1])))


if __name__ == "__main__":
    main()
