"""A/B the fused shade kernel configs on the bench workload (one process)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters * 1000)
    print(f"{name:52s} {min(times):8.2f} ms  (runs: "
          + " ".join(f"{t:.1f}" for t in times) + ")", flush=True)
    return out


def main():
    import bench
    from lsr_tpu.lighting.light_culling import (
        cull_lights_tiled, tile_depth_ranges_from_buffer)
    from lsr_tpu.lighting.shade_kernel import shade_fused_pallas
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    from lsr_tpu.shading.models import _norm

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)

    setup = jax.block_until_ready(jax.jit(lambda vp: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        vp, w, h))(cam.viewproj))
    depth, tid, _ = jax.block_until_ready(jax.jit(
        lambda s: rasterize_direct(s, w, h, cam.zn, cam.zf))(setup))
    gb = jax.block_until_ready(jax.jit(lambda s, d, t: interpolate_gbuffer(
        s, d, t, materials=ctx.materials))(setup, depth, tid))

    albedo = jnp.maximum(gb.mat[..., 0:3], 0.0)
    metal = gb.mat[..., 3]
    rough = gb.mat[..., 4]
    n = jax.jit(_norm)(gb.normal_ws)
    vis = jnp.ones_like(gb.depth01)

    # Report the binning stats per config.
    for th, tw, label in ((64, 128, "64x128"), (32, 128, "32x128")):
        lists, counts, st = jax.jit(lambda th=th, tw=tw: cull_lights_tiled(
            lights, cam.view, cam.proj, w, h, tile_size=tw, tile_h=th,
            cap=256))()
        tdr = jax.jit(lambda th=th: tile_depth_ranges_from_buffer(
            gb.depth01, cam.zn, cam.zf, w, h, 128, tile_h=th))()
        lists2, counts2, st2 = jax.jit(
            lambda th=th, tw=tw, tdr=tdr: cull_lights_tiled(
                lights, cam.view, cam.proj, w, h, tile_size=tw, tile_h=th,
                cap=256, tile_depth_range=tdr))()
        print(f"tiles {label}: plain sum={int(counts.sum())} "
              f"max={int(st['max_count'])} | depth-range "
              f"sum={int(counts2.sum())} max={int(st2['max_count'])}")

    def run(tile_h, chunk, use_tdr):
        tdr = None
        if use_tdr:
            tdr = tile_depth_ranges_from_buffer(
                gb.depth01, cam.zn, cam.zf, w, h, 128, tile_h=tile_h)
        lit, stats = shade_fused_pallas(
            gb.world_pos, n, gb.covered, albedo, metal, rough, vis,
            ctx.camera_pos, ctx.light_dir_ws,
            ctx.light_color * ctx.light_intensity,
            lights, cam.view, cam.proj, w, h,
            tile_h=tile_h, tile_w=128, cap=256, chunk=chunk,
            tile_depth_range=tdr, sun_model="pbr_mr")
        return lit

    for tile_h in (64, 32):
        for chunk in (16,):
            for use_tdr in (False, True):
                name = f"shade th={tile_h} chunk={chunk} tdr={use_tdr}"
                try:
                    timeit(name, jax.jit(
                        lambda tile_h=tile_h, chunk=chunk, use_tdr=use_tdr:
                        run(tile_h, chunk, use_tdr)))
                except Exception as e:
                    print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
