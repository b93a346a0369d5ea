"""A/B the fused shade kernel configs on the bench workload (one process).

Timing uses the slope method (tpu_timing.bench_fn) — block_until_ready
does not wait on the tunnel backend."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import bench_fn  # noqa: E402

timeit = bench_fn


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

    def run(tile_h, chunk, use_tdr, fastmath=()):
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
            tile_depth_range=tdr, sun_model="pbr_mr", fastmath=fastmath)
        return lit

    outs = {}
    for tile_h in (128, 64, 32):
        for chunk in (8, 16, 32):
            for use_tdr in (False, True):
                name = f"shade th={tile_h} chunk={chunk} tdr={int(use_tdr)}"
                try:
                    outs[(tile_h, chunk, use_tdr)] = timeit(name, jax.jit(
                        lambda tile_h=tile_h, chunk=chunk, use_tdr=use_tdr:
                        run(tile_h, chunk, use_tdr)))
                except Exception as e:
                    print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")
    base = outs.get((64, 16, True))
    for k, v in outs.items():
        if base is not None and v is not None \
                and not np.array_equal(np.asarray(v), np.asarray(base)):
            d = np.abs(np.asarray(v) - np.asarray(base)).max()
            print(f"  config {k} differs from (64,16,True): max|d|={d:.2e}")

    # Transcendental cost probes (production tile config): apow1 should be
    # ~exact on the bench scene (every atten_power is 1.0); nospec_pow is
    # WRONG output, cost bound only.
    for fm in (("apow1",), ("nospec_pow",), ("apow1", "nospec_pow")):
        o = timeit(f"shade th=64 ck=16 tdr=1 fast={'+'.join(fm)}", jax.jit(
            lambda fm=fm: run(64, 16, True, fastmath=fm)))
        if base is not None:
            d = np.abs(np.asarray(o) - np.asarray(base)).max()
            print(f"  fast={'+'.join(fm)}: max|diff| vs base {d:.3e}")


if __name__ == "__main__":
    main()
