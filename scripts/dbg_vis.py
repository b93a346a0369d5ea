"""A/B PCF visibility tap strides + depth-range shade on the bench workload."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

def timeit(name, fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter()-t0)/iters*1000)
    print(f"{name:44s} {min(ts):8.2f} ms (runs: " + " ".join(f"{t:.1f}" for t in ts) + ")", flush=True)
    return out

def main():
    import bench
    from lsr_tpu.lighting.shadow_sample import make_shadow_context, shadow_visibility_dir, pack_shadow_taps
    from lsr_tpu.passes.shadow import render_shadow_map
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera
    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi/3.2)
    sun = jnp.asarray([0.35, -0.75, 0.45], jnp.float32)
    setup = jax.block_until_ready(jax.jit(lambda vp: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices, geom.vtx_obj,
        geom.tri_obj, objects.model, objects.normal_mat, vp, w, h))(cam.viewproj))
    depth, tid, _ = jax.block_until_ready(jax.jit(lambda s: rasterize_direct(s, w, h, cam.zn, cam.zf))(setup))
    gb = jax.block_until_ready(jax.jit(lambda s, d, t: interpolate_gbuffer(s, d, t, materials=ctx.materials))(setup, depth, tid))
    sm, lvp = jax.block_until_ready(jax.jit(lambda: render_shadow_map(geom, objects, sun, map_size=2048))())
    ndl = jnp.ones_like(gb.depth01)
    for stride in (8, 6):
        timeit(f"pack taps stride={stride}", jax.jit(lambda d, st=stride: pack_shadow_taps(d, 2, st)), sm)
        sc = jax.block_until_ready(jax.jit(lambda d, st=stride: make_shadow_context(d, lvp, tap_stride=st))(sm))
        timeit(f"shadow_visibility stride={stride}", jax.jit(shadow_visibility_dir), sc, gb.world_pos, ndl)

if __name__ == "__main__":
    main()
