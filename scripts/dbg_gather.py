"""Diagnose the take_rows regression inside the real interp pipeline."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {ms:9.2f} ms", flush=True)
    return out


def main():
    import bench
    from lsr_tpu.raster.interp import pack_interp_records
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)

    setup = jax.block_until_ready(jax.jit(lambda vp: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        vp, w, h))(cam.viewproj))
    depth, tid, _ = jax.block_until_ready(jax.jit(
        lambda s: rasterize_direct(s, w, h, cam.zn, cam.zf))(setup))

    safe = jnp.maximum(tid, 0)
    lanes = pack_interp_records(setup, ctx.materials).shape[-1]
    print(f"record lanes = {lanes}, rows = {setup.valid.shape[0]}")

    # A: current take_rows (flat 1D + slice gather), packing fused in jit.
    def v_a(s, idx):
        from lsr_tpu.core.gather import take_rows
        return take_rows(pack_interp_records(s, ctx.materials), idx)

    # B: old 2D row gather, packing fused in jit.
    def v_b(s, idx):
        return pack_interp_records(s, ctx.materials)[idx]

    # C: take_rows with an optimization barrier after packing (forces the
    # table to materialize before the gather sees it).
    def v_c(s, idx):
        from lsr_tpu.core.gather import take_rows
        tbl = jax.lax.optimization_barrier(pack_interp_records(s, ctx.materials))
        return take_rows(tbl, idx)

    # D: jnp.take on the 2D table.
    def v_d(s, idx):
        return jnp.take(pack_interp_records(s, ctx.materials), idx.reshape(-1),
                        axis=0).reshape(idx.shape + (lanes,))

    # E: barrier + plain 2D indexing.
    def v_e(s, idx):
        tbl = jax.lax.optimization_barrier(pack_interp_records(s, ctx.materials))
        return tbl[idx]

    # F: precomputed table as a jit argument (gather only, no packing).
    tbl_arg = jax.block_until_ready(
        jax.jit(lambda s: pack_interp_records(s, ctx.materials))(setup))

    def v_f(tbl, idx):
        from lsr_tpu.core.gather import take_rows
        return take_rows(tbl, idx)

    def v_g(tbl, idx):
        return tbl[idx]

    for name, fn, args in (
        ("A take_rows fused", v_a, (setup, safe)),
        ("B 2D gather fused", v_b, (setup, safe)),
        ("C take_rows + barrier", v_c, (setup, safe)),
        ("D jnp.take fused", v_d, (setup, safe)),
        ("E 2D gather + barrier", v_e, (setup, safe)),
        ("F take_rows, table as arg", v_f, (tbl_arg, safe)),
        ("G 2D gather, table as arg", v_g, (tbl_arg, safe)),
    ):
        try:
            timeit(name, jax.jit(fn), *args)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
