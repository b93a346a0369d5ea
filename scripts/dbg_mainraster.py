"""A/B main-view raster tile configs on the bench scene (with ids)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np


def main():
    import bench
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    geom, objects, lights, ctx, eye = bench.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)
    setup = jax.block_until_ready(jax.jit(lambda: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h))())

    ref = None
    for th, tw, ck in ((64, 128, 16), (128, 128, 16), (32, 128, 16),
                       (64, 256, 16), (64, 128, 8)):
        try:
            f = jax.jit(lambda s, th=th, tw=tw, ck=ck: rasterize_direct(
                s, w, h, cam.zn, cam.zf, tile_h=th, tile_w=tw, chunk=ck)[:2])
            out = jax.block_until_ready(f(setup))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = f(setup)
                jax.block_until_ready(out)
                ts.append((time.perf_counter() - t0) / 8 * 1000)
            d = np.asarray(out[0])
            same = "?" if ref is None else str(bool((d == ref).all()))
            if ref is None:
                ref = d
            print(f"raster th={th} tw={tw} ck={ck}: min {min(ts):7.2f} ms "
                  f"match={same}", flush=True)
        except Exception as e:
            print(f"th={th} tw={tw} ck={ck}: FAIL {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
