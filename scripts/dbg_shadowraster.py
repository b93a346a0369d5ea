"""A/B shadow-map raster configs (tile size / chunk) on the bench scene."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np


def main():
    import bench
    from lsr_tpu.camera.light_camera import build_dir_light_camera
    from lsr_tpu.raster.setup import CULL_NONE, DEPTH_NDC01, scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import shadow_caster_aabb

    geom, objects, lights, ctx, eye = bench.build_scene()
    sun = jnp.asarray([0.35, -0.75, 0.45], jnp.float32)
    S = 2048

    smin, smax = shadow_caster_aabb(objects)
    _, _, light_vp = build_dir_light_camera(smin, smax, sun, S)
    caster = objects.casts_shadow & objects.visible
    setup = jax.block_until_ready(jax.jit(lambda: scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        light_vp, S, S, cull_mode=CULL_NONE, obj_visible=caster))())

    ref = None
    for th, tw, chunk in ((64, 128, 16), (128, 128, 16), (64, 256, 16),
                          (128, 256, 16), (64, 128, 32), (256, 256, 16)):
        try:
            f = jax.jit(lambda s, th=th, tw=tw, ck=chunk: rasterize_direct(
                s, S, S, jnp.float32(0.0), jnp.float32(1.0),
                depth_mode=DEPTH_NDC01, track_ids=False,
                tile_h=th, tile_w=tw, chunk=ck)[0])
            out = jax.block_until_ready(f(setup))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = f(setup)
                jax.block_until_ready(out)
                ts.append((time.perf_counter() - t0) / 8 * 1000)
            same = "?" if ref is None else str(bool((np.asarray(out) == ref).all()))
            if ref is None:
                ref = np.asarray(out)
            print(f"shadow raster th={th} tw={tw} ck={chunk}: "
                  f"min {min(ts):7.2f} ms  match={same}", flush=True)
        except Exception as e:
            print(f"th={th} tw={tw} ck={chunk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
