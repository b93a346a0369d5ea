"""In-process interleaved A/B of the whole bench frame: tap stride x barrier."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import jax, jax.numpy as jnp, numpy as np


def main():
    import bench
    from lsr_tpu.core.frame import ShadowPassParams
    from lsr_tpu.lighting import shadow_sample
    from lsr_tpu.lighting.shadow_sample import make_shadow_context
    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.post import fxaa_pass
    from lsr_tpu.passes.shadow import render_shadow_map
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.scene.scene import make_camera

    w, h = 1920, 1080
    sun = np.asarray([0.35, -0.75, 0.45], np.float32)
    geom, objects, lights, ctx, eye = bench.build_scene()
    cam = make_camera(w, h, eye, (0, 0, 0), fov=np.pi / 3.2)

    def make_frame(barrier, stride, mode="tiled"):
        def frame(cam, ctx_t):
            shadow_sample.TAPS_BARRIER = barrier  # read at trace time
            sm, lvp = render_shadow_map(geom, objects, jnp.asarray(sun),
                                        map_size=2048)
            sc = make_shadow_context(sm, lvp, tap_stride=stride)
            ctx_sh = dataclasses.replace(ctx_t, shadow=sc)
            setup = scene_setup(
                geom.positions, geom.normals, geom.uvs, geom.indices,
                geom.vtx_obj, geom.tri_obj, objects.model,
                objects.normal_mat, cam.viewproj, w, h)
            depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
            gb = interpolate_gbuffer(setup, depth, tid,
                                     materials=ctx.materials,
                                     want_face_normal=False)
            hdr, _ = shade_forward_plus(
                gb, ctx_sh, lights, cam.view, cam.proj, cam.zn, cam.zf,
                w, h, tile_size=16, cap=128, mode=mode,
                sun_model="pbr_mr")
            return fxaa_pass(tonemap_pass(hdr))
        return jax.jit(frame)

    variants = [
        ("st=8 tiled", make_frame(True, 8)),
        ("st=8 tdr", make_frame(True, 8, mode="tiled_depth_range")),
    ]
    for name, f in variants:
        t0 = time.perf_counter()
        jax.block_until_ready(f(cam, ctx))
        print(f"compiled {name} in {time.perf_counter()-t0:.0f}s", flush=True)

    results = {name: [] for name, _ in variants}
    for rnd in range(4):
        for name, f in variants:
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(cam, ctx)
            jax.block_until_ready(out)
            results[name].append((time.perf_counter() - t0) / 8 * 1000)
    for name, ts in results.items():
        print(f"{name}: min {min(ts):7.2f} ms  runs " +
              " ".join(f"{t:.1f}" for t in ts), flush=True)


if __name__ == "__main__":
    main()
