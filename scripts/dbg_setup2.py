"""Sub-stage attribution of the high-poly scene_setup (VERDICT r5 item 6:
329 ms for 1.05M tris = 3.2 Mtris/s through transform+clip+setup; the
1M-tri frame is setup-dominated).  Each stage is slope-timed cumulatively
on the real monkey-grid scene so differences give stage costs.

Usage: python scripts/dbg_setup2.py [grid]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_timing import bench_fn  # noqa: E402

from bench_highpoly import build_highpoly_scene  # noqa: E402


def main():
    from lsr_tpu.scene.scene import make_camera

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    w, h = 1920, 1080
    geom, objects = build_highpoly_scene(grid)
    ext = grid * 1.2 * 0.72
    cam = make_camera(w, h, (ext, ext * 0.9, -ext), (0, 0, 0),
                      fov=np.pi / 3.0)
    n_tri = int(geom.indices.shape[0])
    print(f"# {n_tri / 1e3:.0f}K tris, {geom.positions.shape[0] / 1e3:.0f}K "
          f"verts", flush=True)

    from lsr_tpu.raster.clip import clip_triangles_near
    from lsr_tpu.raster.setup import (
        assemble_and_clip, build_setup, scene_setup, vertex_stage)

    pos, nrm, uvs = geom.positions, geom.normals, geom.uvs
    idx, vo, to = geom.indices, geom.vtx_obj, geom.tri_obj
    models, nmats = objects.model, objects.normal_mat

    def vs(vp):
        world, clip_v, n_ws = vertex_stage(pos, nrm, uvs, vo, models,
                                           nmats, vp)
        return world.sum() + clip_v.sum() + n_ws.sum()

    bench_fn("vertex_stage", jax.jit(vs), cam.viewproj)

    def gather(vp):
        world, clip_v, n_ws = vertex_stage(pos, nrm, uvs, vo, models,
                                           nmats, vp)
        vrec = jnp.concatenate([clip_v, world, n_ws, uvs], axis=-1)
        crec = vrec[idx]
        return crec.sum()

    bench_fn("+ corner gather (T,3,12)", jax.jit(gather), cam.viewproj)

    def clip_stage(vp):
        world, clip_v, n_ws = vertex_stage(pos, nrm, uvs, vo, models,
                                           nmats, vp)
        clip_t, attrs, valid, obj2 = assemble_and_clip(
            clip_v, world, n_ws, uvs, idx, to)
        return (clip_t.sum() + sum(a.sum() for a in attrs.values())
                + valid.sum() + obj2.sum())

    bench_fn("+ clip (case tables)", jax.jit(clip_stage), cam.viewproj)

    def full(vp):
        st = scene_setup(pos, nrm, uvs, idx, vo, to, models, nmats, vp,
                         w, h, obj_visible=objects.visible)
        return st.coef.sum() + st.valid.sum()

    bench_fn("full scene_setup", jax.jit(full), cam.viewproj)

    # Clip-only variants to size the case-table gather's share.
    def clip_noattrs(vp):
        world, clip_v, n_ws = vertex_stage(pos, nrm, uvs, vo, models,
                                           nmats, vp)
        tri_clip = clip_v[idx]
        clip2, _, valid2 = clip_triangles_near({}, tri_clip)
        return clip2.sum() + valid2.sum()

    bench_fn("clip depth-only (C=4)", jax.jit(clip_noattrs), cam.viewproj)

    # Depth-only front end (scene_setup_depth) for scale reference.
    from lsr_tpu.raster.setup import scene_setup_depth

    def depth_fe(vp):
        st = scene_setup_depth(pos, idx, vo, to, models, vp, w, h)
        return st.coef.sum() + st.valid.sum()

    bench_fn("scene_setup_depth (full FE)", jax.jit(depth_fe), cam.viewproj)


if __name__ == "__main__":
    main()
