"""Measure the five BASELINE.md configs on the TPU (fps each)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def timeit_frames(name, fn, frames=30, warmup=5):
    # block_until_ready does NOT wait on the tunnel backend; drain via a
    # host-readback probe and report net throughput (utils/devtime).
    from lsr_tpu.utils.devtime import probe

    out = None
    for i in range(warmup):
        out = fn(i)
    probe(out)
    t0 = time.perf_counter()
    for i in range(frames):
        out = fn(i)
    probe(out)
    dt = (time.perf_counter() - t0) / frames
    print(f"{name}: {1.0 / dt:.2f} fps ({dt * 1000:.2f} ms)", flush=True)
    return 1.0 / dt


def main():
    import jax
    import jax.numpy as jnp

    from lsr_tpu.core import math3d as m3
    from lsr_tpu.core.frame import ShadowPassParams
    from lsr_tpu.io.obj import load_obj, make_plane
    from lsr_tpu.passes.forward_plus import shade_forward_plus
    from lsr_tpu.passes.shadow import make_sun_shadow
    from lsr_tpu.passes.tonemap import tonemap_pass
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.raster.tiled import rasterize_direct
    from lsr_tpu.raster.wireframe import render_wireframe
    from lsr_tpu.render import concat_scene, render_forward, simple_camera
    from lsr_tpu.scene.scene import SceneBuilder, cull_scene, make_camera
    from lsr_tpu.shading.common import checkerboard_texture, make_materials
    from lsr_tpu.shading.models import (
        composite_over_background,
        make_shade_context,
        shade_blinn_phong,
    )

    monkey = load_obj(
        "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"
    )

    # Config 1: wireframe 600x600.
    timeit_frames("config1_wireframe_600", lambda i: render_wireframe(monkey, 600, 600))

    # Config 2: Blinn-Phong monkey + floor, textured, 800x600.
    w, h = 800, 600
    batch = {k: jnp.asarray(v)
             for k, v in concat_scene([monkey, make_plane(4.0, y=-1.2)]).items()}
    models = jnp.stack([jnp.asarray(np.asarray(m3.rotate_y(0.5))),
                        jnp.eye(4)])
    nmats = jnp.stack([jnp.asarray(np.asarray(m3.normal_matrix(m3.rotate_y(0.5)))),
                       jnp.eye(3)])
    vp, zn, zf = simple_camera(w, h, (0.8, 0.9, -3.2), (0, -0.2, 0))
    mats = make_materials(base_color=[(0.85, 0.55, 0.35), (0.6, 0.62, 0.65)],
                          roughness=[0.4, 0.8], tex_id=[-1, 0])
    ctx2 = make_shade_context(mats, light_dir_ws=(0.45, -0.7, 0.55),
                              light_intensity=2.8, camera_pos=(0.8, 0.9, -3.2),
                              textures=jnp.asarray(checkerboard_texture(128))[None])
    timeit_frames("config2_blinn_800x600", lambda i: render_forward(
        batch, models, nmats, vp, zn, zf, ctx2, w, h,
        model_name="blinn_phong")[0])

    # Config 3: shadow-mapped 6-monkey scene + culling, 800x600, 2048 shadow.
    sb = SceneBuilder()
    rng = np.random.default_rng(7)
    for i in range(6):
        sb.add(monkey, np.asarray(
            m3.translate([(i % 3 - 1) * 2.2, 0.0, (i // 3) * 2.5 - 0.5])
            @ m3.rotate_y(float(rng.uniform(0, 6.28)))), material=i % 3)
    sb.add(make_plane(8.0, y=-1.0), material=3, casts_shadow=False)
    geom, objects = sb.build()
    cam = make_camera(w, h, (0.5, 2.2, -6.0), (0, 0, 0.5))
    mats3 = make_materials(
        base_color=[(0.85, 0.5, 0.3), (0.4, 0.65, 0.85), (0.6, 0.8, 0.45),
                    (0.55, 0.55, 0.58)],
        roughness=[0.4, 0.3, 0.7, 0.85])
    sun = jnp.asarray((0.35, -0.8, 0.45), jnp.float32)

    def frame3(i):
        del i
        import dataclasses

        vis = cull_scene(objects, cam.viewproj)
        objs = dataclasses.replace(objects, visible=vis)
        shadow = make_sun_shadow(geom, objs, sun,
                                 ShadowPassParams(map_size=2048, pcf_radius=2))
        ctx3 = make_shade_context(
            mats3, light_dir_ws=sun, light_intensity=3.0,
            camera_pos=(0.5, 2.2, -6.0), shadow=shadow)
        setup = scene_setup(geom.positions, geom.normals, geom.uvs,
                            geom.indices, geom.vtx_obj, geom.tri_obj,
                            objs.model, objs.normal_mat, cam.viewproj, w, h,
                            obj_visible=objs.visible)
        depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
        gb = interpolate_gbuffer(setup, depth, tid, materials=mats3)
        shaded = shade_blinn_phong(gb, ctx3)
        bg = jnp.broadcast_to(jnp.asarray((0.05, 0.07, 0.12), jnp.float32),
                              shaded.shape)
        return tonemap_pass(composite_over_background(shaded, gb, bg))

    frame3_j = jax.jit(frame3)
    timeit_frames("config3_shadows_800x600", lambda i: frame3_j(0), frames=20)

    # Config 4 is bench.py (read BENCH output separately).
    # Config 5: full multi-pass through the pipeline at 800x600.
    import subprocess  # noqa: F401 — config 5 measured in-process below

    from demos import hello_full_pipeline as hfp  # noqa: F401

    print("config4: see bench.py output")

    # Config 5: reuse the pipeline from the demo module but time frames.
    from lsr_tpu.core.frame import FrameParams, LightCullingMode, TechniqueMode
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.passes.standard_passes import make_standard_registry
    from lsr_tpu.pipeline.executor import RenderContext
    from lsr_tpu.pipeline.pipeline import PluggablePipeline
    from lsr_tpu.pipeline.recipe import POST_STACK_PRESETS, RenderPathRecipe

    lb = LightSetBuilder()
    for _ in range(48):
        lb.point(tuple(rng.uniform([-4, 0.0, -3], [4, 2.2, 4]).tolist()),
                 intensity=1.2, range=2.2)
    state0 = {"geom": geom, "objects": objects, "camera": cam,
              "lights": lb.build(),
              "shade_ctx": make_shade_context(
                  mats3, light_dir_ws=sun, light_intensity=2.6,
                  camera_pos=(0.5, 2.2, -6.0))}
    # BASELINE config 5 = HelloMultiPass-class composition ("deferred
    # G-buffer + IBL skybox + motion blur/DoF/FXAA post chain") — the
    # reference demo has NO shadow pass (hello_multi_pass.cpp:1336 loop),
    # so shadows are off here; shadowed compositions are configs 3/4.
    recipe = RenderPathRecipe(
        name="full", technique=TechniqueMode.TILED_DEFERRED,
        light_culling=LightCullingMode.TILED_DEPTH_RANGE, shadows=False,
        pass_chain=("sky", "gbuffer", "light_culling",
                    "deferred_lighting_tiled"),
        post_stack=POST_STACK_PRESETS["full"])
    fp = FrameParams(width=w, height=h)
    fp.technique.mode = TechniqueMode.TILED_DEFERRED
    fp.technique.light_culling = LightCullingMode.TILED_DEPTH_RANGE
    for attr in ("enable_motion_vectors", "enable_motion_blur",
                 "enable_light_shafts", "enable_dof", "enable_bloom",
                 "enable_fxaa"):
        setattr(fp, attr, True)
    reg = make_standard_registry()
    pipe = PluggablePipeline(preexisting_semantics=())
    assert pipe.configure_from_recipe(recipe, reg).ok
    rc = RenderContext()

    def frame5(i):
        return pipe.execute_jitted(rc, dict(state0), fp)["ldr"]

    timeit_frames("config5_fullpipe_800x600", frame5, frames=20, warmup=5)


if __name__ == "__main__":
    main()
