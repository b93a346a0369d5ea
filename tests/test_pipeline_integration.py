"""End-to-end: the 5 render-path presets through the real pass library.

The analog of the reference's Phase-I composition sweep
(hello_rendering_paths.cpp:389-414): compile each preset recipe, plan it,
execute it on a real scene, and check the produced image.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lsr_tpu.core import math3d as m3
from lsr_tpu.core.frame import FrameParams, LightCullingMode, TechniqueMode
from lsr_tpu.io.obj import load_obj, make_plane
from lsr_tpu.lighting.light_types import LightSetBuilder
from lsr_tpu.passes.standard_passes import make_standard_registry
from lsr_tpu.pipeline.executor import RenderContext
from lsr_tpu.pipeline.pipeline import PluggablePipeline
from lsr_tpu.pipeline.recipe import builtin_render_path_presets, compile_recipe
from lsr_tpu.scene.scene import SceneBuilder, make_camera
from lsr_tpu.shading.common import make_materials
from lsr_tpu.shading.models import make_shade_context

MONKEY = "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"

_MODE_FOR = {
    "forward_classic": TechniqueMode.FORWARD,
    "forward_plus": TechniqueMode.FORWARD_PLUS,
    "deferred": TechniqueMode.DEFERRED,
    "tiled_deferred": TechniqueMode.TILED_DEFERRED,
    "clustered_forward": TechniqueMode.CLUSTERED_FORWARD,
}


def _scene_state(w, h):
    sb = SceneBuilder()
    sb.add(load_obj(MONKEY), np.asarray(m3.translate([0, 0.2, 0])))
    sb.add(make_plane(6.0, y=-1.0), material=1, casts_shadow=False)
    geom, objects = sb.build()
    cam = make_camera(w, h, (0.5, 1.5, -4.0), (0, 0, 0))
    lb = LightSetBuilder()
    rng = np.random.default_rng(1)
    for _ in range(24):
        lb.point(tuple(rng.uniform([-3, 0.2, -3], [3, 2, 3]).tolist()),
                 color=tuple(rng.uniform(0.3, 1.0, 3).tolist()),
                 intensity=1.5, range=2.5)
    mats = make_materials(base_color=[(0.8, 0.5, 0.3), (0.5, 0.55, 0.6)],
                          roughness=[0.4, 0.8])
    ctx = make_shade_context(mats, light_dir_ws=(0.35, -0.7, 0.5),
                             camera_pos=(0.5, 1.5, -4.0), light_intensity=2.0)
    return {
        "geom": geom, "objects": objects, "camera": cam,
        "lights": lb.build(), "shade_ctx": ctx,
    }


@pytest.mark.parametrize("preset", builtin_render_path_presets(),
                         ids=lambda p: p.name)
def test_preset_renders(preset):
    w, h = 96, 64
    reg = make_standard_registry()
    fp = FrameParams(width=w, height=h)
    fp.technique.mode = _MODE_FOR[preset.name]
    fp.technique.light_culling = preset.light_culling
    fp.technique.tile_size = 16
    fp.technique.cluster_slices = 8
    fp.technique.max_lights_per_tile = 32
    fp.pass_params.shadow.map_size = 128
    fp.raster_tile_h = 16

    pipe = PluggablePipeline(preexisting_semantics=())
    report = pipe.configure_from_recipe(preset, reg)
    assert report.ok, (preset.name, report.errors)

    plan = pipe.build_plan(fp)
    assert plan.ok, (preset.name, plan.errors)

    ctx = RenderContext()
    state = pipe.execute(ctx, _scene_state(w, h), fp)
    assert "ldr" in state, preset.name
    img = np.asarray(state["ldr"])
    assert img.shape == (h, w, 3)
    cov = np.asarray(state["gbuffer"].covered)
    assert cov.sum() > 1000
    assert img[cov].std() > 5.0  # actually shaded, not flat
    # Per-pass timings were recorded (PipelineRuntimeExecutor analog).
    assert "tonemap" in ctx.debug.pass_ms


def test_full_post_stack_runs():
    w, h = 96, 64
    reg = make_standard_registry()
    from lsr_tpu.pipeline.recipe import POST_STACK_PRESETS, RenderPathRecipe

    recipe = RenderPathRecipe(
        name="full", technique=TechniqueMode.FORWARD_PLUS,
        light_culling=LightCullingMode.TILED, shadows=True,
        post_stack=POST_STACK_PRESETS["full"],
    )
    fp = FrameParams(width=w, height=h)
    fp.technique.mode = TechniqueMode.FORWARD_PLUS
    fp.technique.tile_size = 16
    fp.technique.max_lights_per_tile = 32
    fp.pass_params.shadow.map_size = 128
    fp.raster_tile_h = 16
    fp.enable_motion_vectors = True
    fp.enable_motion_blur = True
    fp.enable_light_shafts = True
    fp.enable_dof = True
    fp.enable_bloom = True
    fp.enable_taa = True
    fp.enable_fxaa = True

    pipe = PluggablePipeline(preexisting_semantics=())
    report = pipe.configure_from_recipe(recipe, reg)
    assert report.ok, report.errors
    plan = pipe.build_plan(fp)
    assert plan.ok, plan.errors
    order = [pipe.passes[i].pass_id for i in plan.order]
    assert order[-1] == "fxaa" and order[-2] == "tonemap"

    ctx = RenderContext()
    state = pipe.execute(ctx, _scene_state(w, h), fp)
    img = np.asarray(state["ldr"])
    assert np.isfinite(img.astype(np.float64)).all()
    assert img.std() > 5.0

    # Run a second frame: TAA history persists without shape errors.
    state2 = pipe.execute(ctx, _scene_state(w, h), fp)
    assert np.asarray(state2["ldr"]).shape == (h, w, 3)
    pipe.reset_history()


def test_debug_views_through_pipeline():
    from lsr_tpu.core.frame import DebugViewMode

    w, h = 64, 48
    reg = make_standard_registry()
    preset = builtin_render_path_presets()[0]
    fp = FrameParams(width=w, height=h)
    fp.technique.mode = TechniqueMode.FORWARD
    fp.pass_params.shadow.map_size = 64
    fp.raster_tile_h = 16
    pipe = PluggablePipeline(preexisting_semantics=())
    assert pipe.configure_from_recipe(preset, reg).ok
    for mode in (DebugViewMode.ALBEDO, DebugViewMode.NORMAL, DebugViewMode.DEPTH):
        fp.debug_view = mode
        state = pipe.execute(RenderContext(), _scene_state(w, h), fp)
        assert np.asarray(state["ldr"]).shape == (h, w, 3)


def test_jitted_execution_matches_eager():
    """execute_jitted (whole-plan jit) must equal the instrumented path."""
    w, h = 96, 64
    reg = make_standard_registry()
    preset = builtin_render_path_presets()[1]  # forward_plus
    fp = FrameParams(width=w, height=h)
    fp.technique.mode = _MODE_FOR[preset.name]
    fp.technique.light_culling = preset.light_culling
    fp.technique.tile_size = 16
    fp.technique.max_lights_per_tile = 32
    fp.pass_params.shadow.map_size = 128
    fp.raster_tile_h = 16
    fp.enable_taa = False

    pipe = PluggablePipeline(preexisting_semantics=())
    assert pipe.configure_from_recipe(preset, reg).ok

    state = _scene_state(w, h)
    eager = pipe.execute(RenderContext(), dict(state), fp)
    jitted = pipe.execute_jitted(RenderContext(), dict(state), fp)
    np.testing.assert_array_equal(np.asarray(eager["ldr"]),
                                  np.asarray(jitted["ldr"]))

    # TAA history persists across jitted frames via pipeline state.
    fp.enable_taa = True
    fp.enable_motion_vectors = True
    pipe2 = PluggablePipeline(preexisting_semantics=())
    from lsr_tpu.pipeline.recipe import RenderPathRecipe, compile_recipe

    r = RenderPathRecipe(name="taa", technique=fp.technique.mode,
                         light_culling=fp.technique.light_culling,
                         shadows=False, post_stack=("taa",))
    assert pipe2.configure_from_recipe(r, reg).ok
    out1 = pipe2.execute_jitted(RenderContext(), dict(state), fp)
    assert "history_color" in out1
    out2 = pipe2.execute_jitted(RenderContext(), dict(state), fp)
    assert np.isfinite(np.asarray(out2["ldr"]).astype(np.float64)).all()
    pipe2.reset_history()
