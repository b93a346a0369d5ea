"""Pipeline framework unit tests — the vop_core_tests equivalents
(shs-renderer-lib/tests/vop_core_tests.cpp:150-401): fake backends + fake
passes probing planner/runtime behavior without any device work."""

import dataclasses

import pytest

from lsr_tpu.core.frame import FrameParams, LightCullingMode, TechniqueMode
from lsr_tpu.pipeline.contracts import STANDARD_CONTRACTS
from lsr_tpu.pipeline.executor import IBackend, RenderContext, execute_plan
from lsr_tpu.pipeline.frame_graph import compile_frame_graph
from lsr_tpu.pipeline.pipeline import PluggablePipeline
from lsr_tpu.pipeline.planner import BackendCaps, build_execution_plan
from lsr_tpu.pipeline.recipe import (
    RenderPathCapabilitySet,
    RenderPathRecipe,
    builtin_render_path_presets,
    compile_recipe,
)
from lsr_tpu.pipeline.registry import PassDescriptor, PassFactoryRegistry
from lsr_tpu.pipeline.render_pass import PassExecutionRequest, RenderPass


class DummyBackend(IBackend):
    """Counts begin/end frames (vop_core_tests.cpp:21)."""

    def __init__(self, name):
        self.name = name
        self.begins = 0
        self.ends = 0

    def begin_frame(self, ctx):
        self.begins += 1

    def end_frame(self, ctx):
        self.ends += 1


class DummyPass(RenderPass):
    def __init__(self, pass_id, reads=(), writes=(), backend="any"):
        super().__init__(pass_id, reads, writes, preferred_backend=backend)
        self.executed = 0

    def execute_resolved(self, ctx, frame_state, fp, request):
        self.executed += 1
        out = dict(frame_state)
        for w in self.describe_io().writes:
            out[w] = out.get(w, 0) + 1
        return out


class RejectingRequestPass(DummyPass):
    """Always produces an invalid request (vop_core_tests.cpp:63)."""

    def build_execution_request(self, ctx, frame_state, fp):
        return PassExecutionRequest(self.pass_id, valid=False, error="nope")


def fp():
    return FrameParams()


def test_frame_graph_raw_order():
    a = DummyPass("a", writes=("hdr",))
    b = DummyPass("b", reads=("hdr",), writes=("ldr",))
    c = DummyPass("c", reads=("ldr",))
    # Insert out of order; graph must reorder by dependencies.
    g = compile_frame_graph([c, b, a])
    assert g.ok
    assert g.order == [2, 1, 0]


def test_frame_graph_stable_insertion_for_independent():
    ps = [DummyPass(f"p{i}", writes=(f"r{i}",)) for i in range(4)]
    g = compile_frame_graph(ps)
    assert g.order == [0, 1, 2, 3]


def test_frame_graph_cycle_fallback():
    a = DummyPass("a", reads=("y",), writes=("x",))
    b = DummyPass("b", reads=("x",), writes=("y",))
    g = compile_frame_graph([a, b])
    assert not g.ok
    assert g.order == [0, 1]  # insertion-order fallback, not an abort


def test_plan_groups_by_backend():
    backends = {
        "xla": BackendCaps("xla"),
        "aux": BackendCaps("aux"),
    }
    ps = [
        DummyPass("a", writes=("r1",), backend="xla"),
        DummyPass("b", reads=("r1",), writes=("r2",), backend="xla"),
        DummyPass("c", reads=("r2",), writes=("r3",), backend="aux"),
        DummyPass("d", reads=("r3",), backend="xla"),
    ]
    plan = build_execution_plan(ps, fp(), backends=backends)
    assert plan.ok
    assert [g.backend for g in plan.groups] == ["xla", "aux", "xla"]
    assert [len(g.pass_indices) for g in plan.groups] == [2, 1, 1]


def test_plan_backend_fallback_and_block():
    backends = {"xla": BackendCaps("xla")}
    ps = [DummyPass("a", writes=("r",), backend="missing")]
    plan = build_execution_plan(ps, fp(), backends=backends)
    assert plan.ok
    assert any("falling back" in w for w in plan.warnings)

    # Cross-backend edge blocked when disallowed (vop_core_tests.cpp:201).
    backends2 = {"xla": BackendCaps("xla"), "aux": BackendCaps("aux")}
    ps2 = [
        DummyPass("a", writes=("r",), backend="xla"),
        DummyPass("b", reads=("r",), backend="aux"),
    ]
    plan2 = build_execution_plan(ps2, fp(), backends=backends2,
                                 allow_cross_backend=False)
    assert not plan2.ok


def test_invalid_request_never_executed():
    ps = [RejectingRequestPass("reject", writes=("x",)), DummyPass("ok", writes=("y",))]
    plan = build_execution_plan(ps, fp())
    ctx = RenderContext()
    state = execute_plan(plan, ps, ctx, {}, fp())
    assert ps[0].executed == 0
    assert ps[1].executed == 1
    assert "x" not in state and state["y"] == 1
    assert any("reject" in s for s in ctx.debug.skipped_passes)


def test_executor_refuses_invalid_plan():
    a = DummyPass("a", reads=("y",), writes=("x",))
    b = DummyPass("b", reads=("x",), writes=("y",))
    plan = build_execution_plan([a, b], fp())
    assert not plan.ok
    with pytest.raises(RuntimeError):
        execute_plan(plan, [a, b], RenderContext(), {}, fp())


def test_registry_hints_before_instantiation():
    """Mode support is queryable without creating the pass (vop_core_tests.cpp:284)."""
    created = []

    def factory(**kw):
        created.append(1)
        return DummyPass("fp_only")

    reg = PassFactoryRegistry()
    reg.register("fp_only", factory,
                 PassDescriptor(modes=TechniqueMode.FORWARD_PLUS))
    desc = reg.descriptor("fp_only")
    assert not desc.supports_mode(TechniqueMode.DEFERRED)
    assert desc.supports_mode(TechniqueMode.FORWARD_PLUS)
    assert created == []  # descriptor query did not instantiate


def test_planner_is_pure_of_runtime_ctx():
    """Planner output can't depend on runtime context (vop_core_tests.cpp:320)
    — enforced structurally: build_execution_plan takes no ctx at all."""
    import inspect

    sig = inspect.signature(build_execution_plan)
    assert "ctx" not in sig.parameters


def test_contract_validation_detects_missing_producer():
    class ContractPass(RenderPass):
        pass

    tm = ContractPass("tonemap", reads=("hdr",), writes=("ldr",),
                      contract=STANDARD_CONTRACTS["tonemap"])
    plan = build_execution_plan([tm], fp(), preexisting_semantics=())
    assert not plan.ok
    assert any("scene_color_hdr" in e for e in plan.errors)

    fwd = ContractPass("pbr_forward", writes=("hdr",),
                       contract=STANDARD_CONTRACTS["pbr_forward"])
    tm2 = ContractPass("tonemap", reads=("hdr",), writes=("ldr",),
                       contract=STANDARD_CONTRACTS["tonemap"])
    plan2 = build_execution_plan([fwd, tm2], fp(), preexisting_semantics=())
    assert plan2.ok, plan2.errors


def test_contract_mode_filter():
    class ContractPass(RenderPass):
        pass

    fplus = ContractPass("pbr_forward_plus", writes=("hdr",),
                         contract=STANDARD_CONTRACTS["pbr_forward_plus"])
    params = fp()
    params.technique.mode = TechniqueMode.FORWARD
    plan = build_execution_plan([fplus], params, preexisting_semantics=())
    assert not plan.ok  # forward+ lighting pass invalid in FORWARD mode


def _registry_with(*ids):
    reg = PassFactoryRegistry()
    for pid in ids:
        reg.register(pid, lambda pid=pid, **kw: DummyPass(pid))
    return reg


def test_recipe_rules_shadows_and_occlusion():
    reg = _registry_with("shadow_map", "depth_prepass", "pbr_forward", "tonemap")
    r = RenderPathRecipe(name="t", technique=TechniqueMode.FORWARD,
                         shadows=True, occlusion_culling=True)
    rep = compile_recipe(r, reg)
    assert rep.ok, rep.errors
    assert rep.passes[0] == "shadow_map"
    assert rep.passes[1] == "depth_prepass"
    assert rep.passes[-1] == "tonemap"


def test_recipe_unknown_and_permissive():
    reg = _registry_with("pbr_forward", "tonemap")
    r = RenderPathRecipe(name="t", technique=TechniqueMode.FORWARD,
                         pass_chain=("pbr_forward", "wat"))
    rep = compile_recipe(r, reg)
    assert not rep.ok
    rep2 = compile_recipe(r, reg, permissive=True)
    assert rep2.ok and any("downgraded" in w for w in rep2.warnings)


def test_recipe_capability_check():
    reg = _registry_with("shadow_map", "pbr_forward", "tonemap")
    caps = RenderPathCapabilitySet(shadows=False)
    r = RenderPathRecipe(name="t", technique=TechniqueMode.FORWARD, shadows=True)
    rep = compile_recipe(r, reg, caps)
    assert not rep.ok


def test_builtin_presets_compile():
    reg = _registry_with(
        "scene_cull", "shadow_map", "local_shadows", "depth_prepass",
        "light_culling", "cluster_build",
        "cluster_light_assign", "gbuffer", "deferred_lighting",
        "deferred_lighting_tiled", "pbr_forward", "pbr_forward_plus",
        "pbr_forward_clustered", "tonemap", "fxaa", "bloom", "taa",
        "light_shafts", "motion_blur", "depth_of_field",
    )
    for preset in builtin_render_path_presets():
        rep = compile_recipe(preset, reg)
        assert rep.ok, (preset.name, rep.errors)
        assert rep.passes[-1] == "tonemap"
        # The flagship workload is part of every preset chain
        # (hello_rendering_paths.cpp:94-109).
        assert rep.passes[0] == "scene_cull"
        assert "local_shadows" in rep.passes
        assert rep.passes.index("local_shadows") \
            > rep.passes.index("shadow_map")


def test_ssao_composition_compiles():
    """forward_classic+ssao (demo_forward_classic_renderpath.cpp:113-114
    registers ssao as a custom pass): ssao must land after the depth
    prepass that feeds it and before the lighting pass that consumes the
    mask."""
    from lsr_tpu.pipeline.recipe import ssao_composition_recipe

    reg = _registry_with(
        "scene_cull", "shadow_map", "local_shadows", "depth_prepass",
        "ssao", "pbr_forward", "tonemap",
    )
    rep = compile_recipe(ssao_composition_recipe(), reg)
    assert rep.ok, rep.errors
    assert "ssao" in rep.passes
    assert rep.passes.index("ssao") > rep.passes.index("depth_prepass")
    assert rep.passes.index("ssao") < rep.passes.index("pbr_forward")


def test_pipeline_end_to_end_with_dummy_backend():
    pipe = PluggablePipeline()
    be = DummyBackend("xla")
    pipe.backend_impls["xla"] = be
    pipe.add_pass(DummyPass("a", writes=("r1",)))
    pipe.add_pass(DummyPass("b", reads=("r1",), writes=("r2",)))
    ctx = RenderContext()
    state = pipe.execute(ctx, {}, fp())
    assert state == {"r1": 1, "r2": 1}
    assert be.begins == 1 and be.ends == 1
    assert ctx.debug.frames == 1
    assert set(ctx.debug.pass_ms) == {"a", "b"}

    # Disabling a pass dirties and rebuilds the plan.
    pipe.set_enabled("b", False)
    state2 = pipe.execute(ctx, {}, fp())
    assert state2 == {"r1": 1}
