"""Runtime executor: run a validated plan with per-pass timing and gating.

The analog of PipelineRuntimeExecutor (pluggable_pipeline.hpp:62-236):
- begin/end frame per backend group,
- for each pass: build_execution_request -> (gate) -> execute_resolved —
  an invalid request means the pass is SKIPPED and recorded, never executed
  (vop_core_tests.cpp:258),
- wall-clock per-pass timing recorded into the context debug stats (the
  reference's ctx.debug.ms_* counters).  Timing on an async device measures
  dispatch unless `sync_timing` forces a block per pass.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List

import jax


@dataclasses.dataclass
class DebugStats:
    """RenderDebugStats analog (core/context.hpp:29)."""

    pass_ms: Dict[str, float] = dataclasses.field(default_factory=dict)
    pass_ms_err: Dict[str, float] = dataclasses.field(default_factory=dict)
    tri_input: int = 0
    tri_after_clip: int = 0
    tri_raster: int = 0
    skipped_passes: List[str] = dataclasses.field(default_factory=list)
    frames: int = 0


@dataclasses.dataclass
class RenderContext:
    """Engine context (core/context.hpp:116 analog): debug stats + backends."""

    debug: DebugStats = dataclasses.field(default_factory=DebugStats)
    backends: dict = dataclasses.field(default_factory=dict)
    sync_timing: bool = False
    frame_index: int = 0


class IBackend:
    """Execution-target hooks (IRenderBackend analog, rhi/core/backend.hpp:47)."""

    name = "xla"

    def begin_frame(self, ctx):  # pragma: no cover - trivial
        pass

    def end_frame(self, ctx):  # pragma: no cover - trivial
        pass


class XlaBackend(IBackend):
    name = "xla"


def execute_plan(plan, passes, ctx, frame_state: dict, fp) -> dict:
    """Run the plan's groups/passes over frame_state; returns new frame_state."""
    if not plan.ok:
        raise RuntimeError(f"refusing to execute invalid plan: {plan.errors}")
    for group in plan.groups:
        backend = ctx.backends.get(group.backend)
        if backend is not None:
            backend.begin_frame(ctx)
        for idx in group.pass_indices:
            p = passes[idx]
            req = p.build_execution_request(ctx, frame_state, fp)
            if not req.valid:
                ctx.debug.skipped_passes.append(f"{p.pass_id}: {req.error}")
                continue
            t0 = time.perf_counter()
            frame_state = p.execute_resolved(ctx, frame_state, fp, req)
            if ctx.sync_timing:
                jax.block_until_ready(
                    {k: v for k, v in frame_state.items()
                     if hasattr(v, "block_until_ready") or hasattr(v, "dtype")}
                )
            dt = (time.perf_counter() - t0) * 1000.0
            ctx.debug.pass_ms[p.pass_id] = (
                ctx.debug.pass_ms.get(p.pass_id, 0.0) * 0.0 + dt
            )
        if backend is not None:
            backend.end_frame(ctx)
    ctx.debug.frames += 1
    ctx.frame_index += 1
    return frame_state
