"""Wireframe rendering: the HelloWireframe capability (hello_wireframe.cpp:11).

Reference semantics reproduced exactly:
- pixel mapping: x = int((v.x + 1) * W / 2), y = int((v.y + 1) * H / 2)
  (truncation, bottom-left canvas origin, no aspect correction),
- per face only edges (v0,v1) and (v1,v2) are drawn (the k>0 loop),
- an edge is drawn only when BOTH endpoints are strictly inside (0, W) x (0, H),
- Bresenham coverage, single color.

Edge building happens host-side (scene setup); the draw is a jitted
scatter over the canvas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lsr_tpu.io.obj import MeshData
from lsr_tpu.raster.lines import rasterize_lines


def wireframe_edges(mesh: MeshData) -> np.ndarray:
    """(E, 2) vertex-index pairs: edges (v0,v1), (v1,v2) per triangle."""
    idx = mesh.indices
    e01 = idx[:, [0, 1]]
    e12 = idx[:, [1, 2]]
    return np.concatenate([e01, e12], axis=0)


def project_ndc_unit(positions: np.ndarray, width: int, height: int) -> np.ndarray:
    """Identity 'projection' of the demo: model coords treated as NDC.

    Computed in float64 with truncation toward zero, as the C++ demo's
    double-precision int casts do.
    """
    p = positions.astype(np.float64)
    x = ((p[:, 0] + 1.0) * width / 2.0).astype(np.int32)
    y = ((p[:, 1] + 1.0) * height / 2.0).astype(np.int32)
    return np.stack([x, y], axis=-1)


def render_wireframe(
    mesh: MeshData,
    width: int,
    height: int,
    color=(0, 255, 0),
    bg=(0, 0, 0),
) -> jnp.ndarray:
    """Render a mesh wireframe to a (H, W, 3) u8 canvas (bottom-left origin)."""
    edges = wireframe_edges(mesh)
    pix = project_ndc_unit(mesh.positions, width, height)
    p0 = pix[edges[:, 0]]
    p1 = pix[edges[:, 1]]
    inside = lambda p: (  # noqa: E731 - strict interior test from the demo
        (p[:, 0] > 0) & (p[:, 0] < width) & (p[:, 1] > 0) & (p[:, 1] < height)
    )
    keep = inside(p0) & inside(p1)
    p0, p1 = p0[keep], p1[keep]

    canvas = jnp.broadcast_to(jnp.asarray(bg, jnp.uint8), (height, width, 3))
    return _draw_lines_jit(canvas, jnp.asarray(p0), jnp.asarray(p1),
                           jnp.asarray(color, jnp.uint8), width + height)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _draw_lines_jit(canvas, p0, p1, color, max_steps):
    return rasterize_lines(canvas, p0, p1, color, max_steps=max_steps)
