"""Attribute interpolation pass: visibility buffer -> G-buffer.

Given the (depth01, tid) planes from the rasterizer, re-evaluates the winning
triangle's barycentrics per pixel and produces perspective-correct interpolated
attributes (the `FragmentIn` fields of shader/types.hpp:69-80: world_pos,
normal_ws, uv, depth01) as fullscreen arrays — the visibility-buffer analog of
the reference's in-loop varying interpolation (rasterizer.hpp:368-385).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from lsr_tpu.raster.setup import TriSetup


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "world_pos", "normal_ws", "uv", "depth01", "obj_id", "covered",
        "bary", "face_normal",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GBuffer:
    """Fullscreen interpolated fragment attributes (all (H, W, ...))."""

    world_pos: jnp.ndarray    # (H, W, 3)
    normal_ws: jnp.ndarray    # (H, W, 3) normalized
    uv: jnp.ndarray           # (H, W, 2)
    depth01: jnp.ndarray      # (H, W)
    obj_id: jnp.ndarray       # (H, W) i32, -1 = background
    covered: jnp.ndarray      # (H, W) bool
    bary: jnp.ndarray         # (H, W, 3) perspective-corrected weights
    face_normal: jnp.ndarray  # (H, W, 3) geometric (flat) normal


def interpolate_gbuffer(setup: TriSetup, depth01, tid, y_offset=0) -> GBuffer:
    """Gather per-pixel triangle data and interpolate attributes.

    y_offset: global row of this band's first row (screen-space sharding)."""
    h, w = tid.shape
    covered = tid >= 0
    safe = jnp.where(covered, tid, 0)

    coef = setup.coef[safe]  # (H, W, 9)
    iw = setup.iw[safe]      # (H, W, 3)

    px = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None] + jnp.asarray(
        y_offset, jnp.float32
    )

    bc = jnp.stack(
        [
            coef[..., 3 * i] * px + coef[..., 3 * i + 1] * py + coef[..., 3 * i + 2]
            for i in range(3)
        ],
        axis=-1,
    )  # (H, W, 3) screen-space barycentrics
    bciw = bc * iw
    denom = jnp.sum(bciw, axis=-1, keepdims=True)
    weights = bciw / jnp.maximum(denom, 1e-12)  # perspective-correct (H, W, 3)

    def interp(attr):  # attr: (N, 3, A)
        a = attr[safe]  # (H, W, 3, A)
        return jnp.sum(a * weights[..., None], axis=-2)

    wp = interp(setup.wp)
    nw = interp(setup.nw)
    nw = nw / jnp.maximum(jnp.linalg.norm(nw, axis=-1, keepdims=True), 1e-12)
    uv = interp(setup.uv)
    obj = jnp.where(covered, setup.obj_id[safe], -1)

    # Geometric per-face normal from the world-space corners (flat shading).
    corners = setup.wp[safe]  # (H, W, 3, 3)
    fn = jnp.cross(corners[..., 1, :] - corners[..., 0, :],
                   corners[..., 2, :] - corners[..., 0, :])
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    # Orient toward the smooth normal so winding doesn't flip lighting.
    flip = jnp.sum(fn * nw, axis=-1, keepdims=True) < 0.0
    fn = jnp.where(flip, -fn, fn)

    return GBuffer(
        world_pos=wp,
        normal_ws=nw,
        uv=uv,
        depth01=depth01,
        obj_id=obj,
        covered=covered,
        bary=weights,
        face_normal=fn,
    )
