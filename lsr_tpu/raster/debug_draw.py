"""Debug draw: 3D line/AABB overlays onto rendered frames.

Analog of sw_render/debug_draw.hpp (line/AABB overlays): world-space
segments are projected through the camera, near-clipped, mapped to canvas
pixels and drawn with the Bresenham scatter on top of an LDR frame.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lsr_tpu.raster.lines import rasterize_lines


def project_segments(p0_ws, p1_ws, viewproj, width: int, height: int,
                     near_eps: float = 1e-4):
    """World segments -> integer canvas endpoints + validity.

    Segments crossing the near plane are clipped to it (parametric clip on
    the w' = z+w distance, like the triangle near clip)."""
    def hom(p):
        p = jnp.asarray(p, jnp.float32)
        return jnp.concatenate([p, jnp.ones_like(p[..., :1])], -1)

    c0 = hom(p0_ws) @ viewproj.T
    c1 = hom(p1_ws) @ viewproj.T
    d0 = c0[..., 2] + c0[..., 3]
    d1 = c1[..., 2] + c1[..., 3]
    both_out = (d0 < 0) & (d1 < 0)
    t = jnp.clip(d0 / jnp.where(jnp.abs(d0 - d1) > 1e-8, d0 - d1, 1.0), 0.0, 1.0)
    cross = (d0 < 0) | (d1 < 0)
    mid = c0 + (c1 - c0) * t[..., None]
    c0 = jnp.where((d0 < 0)[..., None], mid, c0)
    c1 = jnp.where((d1 < 0)[..., None], mid, c1)

    def to_screen(c):
        w_ok = c[..., 3] > near_eps
        wd = jnp.where(w_ok, c[..., 3], 1.0)
        x = (c[..., 0] / wd * 0.5 + 0.5) * (width - 1)
        y = (c[..., 1] / wd * 0.5 + 0.5) * (height - 1)
        return jnp.stack([x, y], -1), w_ok

    s0, ok0 = to_screen(c0)
    s1, ok1 = to_screen(c1)
    valid = ok0 & ok1 & ~both_out & cross | (ok0 & ok1 & ~cross)
    # Clamp into a guard window so Bresenham step counts stay bounded.
    lim = jnp.asarray([width * 2.0, height * 2.0], jnp.float32)
    s0 = jnp.clip(s0, -lim, lim)
    s1 = jnp.clip(s1, -lim, lim)
    return (jnp.round(s0).astype(jnp.int32), jnp.round(s1).astype(jnp.int32),
            valid)


def draw_segments(ldr_u8, p0_ws, p1_ws, viewproj, color=(255, 230, 40)):
    h, w = ldr_u8.shape[:2]
    s0, s1, valid = project_segments(p0_ws, p1_ws, viewproj, w, h)
    # Collapse invalid segments to a zero-length off-screen point.
    off = jnp.asarray([-10, -10], jnp.int32)
    s0 = jnp.where(valid[..., None], s0, off)
    s1 = jnp.where(valid[..., None], s1, off)
    return rasterize_lines(ldr_u8, s0, s1, jnp.asarray(color, jnp.uint8),
                           max_steps=3 * (w + h))


_AABB_EDGES = np.array([
    (0, 1), (1, 3), (3, 2), (2, 0),   # bottom ring (y=min)
    (4, 5), (5, 7), (7, 6), (6, 4),   # top ring
    (0, 4), (1, 5), (2, 6), (3, 7),   # verticals
], np.int32)


def aabb_segments(wmin, wmax):
    """(B,3)/(B,3) AABBs -> (B*12, 3) segment endpoints (p0, p1)."""
    wmin = jnp.asarray(wmin, jnp.float32)
    wmax = jnp.asarray(wmax, jnp.float32)
    sel = jnp.asarray([[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
                      jnp.float32)
    corners = wmin[:, None, :] + (wmax - wmin)[:, None, :] * sel[None]  # (B,8,3)
    e = jnp.asarray(_AABB_EDGES)
    p0 = corners[:, e[:, 0]].reshape(-1, 3)
    p1 = corners[:, e[:, 1]].reshape(-1, 3)
    return p0, p1


def draw_aabbs(ldr_u8, wmin, wmax, viewproj, color=(255, 80, 80)):
    """Overlay world AABB wireframes (the culling-debug overlay)."""
    p0, p1 = aabb_segments(wmin, wmax)
    return draw_segments(ldr_u8, p0, p1, viewproj, color)
