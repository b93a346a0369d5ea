"""2D canvas primitives (the hello-pixel-primitives demo family).

Pixel fills, outlined/filled triangles, polygonal circles, image blits and
alpha blending — Canvas helper analogs (shs_renderer.hpp:684-1100:
fill_pixel :794, draw_circle_poly :826, draw_triangle :840,
barycentric fill :860-905, alpha_blend :1037, image_blit :1060), expressed
as masked fullscreen ops / scatters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lsr_tpu.raster.lines import rasterize_lines


def fill_rect(canvas_u8, x, y, w, h, color):
    """Canvas::fill_pixel analog: masked rectangle fill."""
    hh, ww = canvas_u8.shape[:2]
    xs = jnp.arange(ww)[None, :]
    ys = jnp.arange(hh)[:, None]
    mask = (xs >= x) & (xs < x + w) & (ys >= y) & (ys < y + h)
    color = jnp.asarray(color, jnp.uint8)
    return jnp.where(mask[..., None], color, canvas_u8)


def draw_circle_poly(canvas_u8, cx, cy, radius, segments, color):
    """Canvas::draw_circle_poly: circle as line segments (host-built table)."""
    th1 = 2.0 * np.pi * np.arange(segments) / segments
    th2 = 2.0 * np.pi * (np.arange(segments) + 1) / segments
    p0 = np.stack([cx + (radius * np.cos(th1)).astype(np.int32),
                   cy + (radius * np.sin(th1)).astype(np.int32)], -1)
    p1 = np.stack([cx + (radius * np.cos(th2)).astype(np.int32),
                   cy + (radius * np.sin(th2)).astype(np.int32)], -1)
    return rasterize_lines(canvas_u8, jnp.asarray(p0, jnp.int32),
                           jnp.asarray(p1, jnp.int32),
                           jnp.asarray(color, jnp.uint8))


def draw_triangle_outline(canvas_u8, verts, color):
    """Canvas::draw_triangle: three Bresenham edges.  verts: (3, 2) int."""
    v = np.asarray(verts, np.int32)
    p0 = jnp.asarray(v[[0, 1, 2]])
    p1 = jnp.asarray(v[[1, 2, 0]])
    return rasterize_lines(canvas_u8, p0, p1, jnp.asarray(color, jnp.uint8))


def fill_triangle_2d(canvas_u8, verts, color):
    """Barycentric-coverage filled 2D triangle (draw_triangle_flat_shading's
    coverage rule: all barycentrics >= 0, shs_renderer.hpp:894-900)."""
    hh, ww = canvas_u8.shape[:2]
    v = jnp.asarray(verts, jnp.float32)
    xs = jnp.arange(ww, dtype=jnp.float32)[None, :]
    ys = jnp.arange(hh, dtype=jnp.float32)[:, None]

    ax, ay = v[0, 0], v[0, 1]
    v0x, v0y = v[1, 0] - ax, v[1, 1] - ay
    v1x, v1y = v[2, 0] - ax, v[2, 1] - ay
    v2x, v2y = xs - ax, ys - ay
    d00 = v0x * v0x + v0y * v0y
    d01 = v0x * v1x + v0y * v1y
    d11 = v1x * v1x + v1y * v1y
    d20 = v2x * v0x + v2y * v0y
    d21 = v2x * v1x + v2y * v1y
    den = d00 * d11 - d01 * d01
    ok = jnp.abs(den) >= 1e-5
    den = jnp.where(ok, den, 1.0)
    bv = (d11 * d20 - d01 * d21) / den
    bw = (d00 * d21 - d01 * d20) / den
    bu = 1.0 - bv - bw
    mask = ok & (bu >= 0) & (bv >= 0) & (bw >= 0)
    return jnp.where(mask[..., None], jnp.asarray(color, jnp.uint8), canvas_u8)


def alpha_blend(dst_u8, src_u8, alpha):
    """shs::alpha_blend: dst*(1-a) + src*a per pixel; alpha scalar or (H,W)."""
    a = jnp.asarray(alpha, jnp.float32)
    if a.ndim == 2:
        a = a[..., None]
    out = dst_u8.astype(jnp.float32) * (1.0 - a) + src_u8.astype(jnp.float32) * a
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def image_blit(canvas_u8, img_u8, x, y):
    """shs::image_blit: paste img at (x, y) with bounds clipping
    (dynamic_update_slice with clamped origin + edge masking)."""
    hh, ww = canvas_u8.shape[:2]
    ih, iw = img_u8.shape[:2]
    xs = jnp.arange(ww)[None, :]
    ys = jnp.arange(hh)[:, None]
    in_rect = (xs >= x) & (xs < x + iw) & (ys >= y) & (ys < y + ih)
    sx = jnp.clip(xs - x, 0, iw - 1)
    sy = jnp.clip(ys - y, 0, ih - 1)
    src = img_u8[sy, sx]
    return jnp.where(in_rect[..., None], src, canvas_u8)
