"""Directional shadow-map sampling with PCF (fullscreen, vectorized).

Semantics follow the reference exactly (shadow_sample.hpp:30-108):
- project world pos by light viewproj, NDC [-1,1] -> uv/z in [0,1],
- outside-map or degenerate w -> fully lit,
- slope-scaled bias from NdotL,
- hard (radius 0) or PCF (2r+1)^2 box average on nearest-texel centers with
  clamped fetches.

The PCF window is a static unrolled offset set, so the whole pass fuses into
one elementwise+gather XLA program over the framebuffer.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["depth", "light_viewproj", "bias_const", "bias_slope",
                 "strength", "depth_quads"],
    meta_fields=["pcf_radius", "pcf_step"],
)
@dataclasses.dataclass(frozen=True)
class ShadowContext:
    depth: jnp.ndarray           # (S, S) f32 shadow map depth in [0,1]
    light_viewproj: jnp.ndarray  # (4, 4)
    bias_const: jnp.ndarray      # scalar (default 0.0008)
    bias_slope: jnp.ndarray      # scalar (default 0.0015)
    strength: jnp.ndarray        # scalar in [0,1]
    pcf_radius: int = 2          # 0 = hard
    pcf_step: int = 1            # texel step
    depth_quads: jnp.ndarray | None = None  # (S*S, 4) 2x2-packed map


def pack_shadow_quads(depth):
    """(S, S) -> (S*S, 4) rows of clamped 2x2 neighborhoods [d00 d10 d01 d11].

    PCF taps gather one map texel per pixel per tap; gathers from a large
    map are ~5ms per tap per 0.5MP on this hardware, so a 5x5 PCF costs
    >120ms.  Quad rows cover 4 taps per gather (9 gathers for 5x5)."""
    right = jnp.concatenate([depth[:, 1:], depth[:, -1:]], axis=1)
    down = jnp.concatenate([depth[1:], depth[-1:]], axis=0)
    down_right = jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1)
    s = depth.shape[0]
    return jnp.stack([depth, right, down, down_right], -1).reshape(s * s, 4)


def make_shadow_context(
    depth,
    light_viewproj,
    bias_const: float = 0.0008,
    bias_slope: float = 0.0015,
    strength: float = 1.0,
    pcf_radius: int = 2,
    pcf_step: int = 1,
) -> ShadowContext:
    quads = pack_shadow_quads(depth) if (pcf_radius > 0 and pcf_step == 1) \
        else None
    return ShadowContext(
        depth=depth,
        light_viewproj=jnp.asarray(light_viewproj, jnp.float32),
        bias_const=jnp.float32(bias_const),
        bias_slope=jnp.float32(bias_slope),
        strength=jnp.float32(strength),
        pcf_radius=int(pcf_radius),
        pcf_step=int(pcf_step),
        depth_quads=quads,
    )


def shadow_visibility_dir(shadow: ShadowContext, world_pos, ndotl):
    """Visibility in [0,1] per pixel; world_pos (H,W,3), ndotl (H,W)."""
    sm = shadow.depth
    sh, sw = sm.shape

    hom = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], -1)
    p = hom @ shadow.light_viewproj.T  # (H, W, 4)
    w = p[..., 3]
    w_ok = jnp.abs(w) >= 1e-8
    w_safe = jnp.where(w_ok, w, 1.0)
    ndc = p[..., :3] / w_safe[..., None]
    u = ndc[..., 0] * 0.5 + 0.5
    v = ndc[..., 1] * 0.5 + 0.5
    z = ndc[..., 2] * 0.5 + 0.5
    in_map = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & w_ok

    slope = 1.0 - jnp.clip(ndotl, 0.0, 1.0)
    z_test = z - (shadow.bias_const + shadow.bias_slope * slope)

    fx = u * (sw - 1)
    fy = v * (sh - 1)
    cx = jnp.round(fx).astype(jnp.int32)
    cy = jnp.round(fy).astype(jnp.int32)

    r = max(0, shadow.pcf_radius)
    step = max(1, shadow.pcf_step)

    def fetch(ox, oy):
        x = jnp.clip(cx + ox, 0, sw - 1)
        y = jnp.clip(cy + oy, 0, sh - 1)
        return sm[y, x]

    if r == 0:
        vis = (z_test <= fetch(0, 0)).astype(jnp.float32)
    elif shadow.depth_quads is not None and step == 1:
        # Quad path: (2r+2)^2 window covered by ceil((2r+2)/2)^2 quad rows.
        # Quads are clamp-packed, so anchors must stay in [0, S-2] and every
        # needed tap is addressed relative to an in-range anchor.
        lit = jnp.zeros_like(z_test)
        taps = 0
        n_anchor = r + 1  # anchors at offsets -r, -r+2, ..., covering -r..r+1
        for qy in range(n_anchor):
            for qx in range(n_anchor):
                ax = jnp.clip(cx - r + 2 * qx, 0, sw - 2)
                ay = jnp.clip(cy - r + 2 * qy, 0, sh - 2)
                quad = shadow.depth_quads[ay * sw + ax]  # (..., 4)
                for dy in range(2):
                    for dx in range(2):
                        oy = -r + 2 * qy + dy
                        ox = -r + 2 * qx + dx
                        if abs(oy) > r or abs(ox) > r:
                            continue
                        # Clamp semantics: the reference clamps the TAP
                        # coordinate; the quad anchor clamp already pins
                        # border taps to edge texels.
                        lit = lit + (
                            z_test <= quad[..., dy * 2 + dx]
                        ).astype(jnp.float32)
                        taps += 1
        vis = lit / float(taps)
    else:
        lit = jnp.zeros_like(z_test)
        for oy in range(-r, r + 1):
            for ox in range(-r, r + 1):
                lit = lit + (z_test <= fetch(ox * step, oy * step)).astype(jnp.float32)
        vis = lit / float((2 * r + 1) ** 2)

    vis = jnp.where(in_map, vis, 1.0)
    return 1.0 + (vis - 1.0) * jnp.clip(shadow.strength, 0.0, 1.0)
