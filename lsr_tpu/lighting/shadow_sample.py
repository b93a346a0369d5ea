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
                 "strength", "depth_taps"],
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
    depth_taps: jnp.ndarray | None = None  # (S*S, (2r+1)^2) neighborhoods


def pack_shadow_taps(depth, radius: int):
    """(S, S) -> (S*S, (2r+1)^2) rows: each texel's FULL clamped PCF window.

    TPU gathers are per-row-overhead bound (~3.5ns/row, nearly independent of
    width <= 64 lanes): 25 single-texel gathers at 2MP cost ~80ms measured,
    while ONE 25-lane gather costs ~7ms.  Packing is pure shifted copies
    (VPU/HBM-friendly), rebuilt once per shadow-map render."""
    s = depth.shape[0]

    def shifted(ox, oy):
        x = depth
        if oy > 0:
            x = jnp.concatenate([x[oy:]] + [x[-1:]] * oy, axis=0)
        elif oy < 0:
            x = jnp.concatenate([x[:1]] * (-oy) + [x[:oy]], axis=0)
        if ox > 0:
            x = jnp.concatenate([x[:, ox:]] + [x[:, -1:]] * ox, axis=1)
        elif ox < 0:
            x = jnp.concatenate([x[:, :1]] * (-ox) + [x[:, :ox]], axis=1)
        return x

    taps = [shifted(ox, oy)
            for oy in range(-radius, radius + 1)
            for ox in range(-radius, radius + 1)]
    return jnp.stack(taps, -1).reshape(s * s, len(taps))


def make_shadow_context(
    depth,
    light_viewproj,
    bias_const: float = 0.0008,
    bias_slope: float = 0.0015,
    strength: float = 1.0,
    pcf_radius: int = 2,
    pcf_step: int = 1,
) -> ShadowContext:
    taps = pack_shadow_taps(depth, pcf_radius) \
        if (pcf_radius > 0 and pcf_step == 1) else None
    return ShadowContext(
        depth=depth,
        light_viewproj=jnp.asarray(light_viewproj, jnp.float32),
        bias_const=jnp.float32(bias_const),
        bias_slope=jnp.float32(bias_slope),
        strength=jnp.float32(strength),
        pcf_radius=int(pcf_radius),
        pcf_step=int(pcf_step),
        depth_taps=taps,
    )


def shadow_visibility_dir(shadow: ShadowContext, world_pos, ndotl):
    """Visibility in [0,1] per pixel; world_pos (H,W,3), ndotl (H,W)."""
    sm = shadow.depth
    sh, sw = sm.shape

    # Lane-arithmetic projection: (H,W,4)@(4,4) dot_general is demoted to
    # bf16 inputs by default on TPU (~0.4% uv error = ~8 texels at 2048),
    # and explicit FMAs keep full f32 on the VPU anyway.
    m = shadow.light_viewproj
    px_, py_, pz_ = world_pos[..., 0], world_pos[..., 1], world_pos[..., 2]

    def mrow(r):
        return m[r, 0] * px_ + m[r, 1] * py_ + m[r, 2] * pz_ + m[r, 3]

    p = jnp.stack([mrow(0), mrow(1), mrow(2), mrow(3)], -1)  # (H, W, 4)
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
    elif shadow.depth_taps is not None and step == 1:
        # Packed path: the whole (2r+1)^2 window arrives in ONE wide gather.
        # Rows are clamp-packed (shifted copies replicate edge texels), which
        # matches the reference's per-tap coordinate clamp exactly since the
        # anchor (cx, cy) is always in range.
        #
        # take_rows keeps the gather on the fast path (flat indices + 1D
        # table; see core/gather.py — the naive form costs ~90ms at 1080p).
        from lsr_tpu.core.gather import take_rows

        zf = z_test.reshape(-1)
        window = take_rows(shadow.depth_taps, (cy * sw + cx).reshape(-1))
        lit = jnp.sum((zf[:, None] <= window).astype(jnp.float32), -1)
        vis = (lit / float(window.shape[-1])).reshape(z_test.shape)
    else:
        lit = jnp.zeros_like(z_test)
        for oy in range(-r, r + 1):
            for ox in range(-r, r + 1):
                lit = lit + (z_test <= fetch(ox * step, oy * step)).astype(jnp.float32)
        vis = lit / float((2 * r + 1) ** 2)

    vis = jnp.where(in_map, vis, 1.0)
    return 1.0 + (vis - 1.0) * jnp.clip(shadow.strength, 0.0, 1.0)
