"""Screen-space ambient occlusion (the fp_stress_ssao.comp / pass-adapter
ssao equivalent): hemisphere depth-comparison AO from the G-buffer.

Fixed spiral sample pattern (deterministic), depth-range-checked occlusion,
simple 3x3 box smooth.  Returns (H, W) AO in [0, 1] (1 = unoccluded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _spiral_offsets(samples: int, radius_px: float):
    a = np.arange(samples, dtype=np.float32)
    ang = a * 2.399963  # golden angle
    r = radius_px * np.sqrt((a + 0.5) / samples)
    return np.stack([np.cos(ang) * r, np.sin(ang) * r], -1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("samples", "radius_px"))
def ssao_pass(gb, zn, zf, samples: int = 12, radius_px: float = 8.0,
              strength: float = 1.0, depth_bias: float = 0.002,
              depth_range: float = 0.02):
    return ssao_depth_pass(gb.depth01, gb.covered, zn, zf, samples=samples,
                           radius_px=radius_px, strength=strength,
                           depth_bias=depth_bias, depth_range=depth_range)


@functools.partial(jax.jit, static_argnames=("samples", "radius_px"))
def ssao_depth_pass(depth, covered, zn, zf, samples: int = 12,
                    radius_px: float = 8.0, strength: float = 1.0,
                    depth_bias: float = 0.002, depth_range: float = 0.02):
    """Depth-only AO core: runs straight off a depth prepass, so the classic
    forward path can register SSAO without a G-buffer pass — the
    reference's custom ssao_forward runs after its depth prepass the same
    way (demo_forward_classic_renderpath.cpp:113, fp_stress_ssao.comp)."""
    h, w = depth.shape
    offsets = _spiral_offsets(samples, radius_px)

    # Offsets are the SAME for every pixel: each tap is an edge-clamped
    # SHIFT (pad+slice), never a gather.
    from lsr_tpu.passes.post import _shift_clamped

    occ = jnp.zeros((h, w), jnp.float32)
    for i in range(samples):
        ox = int(round(float(offsets[i, 0])))
        oy = int(round(float(offsets[i, 1])))
        sd = _shift_clamped(_shift_clamped(depth, oy, 0), ox, 1)
        nearer = sd < depth - depth_bias
        in_range = (depth - sd) < depth_range
        occ = occ + (nearer & in_range).astype(jnp.float32)
    ao = 1.0 - strength * occ / samples

    # 3x3 smooth.
    acc = jnp.zeros_like(ao)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc = acc + jnp.roll(jnp.roll(ao, dy, axis=0), dx, axis=1)
    ao = acc / 9.0
    return jnp.where(covered, jnp.clip(ao, 0.0, 1.0), 1.0)
