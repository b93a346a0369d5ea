"""Tonemap pass: HDR -> LDR u8 (PassTonemap semantics, pass_tonemap.hpp:37-84).

Exposure guard, Reinhard, gamma, lround-compatible quantization — one fused
elementwise pass over the framebuffer.
"""

from __future__ import annotations

import jax.numpy as jnp

from lsr_tpu.core.color import quantize_u8


def tonemap_pass(hdr_rgb, exposure: float = 1.0, gamma: float = 2.2):
    """(H, W, 3|4) f32 linear HDR -> (H, W, 3) u8 LDR."""
    exposure = jnp.maximum(jnp.float32(exposure), 0.0001)
    inv_gamma = 1.0 / jnp.maximum(jnp.float32(gamma), 0.001)
    c = jnp.maximum(hdr_rgb[..., :3] * exposure, 0.0)
    c = c / (1.0 + c)
    c = jnp.power(c, inv_gamma)
    return quantize_u8(c)
