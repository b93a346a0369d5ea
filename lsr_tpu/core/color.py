"""Color space helpers matching the reference's conventions.

The reference uses a gamma-2.2 approximation for sRGB decode
(builtin_shaders.hpp:25-31) and Reinhard+gamma tonemap with lround
quantization (pass_tonemap.hpp:55-80).
"""

from __future__ import annotations

import jax.numpy as jnp


def srgb_u8_to_linear(c_u8):
    """u8 sRGB -> linear float via pow(c/255, 2.2) (builtin_shaders.hpp:25)."""
    return jnp.power(jnp.asarray(c_u8, jnp.float32) / 255.0, 2.2)


def srgb_to_linear(c):
    """[0,1] sRGB float -> linear float (gamma 2.2 approximation)."""
    return jnp.power(jnp.maximum(jnp.asarray(c, jnp.float32), 0.0), 2.2)


def linear_to_srgb(c, gamma: float = 2.2):
    return jnp.power(jnp.maximum(jnp.asarray(c, jnp.float32), 0.0), 1.0 / gamma)


def quantize_u8(x01):
    """[0,1] float -> u8 with round-half-up, matching std::lround + clamp
    (pass_tonemap.hpp:74-79).  Assumes non-negative input after clamping."""
    v = jnp.floor(jnp.asarray(x01, jnp.float32) * 255.0 + 0.5)
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)


def u8_to_f01(c_u8):
    return jnp.asarray(c_u8, jnp.float32) / 255.0


def reinhard_tonemap(rgb, exposure: float = 1.0, gamma: float = 2.2):
    """Exposure -> Reinhard -> gamma, the reference tonemap operator
    (pass_tonemap.hpp:55-72). Returns float in [0,1)."""
    c = jnp.maximum(rgb * exposure, 0.0)
    c = c / (1.0 + c)
    return jnp.power(c, 1.0 / gamma)


def luma_bt601(rgb):
    """Perceptual luma used by FXAA/light-shaft prepasses."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b
