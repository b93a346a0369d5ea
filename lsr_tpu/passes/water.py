"""Water rendering: planar reflection + Fresnel + ripple + depth fog.

The hello_water capability (hello-render-target/hello_water.cpp): the scene
is re-rendered with the camera mirrored about the water plane into a
reflection target; the water surface then mixes a ripple-distorted sample of
that target with the water tint by a Fresnel term, and distance fog settles
over everything.
"""

from __future__ import annotations

import jax.numpy as jnp

from lsr_tpu.core import math3d as m3
from lsr_tpu.core.gather import take_rows
from lsr_tpu.shading.procedural import snoise2


def mirror_matrix_y(plane_y):
    """Reflection about the horizontal plane y = plane_y."""
    t = m3.translate(jnp.asarray([0.0, plane_y, 0.0]))
    s = m3.scale(jnp.asarray([1.0, -1.0, 1.0]))
    ti = m3.translate(jnp.asarray([0.0, -plane_y, 0.0]))
    return t @ s @ ti


def mirrored_camera(view, plane_y):
    """View matrix of the camera reflected about the water plane.

    Mirroring flips handedness, so rasterize the reflection pass with
    front-face culling inverted (CULL_FRONT with our conventions).
    """
    return view @ mirror_matrix_y(plane_y)


def shade_water(
    gb,
    reflection_hdr,
    water_obj_id: int,
    base_hdr,
    camera_pos,
    time=0.0,
    water_tint=(0.08, 0.18, 0.22),
    ripple_scale: float = 3.0,
    ripple_strength_px: float = 6.0,
    f0: float = 0.04,
):
    """Composite the water surface into a lit frame.

    gb: main-view G-buffer; reflection_hdr: (H, W, 3) HDR rendered through
    the mirrored camera (same resolution); base_hdr: the lit frame before
    water; water pixels are replaced by tint/reflection Fresnel mix.
    """
    h, w = gb.depth01.shape
    is_water = gb.obj_id == water_obj_id

    # Ripple distortion from animated noise over world xz.
    nx = snoise2(gb.world_pos[..., 0] * ripple_scale + time * 0.7,
                 gb.world_pos[..., 2] * ripple_scale)
    ny = snoise2(gb.world_pos[..., 0] * ripple_scale + 13.1,
                 gb.world_pos[..., 2] * ripple_scale - time * 0.6)

    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    sx = jnp.clip(jnp.round(xs + nx * ripple_strength_px), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(ys + ny * ripple_strength_px), 0, h - 1).astype(jnp.int32)
    refl = take_rows(reflection_hdr.reshape(h * w, -1), sy * w + sx)

    # Schlick Fresnel with the water normal perturbed by the ripple.
    n = gb.normal_ws + jnp.stack([nx, jnp.zeros_like(nx), ny], -1) * 0.08
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    v = camera_pos[None, None, :] - gb.world_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-8)
    ndv = jnp.clip(jnp.sum(n * v, axis=-1, keepdims=True), 0.0, 1.0)
    fres = f0 + (1.0 - f0) * jnp.power(1.0 - ndv, 5.0)

    tint = jnp.asarray(water_tint, jnp.float32)
    water_col = tint + (refl - tint) * fres
    return jnp.where(is_water[..., None], water_col, base_hdr)
