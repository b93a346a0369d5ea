"""Directional-light camera fitting (shadow map frustum).

The analog of build_dir_light_camera_aabb (camera/light_camera.hpp:24-90):
fit an orthographic LH frustum around the shadow-caster scene AABB viewed
along the light direction, with texel snapping to kill shimmer.
All math is jit-safe (no data-dependent shapes).
"""

from __future__ import annotations

import jax.numpy as jnp

from lsr_tpu.core import math3d as m3


def build_dir_light_camera(scene_min, scene_max, light_dir_ws, shadow_map_size: int,
                           depth_margin: float = 1.0):
    """Returns (light_view, light_proj, light_viewproj) for the sun.

    light_dir_ws points from the light toward the scene.
    """
    center = (scene_min + scene_max) * 0.5
    radius = jnp.maximum(jnp.linalg.norm(scene_max - scene_min) * 0.5, 1e-3)

    d = m3.normalize(jnp.asarray(light_dir_ws, jnp.float32))
    # Stable up vector: avoid near-parallel.
    up = jnp.where(jnp.abs(d[1]) > 0.95,
                   jnp.array([0.0, 0.0, 1.0], jnp.float32),
                   jnp.array([0.0, 1.0, 0.0], jnp.float32))
    eye = center - d * (radius * 2.0 + depth_margin)
    view = m3.look_at_lh(eye, center, up)

    # Transform the 8 AABB corners into light view space; fit extents.
    corners = jnp.stack(
        [
            jnp.stack([
                jnp.where(i & 1, scene_max[0], scene_min[0]),
                jnp.where(i & 2, scene_max[1], scene_min[1]),
                jnp.where(i & 4, scene_max[2], scene_min[2]),
            ])
            for i in range(8)
        ]
    )  # (8, 3)
    c_view = m3.transform_points(view, corners)
    vmin = c_view.min(axis=0)
    vmax = c_view.max(axis=0)

    # Texel snapping (light_camera.hpp texel-snap): quantize the xy window
    # origin to shadow-texel units.
    world_units_per_texel = (vmax[:2] - vmin[:2]) / shadow_map_size
    wupt = jnp.maximum(world_units_per_texel, 1e-8)
    vmin_xy = jnp.floor(vmin[:2] / wupt) * wupt
    vmax_xy = vmin_xy + (vmax[:2] - vmin[:2])

    zn = vmin[2] - depth_margin
    zf = vmax[2] + depth_margin
    proj = m3.ortho_lh_no(vmin_xy[0], vmax_xy[0], vmin_xy[1], vmax_xy[1], zn, zf)
    return view, proj, proj @ view


def follow_camera_eye(target_pos, target_yaw, distance: float = 5.0,
                      height: float = 2.0, lag: float = 1.0, prev_eye=None):
    """Third-person follow rig (camera/ follow-camera analog): the eye sits
    `distance` behind the target's facing direction at `height`, optionally
    low-pass-lagged toward the previous eye (lag in [0,1], 1 = no lag)."""
    target_pos = jnp.asarray(target_pos, jnp.float32)
    fwd = jnp.stack([jnp.sin(target_yaw), jnp.zeros_like(target_yaw),
                     jnp.cos(target_yaw)])
    desired = target_pos - fwd * distance + jnp.asarray(
        [0.0, height, 0.0], jnp.float32)
    if prev_eye is None:
        return desired
    prev_eye = jnp.asarray(prev_eye, jnp.float32)
    return prev_eye + (desired - prev_eye) * jnp.clip(lag, 0.0, 1.0)
