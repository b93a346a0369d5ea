"""Light types as SoA arrays + culling bounds.

The analog of lighting/light_types.hpp:24-435: six light types
(Directional / Point / Spot / RectArea / TubeArea / EnvProbe) stored as one
padded SoA table (the CullingLightGPU std430 packing becomes jnp columns),
with per-type conservative bounding spheres for binning.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2
LIGHT_RECT_AREA = 3
LIGHT_TUBE_AREA = 4
LIGHT_ENV_PROBE = 5

ATTEN_LINEAR = 0
ATTEN_SMOOTH = 1
ATTEN_INVERSE_SQUARE = 2


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "type", "position", "direction", "up", "axis", "color", "intensity",
        "range", "inner_angle", "outer_angle", "rect_half_extents",
        "tube_half_length", "tube_radius", "atten_model", "atten_power",
        "atten_bias", "atten_cutoff", "enabled",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class LightsSoA:
    type: jnp.ndarray              # (L,) i32
    position: jnp.ndarray          # (L, 3)
    direction: jnp.ndarray         # (L, 3) forward (toward scene)
    up: jnp.ndarray                # (L, 3) up hint
    axis: jnp.ndarray              # (L, 3) tube axis (right_ws)
    color: jnp.ndarray             # (L, 3)
    intensity: jnp.ndarray         # (L,)
    range: jnp.ndarray             # (L,)
    inner_angle: jnp.ndarray       # (L,) rad (spot)
    outer_angle: jnp.ndarray       # (L,) rad (spot)
    rect_half_extents: jnp.ndarray # (L, 2)
    tube_half_length: jnp.ndarray  # (L,)
    tube_radius: jnp.ndarray       # (L,)
    atten_model: jnp.ndarray       # (L,) i32
    atten_power: jnp.ndarray       # (L,)
    atten_bias: jnp.ndarray        # (L,)
    atten_cutoff: jnp.ndarray      # (L,)
    enabled: jnp.ndarray           # (L,) bool

    @property
    def count(self) -> int:
        return int(self.type.shape[0])


class LightSetBuilder:
    """Host-side light assembly (LightSet analog, light_set.hpp:22)."""

    def __init__(self):
        self._rows = []

    def _add(self, **kw):
        row = dict(
            type=LIGHT_POINT, position=(0, 0, 0), direction=(0, -1, 0),
            up=(0, 1, 0), axis=(1, 0, 0), color=(1, 1, 1), intensity=1.0,
            range=5.0, inner_angle=0.3, outer_angle=0.5,
            rect_half_extents=(0.5, 0.5), tube_half_length=0.5,
            tube_radius=0.1, atten_model=ATTEN_SMOOTH, atten_power=1.0,
            atten_bias=1e-4, atten_cutoff=0.0, enabled=True,
        )
        row.update(kw)
        self._rows.append(row)
        return len(self._rows) - 1

    def point(self, position, color=(1, 1, 1), intensity=1.0, range=5.0, **kw):
        return self._add(type=LIGHT_POINT, position=position, color=color,
                         intensity=intensity, range=range, **kw)

    def spot(self, position, direction, color=(1, 1, 1), intensity=1.0,
             range=8.0, inner_angle=0.3, outer_angle=0.5, **kw):
        return self._add(type=LIGHT_SPOT, position=position,
                         direction=direction, color=color,
                         intensity=intensity, range=range,
                         inner_angle=inner_angle, outer_angle=outer_angle, **kw)

    def rect_area(self, position, direction, half_extents=(0.5, 0.5),
                  color=(1, 1, 1), intensity=1.0, range=6.0, **kw):
        return self._add(type=LIGHT_RECT_AREA, position=position,
                         direction=direction, rect_half_extents=half_extents,
                         color=color, intensity=intensity, range=range, **kw)

    def tube_area(self, position, axis=(1, 0, 0), half_length=0.5, radius=0.1,
                  color=(1, 1, 1), intensity=1.0, range=6.0, **kw):
        return self._add(type=LIGHT_TUBE_AREA, position=position, axis=axis,
                         tube_half_length=half_length, tube_radius=radius,
                         color=color, intensity=intensity, range=range, **kw)

    def env_probe(self, position, color=(1, 1, 1), intensity=1.0, range=5.0,
                  **kw):
        """Localized-IBL probe (EnvironmentProbe, light_types.hpp:31);
        evaluated by light_runtime.eval_env_probes."""
        return self._add(type=LIGHT_ENV_PROBE, position=position, color=color,
                         intensity=intensity, range=range, **kw)

    def build(self, pad_to: int | None = None) -> LightsSoA:
        rows = list(self._rows)
        n = len(rows)
        total = pad_to or n
        while len(rows) < total:
            r = dict(rows[0]) if rows else {}
            rows.append({**self._rows[0], "enabled": False} if self._rows
                        else r)
        col = lambda k, dt=np.float32: np.asarray(  # noqa: E731
            [r[k] for r in rows], dt
        )
        return LightsSoA(
            type=jnp.asarray(col("type", np.int32)),
            position=jnp.asarray(col("position")),
            direction=jnp.asarray(col("direction")),
            up=jnp.asarray(col("up")),
            axis=jnp.asarray(col("axis")),
            color=jnp.asarray(col("color")),
            intensity=jnp.asarray(col("intensity")),
            range=jnp.asarray(col("range")),
            inner_angle=jnp.asarray(col("inner_angle")),
            outer_angle=jnp.asarray(col("outer_angle")),
            rect_half_extents=jnp.asarray(col("rect_half_extents")),
            tube_half_length=jnp.asarray(col("tube_half_length")),
            tube_radius=jnp.asarray(col("tube_radius")),
            atten_model=jnp.asarray(col("atten_model", np.int32)),
            atten_power=jnp.asarray(col("atten_power")),
            atten_bias=jnp.asarray(col("atten_bias")),
            atten_cutoff=jnp.asarray(col("atten_cutoff")),
            enabled=jnp.asarray(col("enabled", bool))
            if n else jnp.zeros((total,), bool),
        )


def light_bounding_spheres(lights: LightsSoA):
    """Conservative world bounding sphere per light (the per-type bounds
    builders of light_types.hpp:251-435, collapsed to spheres).

    Returns (centers (L,3), radii (L,)).
    """
    r = jnp.maximum(lights.range, 1e-3)
    rect_pad = jnp.linalg.norm(lights.rect_half_extents, axis=-1)
    tube_pad = lights.tube_half_length + lights.tube_radius
    radii = jnp.where(
        lights.type == LIGHT_RECT_AREA, r + rect_pad,
        jnp.where(lights.type == LIGHT_TUBE_AREA, r + tube_pad, r),
    )
    big = jnp.float32(1e8)
    radii = jnp.where(lights.type == LIGHT_DIRECTIONAL, big, radii)
    radii = jnp.where(lights.enabled, radii, 0.0)
    return lights.position, radii
