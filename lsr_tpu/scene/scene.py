"""Retained scene: objects SoA + camera + lights, as device pytrees.

The analog of scene/scene_types.hpp:45-105 (Scene/RenderItem/Camera/
DirectionalLight), restructured for SPMD: per-object data are SoA arrays,
geometry is one concatenated batch with object-id channels, and "culling"
produces visibility masks consumed by the rasterizer's valid lanes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.geometry.volumes import (
    frustum_cull_objects,
    merge_aabbs,
    transform_aabb,
)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["positions", "normals", "uvs", "indices", "vtx_obj", "tri_obj"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GeometryBatch:
    positions: jnp.ndarray  # (V, 3)
    normals: jnp.ndarray    # (V, 3)
    uvs: jnp.ndarray        # (V, 2)
    indices: jnp.ndarray    # (T, 3)
    vtx_obj: jnp.ndarray    # (V,) i32
    tri_obj: jnp.ndarray    # (T,) i32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "model", "prev_model", "normal_mat", "local_min", "local_max",
        "casts_shadow", "visible", "material",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ObjectsSoA:
    """Per-object render items (RenderItem analog, scene_types.hpp:71)."""

    model: jnp.ndarray        # (O, 4, 4)
    prev_model: jnp.ndarray   # (O, 4, 4)
    normal_mat: jnp.ndarray   # (O, 3, 3)
    local_min: jnp.ndarray    # (O, 3)
    local_max: jnp.ndarray    # (O, 3)
    casts_shadow: jnp.ndarray # (O,) bool
    visible: jnp.ndarray      # (O,) bool
    material: jnp.ndarray     # (O,) i32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["view", "proj", "viewproj", "prev_viewproj", "eye", "zn", "zf"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class CameraState:
    view: jnp.ndarray
    proj: jnp.ndarray
    viewproj: jnp.ndarray
    prev_viewproj: jnp.ndarray
    eye: jnp.ndarray
    zn: jnp.ndarray
    zf: jnp.ndarray


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["dir_ws", "color", "intensity"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class SunLight:
    dir_ws: jnp.ndarray   # (3,) from light toward scene
    color: jnp.ndarray    # (3,)
    intensity: jnp.ndarray


def make_camera(width, height, eye, target, fov=np.pi / 3, zn=0.1, zf=100.0,
                up=(0, 1, 0), prev_viewproj=None) -> CameraState:
    view = m3.look_at_lh(jnp.asarray(eye, jnp.float32),
                         jnp.asarray(target, jnp.float32),
                         jnp.asarray(up, jnp.float32))
    proj = m3.perspective_lh_no(fov, width / height, zn, zf)
    vp = proj @ view
    return CameraState(
        view=view, proj=proj, viewproj=vp,
        prev_viewproj=vp if prev_viewproj is None else prev_viewproj,
        eye=jnp.asarray(eye, jnp.float32),
        zn=jnp.float32(zn), zf=jnp.float32(zf),
    )


def update_prev(camera: CameraState, prev: CameraState) -> CameraState:
    return dataclasses.replace(camera, prev_viewproj=prev.viewproj)


class SceneBuilder:
    """Host-side scene assembly -> device pytrees."""

    def __init__(self):
        self._meshes = []
        self._models = []
        self._prev_models = []
        self._materials = []
        self._casts_shadow = []
        self._visible = []

    def add(self, mesh, model=None, material: int = 0, casts_shadow=True,
            visible=True, prev_model=None):
        model = np.eye(4, dtype=np.float32) if model is None else np.asarray(model, np.float32)
        self._meshes.append(mesh)
        self._models.append(model)
        self._prev_models.append(
            model if prev_model is None else np.asarray(prev_model, np.float32)
        )
        self._materials.append(material)
        self._casts_shadow.append(bool(casts_shadow))
        self._visible.append(bool(visible))
        return len(self._meshes) - 1

    def build(self):
        from lsr_tpu.render import concat_scene

        batch_np = concat_scene(self._meshes)
        geom = GeometryBatch(**{k: jnp.asarray(v) for k, v in batch_np.items()})
        models = np.stack(self._models)
        prev = np.stack(self._prev_models)
        nmats = np.stack([
            np.asarray(m3.normal_matrix(jnp.asarray(m))) for m in self._models
        ])
        lmins = np.stack([m.positions.min(axis=0) for m in self._meshes])
        lmaxs = np.stack([m.positions.max(axis=0) for m in self._meshes])
        objects = ObjectsSoA(
            model=jnp.asarray(models),
            prev_model=jnp.asarray(prev),
            normal_mat=jnp.asarray(nmats),
            local_min=jnp.asarray(lmins),
            local_max=jnp.asarray(lmaxs),
            casts_shadow=jnp.asarray(self._casts_shadow),
            visible=jnp.asarray(self._visible),
            material=jnp.asarray(self._materials, jnp.int32),
        )
        return geom, objects


# ---------------------------------------------------------------------------
# Scene-level culling (SceneCullingContext analog, scene_culling.hpp:28)
# ---------------------------------------------------------------------------

def object_world_aabbs(objects: ObjectsSoA):
    return transform_aabb(objects.model, objects.local_min, objects.local_max)


def cull_scene(objects: ObjectsSoA, viewproj):
    """Frustum visibility mask per object (culling_runtime.hpp:111 analog)."""
    wmin, wmax = object_world_aabbs(objects)
    return frustum_cull_objects(viewproj, wmin, wmax) & objects.visible


def shadow_caster_aabb(objects: ObjectsSoA):
    """Merged world AABB of shadow casters (pass_shadow_map.hpp:70-131)."""
    wmin, wmax = object_world_aabbs(objects)
    mask = objects.casts_shadow & objects.visible
    any_caster = jnp.any(mask)
    smin, smax = merge_aabbs(wmin, wmax, mask)
    # No casters -> unit box fallback (pass_shadow_map.hpp:127-131).
    smin = jnp.where(any_caster, smin, -jnp.ones(3, jnp.float32))
    smax = jnp.where(any_caster, smax, jnp.ones(3, jnp.float32))
    return smin, smax
