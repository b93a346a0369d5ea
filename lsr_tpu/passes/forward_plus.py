"""Forward+ / clustered-forward lighting passes.

The fused TPU equivalent of pass_adapters' pbr_forward_plus /
pbr_forward_clustered (pipeline/pass_adapters.hpp): sun + IBL shading from
the G-buffer, plus binned local-light accumulation (tiled or clustered),
composited over the background.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lsr_tpu.lighting.light_culling import (
    cull_lights_clustered,
    cull_lights_tiled,
    tile_depth_ranges_from_buffer,
    view_depth_to_cluster_slice,
)
from lsr_tpu.lighting.light_runtime import accumulate_local_lights
from lsr_tpu.shading.common import sample_texture_bilinear
from lsr_tpu.shading.models import SHADING_MODELS, composite_over_background


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "cap", "chunk",
                     "mode", "slices", "sun_model", "use_kernel"),
)
def shade_forward_plus(
    gb,
    ctx,
    lights,
    view,
    proj,
    zn,
    zf,
    width: int,
    height: int,
    tile_size: int = 16,
    cap: int = 128,
    chunk: int = 8,
    mode: str = "tiled",  # "tiled" | "tiled_depth_range" | "clustered"
    slices: int = 16,
    sun_model: str = "pbr_mr",
    background=(0.04, 0.06, 0.1),
    use_kernel: bool = True,
):
    """Full lit HDR frame from a G-buffer + light set.

    Returns (hdr (H,W,3), light_stats dict).
    """
    # Sun + ambient/IBL via the built-in single-light models.
    base = SHADING_MODELS[sun_model](gb, ctx)

    # Local light binning + accumulation.  The Pallas kernel path covers the
    # tiled modes (the hot case); clustered keeps the XLA path.
    if use_kernel and mode in ("tiled", "tiled_depth_range"):
        from lsr_tpu.lighting.fplus_kernel import accumulate_lights_pallas

        tdr = None
        if mode == "tiled_depth_range":
            tdr = tile_depth_ranges_from_buffer(
                gb.depth01, zn, zf, width, height, 128, tile_h=64
            )
        diff, spec, max_count = accumulate_lights_pallas(
            gb.world_pos, gb.normal_ws, gb.covered, ctx.camera_pos,
            lights, view, proj, width, height,
            tile_h=64, tile_w=128, cap=cap * 2, chunk=16,
            tile_depth_range=tdr,
        )
        counts = jnp.zeros((1,), jnp.int32)  # stats placeholder
    elif mode == "clustered":
        lists, counts, max_count = cull_lights_clustered(
            lights, view, proj, zn, zf, width, height,
            tile_size=tile_size, cap=cap, slices=slices,
        )
        view_z = zn + gb.depth01 * (zf - zn)
        cluster = view_depth_to_cluster_slice(view_z, zn, zf, slices)
        diff, spec = accumulate_local_lights(
            gb.world_pos, gb.normal_ws, ctx.camera_pos, lights, lists,
            width, height, tile_size=tile_size, chunk=chunk,
            cluster_of_pixel=cluster, slices=slices,
        )
    else:
        tdr = None
        if mode == "tiled_depth_range":
            tdr = tile_depth_ranges_from_buffer(
                gb.depth01, zn, zf, width, height, tile_size
            )
        lists, counts, max_count = cull_lights_tiled(
            lights, view, proj, width, height,
            tile_size=tile_size, cap=cap, tile_depth_range=tdr,
        )
        diff, spec = accumulate_local_lights(
            gb.world_pos, gb.normal_ws, ctx.camera_pos, lights, lists,
            width, height, tile_size=tile_size, chunk=chunk,
        )

    # Material combine (albedo-modulated diffuse + specular).
    from lsr_tpu.shading.common import gather_materials

    mat_base, _, _, _, _, tex_id = gather_materials(ctx.materials, gb.obj_id)
    albedo = mat_base
    if ctx.textures is not None:
        albedo = albedo * sample_texture_bilinear(
            ctx.textures, tex_id, gb.uv, quads=ctx.texture_quads
        )
    local = jnp.maximum(albedo, 0.0) * diff + spec

    hdr = base + local
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), hdr.shape)
    hdr = composite_over_background(hdr, gb, bg)
    stats = {"max_lights_per_bin": max_count, "total_bins": counts.shape[0]}
    return hdr, stats
