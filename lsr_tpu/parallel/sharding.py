"""Multi-chip scaling: device meshes + sharded render steps.

The reference is single-process (SURVEY.md §2.3); its scaling axes are screen
tiles and job workers.  On TPU the natural multi-chip axes are:

- **dp** (data parallel): independent frames/cameras/views per device — the
  renderer analog of batch parallelism (e.g. cubemap faces, stereo eyes,
  multi-camera capture rigs),
- **sp** (screen-space parallel): horizontal framebuffer bands per device —
  geometry is replicated, every device rasterizes only its band (the
  rasterizer's y_offset/full_height path), and the image is the concatenation
  of bands over the mesh axis.  No cross-band halo is needed because triangle
  coverage is computed per pixel from replicated setup (the z-buffer is
  band-local by construction).

Both compose: mesh ("dp", "sp").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lsr_tpu.raster.interp import interpolate_gbuffer
from lsr_tpu.raster.setup import scene_setup
from lsr_tpu.raster.tiled import rasterize_tiled
from lsr_tpu.passes.tonemap import tonemap_pass
from lsr_tpu.shading.models import SHADING_MODELS, composite_over_background


def make_mesh(n_devices: int, dp: int | None = None, devices=None) -> Mesh:
    """Build a ("dp", "sp") mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()[:n_devices]
    if dp is None:
        dp = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    sp = n_devices // dp
    if len(devices) < dp * sp:
        raise ValueError(
            f"make_mesh needs {dp * sp} devices (dp={dp} x sp={sp}) but only "
            f"{len(devices)} are visible. For CI/dryrun, force virtual CPU "
            "devices BEFORE importing jax: XLA_FLAGS="
            f"--xla_force_host_platform_device_count={dp * sp} "
            "JAX_PLATFORMS=cpu (see lsr_tpu/parallel/dryrun.py)."
        )
    arr = np.asarray(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def render_band(geom, objects, viewproj, zn, zf, shade_ctx,
                width, height, band_h, y_offset,
                model_name="blinn_phong", background=(0.04, 0.06, 0.1),
                cap=512, use_tiled=True):
    """Render global rows [y_offset, y_offset+band_h) of a (height, width)
    frame.  Pure function, callable inside shard_map."""
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        viewproj, width, height, obj_visible=objects.visible,
    )
    if use_tiled:
        from lsr_tpu.raster.tiled import rasterize_direct

        depth, tid, _ = rasterize_direct(
            setup, width, band_h, zn, zf,
            y_offset=y_offset, full_height=height,
        )
    else:
        from lsr_tpu.raster.brute import rasterize_brute
        # The brute path has no band support; raster full then slice.
        d_full, t_full = rasterize_brute(setup, width, height, zn, zf)
        depth = jax.lax.dynamic_slice_in_dim(d_full, y_offset, band_h, 0)
        tid = jax.lax.dynamic_slice_in_dim(t_full, y_offset, band_h, 0)
    gb = interpolate_gbuffer(setup, depth, tid, y_offset=y_offset)
    shaded = SHADING_MODELS[model_name](gb, shade_ctx)
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), shaded.shape)
    hdr = composite_over_background(shaded, gb, bg)
    return tonemap_pass(hdr)


def make_sharded_render(mesh: Mesh, geom, objects, shade_ctx,
                        width: int, height: int,
                        model_name: str = "blinn_phong", cap: int = 512):
    """Build a jitted multi-chip render step.

    Input: viewprojs (B, 4, 4) with B = dp size (one camera per dp slice);
    zn/zf scalars.  Output: (B, height, width, 3) u8, sharded (dp, sp) —
    each device computes its (camera, band) cell.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert height % sp == 0, "height must divide by sp bands"
    band_h = height // sp

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    def step(viewprojs, zn, zf):
        def shard_fn(vp_local):
            # vp_local: (B/dp, 4, 4); one camera per dp slice here (B==dp).
            sp_idx = jax.lax.axis_index("sp")
            y0 = sp_idx * band_h

            def one(vp):
                return render_band(
                    geom, objects, vp, zn, zf, shade_ctx,
                    width, height, band_h, y0,
                    model_name=model_name, cap=cap,
                )

            return jax.vmap(one)(vp_local)

        out = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("dp"),),
            out_specs=P("dp", "sp"),
            check_vma=False,
        )(viewprojs)
        return out

    in_sharding = (NamedSharding(mesh, P("dp")), None, None)
    out_sharding = NamedSharding(mesh, P("dp", "sp"))
    return jax.jit(step, in_shardings=in_sharding, out_shardings=out_sharding)
