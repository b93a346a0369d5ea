"""Pallas Forward+ light accumulation kernel.

The multi-light inner loop is the second-hottest op after rasterization
(the reference's per-pixel light loop in its forward+ fragment shaders).
XLA's scan-based formulation leaves ~100ms on the floor at 1080p/256 lights
because the (tiles, px, chunk) broadcasts don't fuse; this kernel keeps the
whole tile's data in VMEM and walks each tile's light list with a dynamic
trip count, exactly like the raster kernel walks triangles.

Grid = raster-sized screen tiles (default 32x128).  Per tile:
  inputs : packed light records (cap, 32) [pre-gathered, one row gather],
           packed G-buffer planes (8, TH, TW): wp xyz, normal xyz, covered
  outputs: (8, TH, TW): diffuse rgb, specular rgb  (combined with albedo
           outside, matching light_runtime.combine_local_light)

Light model semantics identical to lighting/light_runtime.py (point / spot /
rect-area / tube-area with the reference's shaping + attenuation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsr_tpu.lighting.light_culling import cull_lights_tiled
from lsr_tpu.lighting.light_runtime import pack_light_records
from lsr_tpu.lighting.light_types import (
    LIGHT_POINT,
    LIGHT_RECT_AREA,
    LIGHT_SPOT,
    LIGHT_TUBE_AREA,
)
from lsr_tpu.raster.tiled import default_interpret

_HALF_PI = 1.5707963267948966


def _cdiv(a, b):
    return -(-a // b)


def _fplus_kernel(
    counts_ref,  # (tiles,) i32 scalar prefetch
    z_ref,       # (1, 128) f32: camera_pos xyz
    rec_ref,     # (1, cap, 32) f32: this tile's packed light records
    gb_ref,      # (8, TH, TW) f32: wp xyz, n xyz, covered
    out_ref,     # (8, TH, TW) f32: diffuse rgb, spec rgb
    *, chunk: int, tiles_x: int,
):
    tyi = pl.program_id(0)
    txi = pl.program_id(1)
    count = counts_ref[tyi * tiles_x + txi]

    px = gb_ref[0]
    py = gb_ref[1]
    pz = gb_ref[2]
    nx = gb_ref[3]
    ny = gb_ref[4]
    nz = gb_ref[5]
    covered = gb_ref[6] > 0.0

    cx = z_ref[0, 0]
    cy = z_ref[0, 1]
    cz = z_ref[0, 2]
    vx = cx - px
    vy = cy - py
    vz = cz - pz
    vl = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-16))
    vx, vy, vz = vx * vl, vy * vl, vz * vl

    shape = px.shape
    zero = jnp.zeros(shape, jnp.float32)

    def chunk_body(ci, carry):
        dr, dg, db, sr, sg, sb = carry
        base = pl.multiple_of(ci * chunk, chunk)
        blk = rec_ref[0, pl.ds(base, chunk), :]  # (chunk, 32)

        def f(j):
            return blk[:, j].reshape(chunk, 1, 1)

        ltype = f(0)
        posx, posy, posz = f(1), f(2), f(3)
        # Per-light unit vectors (scalar per light, normalized here).
        def unit3(a, b, c):
            il = jax.lax.rsqrt(jnp.maximum(a * a + b * b + c * c, 1e-16))
            return a * il, b * il, c * il

        fwdx, fwdy, fwdz = unit3(f(4), f(5), f(6))
        upx, upy, upz = unit3(f(7), f(8), f(9))
        axx, axy, axz = unit3(f(10), f(11), f(12))
        colr, colg, colb = f(13), f(14), f(15)
        intensity = f(16)
        rng = jnp.maximum(f(17), 0.001)
        inner = jnp.clip(f(18), 0.02, _HALF_PI - 0.02)
        outer = jnp.clip(jnp.maximum(inner + 0.005, f(19)), inner + 0.005,
                         _HALF_PI - 0.005)
        hex_, hey = jnp.maximum(f(20), 0.05), jnp.maximum(f(21), 0.05)
        thl = jnp.maximum(f(22), 0.1)
        amodel = f(24)
        apow = jnp.maximum(f(25), 0.001)
        abias = jnp.maximum(f(26), 1e-5)
        acut = f(27)

        # Rect basis (per light): right = n(up x fwd); up2 = n(fwd x right).
        rx0 = upy * fwdz - upz * fwdy
        ry0 = upz * fwdx - upx * fwdz
        rz0 = upx * fwdy - upy * fwdx
        rx0, ry0, rz0 = unit3(rx0, ry0, rz0)
        u2x = fwdy * rz0 - fwdz * ry0
        u2y = fwdz * rx0 - fwdx * rz0
        u2z = fwdx * ry0 - fwdy * rx0
        u2x, u2y, u2z = unit3(u2x, u2y, u2z)
        rx = u2y * fwdz - u2z * fwdy
        ry = u2z * fwdx - u2x * fwdz
        rz = u2x * fwdy - u2y * fwdx
        rx, ry, rz = unit3(rx, ry, rz)

        is_spot = ltype == float(LIGHT_SPOT)
        is_rect = ltype == float(LIGHT_RECT_AREA)
        is_tube = ltype == float(LIGHT_TUBE_AREA)

        # Emission point (per pixel for rect/tube).
        dxp = px[None] - posx
        dyp = py[None] - posy
        dzp = pz[None] - posz
        ux = jnp.clip(dxp * rx + dyp * ry + dzp * rz, -hex_, hex_)
        uy = jnp.clip(dxp * u2x + dyp * u2y + dzp * u2z, -hey, hey)
        rectx = posx + rx * ux + u2x * uy
        recty = posy + ry * ux + u2y * uy
        rectz = posz + rz * ux + u2z * uy

        ax2 = axx * (2.0 * thl)
        ay2 = axy * (2.0 * thl)
        az2 = axz * (2.0 * thl)
        a0x = posx - axx * thl
        a0y = posy - axy * thl
        a0z = posz - axz * thl
        denom_seg = jnp.maximum(ax2 * ax2 + ay2 * ay2 + az2 * az2, 1e-8)
        tseg = jnp.clip(
            ((px[None] - a0x) * ax2 + (py[None] - a0y) * ay2
             + (pz[None] - a0z) * az2) / denom_seg, 0.0, 1.0)
        tubex = a0x + ax2 * tseg
        tubey = a0y + ay2 * tseg
        tubez = a0z + az2 * tseg

        emx = jnp.where(is_rect, rectx, jnp.where(is_tube, tubex, posx))
        emy = jnp.where(is_rect, recty, jnp.where(is_tube, tubey, posy))
        emz = jnp.where(is_rect, rectz, jnp.where(is_tube, tubez, posz))

        tlx = emx - px[None]
        tly = emy - py[None]
        tlz = emz - pz[None]
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-16))
        inv_d = 1.0 / dist
        lx, ly, lz = tlx * inv_d, tly * inv_d, tlz * inv_d

        # Spot shaping (smoothstep cone).
        cos_t = -(lx * fwdx + ly * fwdy + lz * fwdz)
        cin = jnp.cos(inner)
        cout = jnp.cos(outer)
        tt = jnp.clip((cos_t - cout) / jnp.maximum(cin - cout, 1e-5), 0.0, 1.0)
        spot_shape = jnp.where(cos_t > cout, tt * tt * (3.0 - 2.0 * tt), 0.0)

        facing = jnp.maximum(-(fwdx * lx + fwdy * ly + fwdz * lz), 0.0)
        rect_shape = jnp.where(facing > 0.0, 0.65 + 0.55 * facing, 0.0)

        soft = jnp.clip(1.0 - dist / rng, 0.0, 1.0)
        tube_shape = 0.75 + 0.35 * soft

        shaping = jnp.where(is_spot, spot_shape,
                            jnp.where(is_rect, rect_shape,
                                      jnp.where(is_tube, tube_shape, 1.0)))
        spec_pw = jnp.where(is_spot, 34.0,
                            jnp.where(is_rect, 26.0,
                                      jnp.where(is_tube, 22.0, 36.0)))
        spec_sc = jnp.where(is_spot, 0.32,
                            jnp.where(is_rect, 0.26,
                                      jnp.where(is_tube, 0.20, 0.30)))

        # Attenuation (eval_distance_attenuation).
        norm = jnp.clip(1.0 - dist / rng, 0.0, 1.0)
        smooth = norm * norm * (3.0 - 2.0 * norm)
        invsq = jnp.minimum(1.0, (rng * rng) / jnp.maximum(dist * dist, abias)) \
            * norm * norm
        fall = jnp.where(amodel == 0.0, norm,
                         jnp.where(amodel == 1.0, smooth, invsq))
        fall = jnp.power(jnp.maximum(fall, 1e-9), apow)
        fall = jnp.where((acut > 0.0) & (fall < acut), 0.0, fall)
        atten = jnp.where(dist < rng, fall, 0.0) * jnp.maximum(shaping, 0.0)

        ndl = jnp.maximum(nx[None] * lx + ny[None] * ly + nz[None] * lz, 0.0)
        live = (dist > 1e-4) & (ndl > 0.0) & (atten > 0.0) & covered[None]
        gain = jnp.where(live, intensity * atten, 0.0)

        hx = lx + vx[None]
        hy = ly + vy[None]
        hz = lz + vz[None]
        hl = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-16))
        ndh = jnp.maximum(nx[None] * (hx * hl) + ny[None] * (hy * hl)
                          + nz[None] * (hz * hl), 0.0)
        spec = spec_sc * jnp.power(jnp.maximum(ndh, 1e-9), spec_pw)

        wd = gain * ndl
        ws = gain * spec
        dr = dr + jnp.sum(jnp.maximum(colr, 0.0) * wd, axis=0)
        dg = dg + jnp.sum(jnp.maximum(colg, 0.0) * wd, axis=0)
        db = db + jnp.sum(jnp.maximum(colb, 0.0) * wd, axis=0)
        sr = sr + jnp.sum(jnp.maximum(colr, 0.0) * ws, axis=0)
        sg = sg + jnp.sum(jnp.maximum(colg, 0.0) * ws, axis=0)
        sb = sb + jnp.sum(jnp.maximum(colb, 0.0) * ws, axis=0)
        return dr, dg, db, sr, sg, sb

    cap = rec_ref.shape[1]
    n_chunks = jnp.minimum(pl.cdiv(count, chunk), cap // chunk)
    dr, dg, db, sr, sg, sb = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (zero, zero, zero, zero, zero, zero)
    )
    out_ref[0] = dr
    out_ref[1] = dg
    out_ref[2] = db
    out_ref[3] = sr
    out_ref[4] = sg
    out_ref[5] = sb
    out_ref[6] = zero
    out_ref[7] = zero


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "cap", "chunk",
                     "interpret"),
)
def accumulate_lights_pallas(
    gb_world_pos, gb_normal, gb_covered, camera_pos,
    lights, view, proj,
    width: int, height: int,
    tile_h: int = 64, tile_w: int = 128,
    cap: int = 256, chunk: int = 16,
    tile_depth_range=None,
    interpret: bool | None = None,
):
    """Binned local-light accumulation on raster-shaped tiles.

    Returns (diffuse (H,W,3), specular (H,W,3), bin_stats dict
    {max_count, overflow_bins})."""
    if interpret is None:
        interpret = default_interpret()
    tiles_x = _cdiv(width, tile_w)
    tiles_y = _cdiv(height, tile_h)
    num_tiles = tiles_x * tiles_y
    ph, pw = tiles_y * tile_h, tiles_x * tile_w

    lists, counts, bin_stats = cull_lights_tiled(
        lights, view, proj, width, height,
        tile_size=tile_w, tile_h=tile_h, cap=cap,
        tile_depth_range=tile_depth_range,
    )
    packed = pack_light_records(lights)
    from lsr_tpu.core.gather import take_rows

    tile_rec = take_rows(packed, jnp.maximum(lists, 0))
    tile_rec = jnp.where((lists >= 0)[..., None], tile_rec, 0.0)

    def padp(x):
        return jnp.pad(x, ((0, ph - height), (0, pw - width)) + ((0, 0),) * (x.ndim - 2))

    gbuf = jnp.stack([
        padp(gb_world_pos[..., 0]), padp(gb_world_pos[..., 1]),
        padp(gb_world_pos[..., 2]),
        padp(gb_normal[..., 0]), padp(gb_normal[..., 1]), padp(gb_normal[..., 2]),
        padp(gb_covered.astype(jnp.float32)),
        jnp.zeros((ph, pw), jnp.float32),
    ])  # (8, ph, pw)

    zparams = jnp.zeros((1, 128), jnp.float32)
    zparams = zparams.at[0, :3].set(camera_pos.astype(jnp.float32))

    kern = functools.partial(_fplus_kernel, chunk=chunk, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i, j, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, 32), lambda i, j, c: (i * tiles_x + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_h, tile_w), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_h, tile_w), lambda i, j, c: (0, i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ph, pw), jnp.float32),
        interpret=interpret,
    )(counts, zparams, tile_rec, gbuf)

    diffuse = jnp.moveaxis(out[0:3, :height, :width], 0, -1)
    specular = jnp.moveaxis(out[3:6, :height, :width], 0, -1)
    return diffuse, specular, bin_stats
