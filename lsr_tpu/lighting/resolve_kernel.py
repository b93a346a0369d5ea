"""Fully-fused resolve kernel: interp + sun + local lights + ambient in ONE
Pallas pass.

The round-2 fusion step beyond shade_kernel.py (ARCHITECTURE.md §6): the
per-pixel interp record gather must stay in XLA (TPU gathers are an XLA
primitive), but EVERYTHING downstream — barycentric weights, world-pos /
normal interpolation, material slicing, sun BRDF + shadow term, the binned
local-light loop, fake-IBL ambient, emissive, and background compositing —
runs inside one kernel over screen tiles, eliminating the intermediate
G-buffer materialization (~500MB of HBM round-trips per frame) and the
XLA-side interp arithmetic.

Inputs per (64, 128) tile (one (64, TH, TW) VMEM block):
  0:56   interp record planes (pack_interp_records layout, transposed)
  56     sun shadow visibility (computed in XLA: PCF needs a table gather)
  57     covered (tid >= 0)
  58:61  texture albedo multiplier (1.0 where untextured)
  61:64  pad

Uniform row (1, 128): 0:3 camera_pos | 3:6 sun dir | 6:9 sun radiance |
  9:12 background | 12 ambient on/off.

The sun/local-light loop body is shared with shade_kernel semantics
(lighting/light_runtime.py reference ports).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lsr_tpu.lighting.fplus_kernel import _cdiv
from lsr_tpu.lighting.light_culling import cull_lights_tiled
from lsr_tpu.lighting.light_runtime import pack_light_records
from lsr_tpu.lighting.light_types import (
    LIGHT_RECT_AREA,
    LIGHT_SPOT,
    LIGHT_TUBE_AREA,
)
from lsr_tpu.raster.tiled import default_interpret

_PI = 3.14159265358979
_HALF_PI = 1.5707963267948966


def _sum0(x):
    """Reduce a (chunk, th, tw) value over its static leading axis with a
    pairwise tree of 2D adds.  Mosaic rejects the equivalent 3D
    ``jnp.sum(axis=0)`` at chunk=16 ("Unsupported output implicit
    dimension", vector<16x64x128> -> vector<64x128>); static slices + 2D
    vector adds lower everywhere and cost the same chunk-1 adds."""
    parts = [x[j] for j in range(x.shape[0])]
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _resolve_kernel(
    counts_ref, z_ref, lrec_ref, in_ref, *rest,
    chunk: int, tiles_x: int, sun_model: str, tile_h: int, tile_w: int,
    rec_layout: str = "planes", n_vis: int = 0,
    light_kinds: tuple | None = None,
):
    # Static light-type specialization (see shade_kernel._shade_kernel):
    # math for types absent from light_kinds is dropped, bit-exact.
    has_spot = light_kinds is None or LIGHT_SPOT in light_kinds
    has_rect = light_kinds is None or LIGHT_RECT_AREA in light_kinds
    has_tube = light_kinds is None or LIGHT_TUBE_AREA in light_kinds
    if n_vis:
        vis_ref, out_ref = rest
    else:
        (out_ref,) = rest
        vis_ref = None
    tyi = pl.program_id(0)
    txi = pl.program_id(1)
    count = counts_ref[tyi * tiles_x + txi]

    # --- interp: weights from the coef lanes at this tile's pixel coords --
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
    sx = (txi * tile_w) + col.astype(jnp.float32) + 0.5
    sy = (tyi * tile_h) + row.astype(jnp.float32) + 0.5

    if rec_layout == "planes":
        def r(c):
            return in_ref[c]
    else:
        # "lanes": the gather output arrives pixel-major (th, tw, 64) —
        # NO XLA-side (H, W, 64) -> (64, H, W) transpose (the op that ate
        # the round-2 fusion win, ARCHITECTURE.md §6 / VERDICT r2 #1a).
        # Each plane extract is a VMEM-local lane select instead.
        def r(c):
            return in_ref[:, :, c]

    bc0 = r(0) * sx + r(1) * sy + r(2)
    bc1 = r(3) * sx + r(4) * sy + r(5)
    bc2 = r(6) * sx + r(7) * sy + r(8)
    w0 = bc0 * r(9)
    w1 = bc1 * r(10)
    w2 = bc2 * r(11)
    inv_den = 1.0 / jnp.maximum(w0 + w1 + w2, 1e-12)
    w0 = w0 * inv_den
    w1 = w1 * inv_den
    w2 = w2 * inv_den

    # wp lanes 12:21 (corner-major 3x3), nw 21:30.
    px = w0 * r(12) + w1 * r(15) + w2 * r(18)
    py = w0 * r(13) + w1 * r(16) + w2 * r(19)
    pz = w0 * r(14) + w1 * r(17) + w2 * r(20)
    nx0 = w0 * r(21) + w1 * r(24) + w2 * r(27)
    ny0 = w0 * r(22) + w1 * r(25) + w2 * r(28)
    nz0 = w0 * r(23) + w1 * r(26) + w2 * r(29)
    nl = jax.lax.rsqrt(jnp.maximum(nx0 * nx0 + ny0 * ny0 + nz0 * nz0, 1e-24))
    nx, ny, nz = nx0 * nl, ny0 * nl, nz0 * nl

    # Materials: lanes 40:56 = pack_material_records layout.
    ar = jnp.maximum(r(40), 0.0) * r(58)
    ag = jnp.maximum(r(41), 0.0) * r(59)
    ab = jnp.maximum(r(42), 0.0) * r(60)
    metal = jnp.clip(r(43), 0.0, 1.0)
    rough = r(44)
    ao = jnp.clip(r(45), 0.0, 1.0)
    emr, emg, emb = r(46), r(47), r(48)

    sun_vis = r(56)
    covered = r(57) > 0.0

    cx, cy, cz = z_ref[0, 0], z_ref[0, 1], z_ref[0, 2]
    sdx, sdy, sdz = z_ref[0, 3], z_ref[0, 4], z_ref[0, 5]
    srr, srg, srb = z_ref[0, 6], z_ref[0, 7], z_ref[0, 8]
    bgr, bgg, bgb = z_ref[0, 9], z_ref[0, 10], z_ref[0, 11]
    amb_on = z_ref[0, 12]

    vx = cx - px
    vy = cy - py
    vz = cz - pz
    vl = jax.lax.rsqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-16))
    vx, vy, vz = vx * vl, vy * vl, vz * vl

    # --- sun term (shade_kernel semantics) --------------------------------
    lx, ly, lz = -sdx, -sdy, -sdz
    hx, hy, hz = lx + vx, ly + vy, lz + vz
    hl = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-16))
    hx, hy, hz = hx * hl, hy * hl, hz * hl
    ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)

    if sun_model == "blinn_phong":
        rough_c = jnp.clip(rough, 0.0, 1.0)
        spec_pow = jnp.maximum(4.0, 8.0 + (1.0 - rough_c) * 120.0)
        spec_norm = (spec_pow + 2.0) / (2.0 * _PI)
        spec_f0 = 0.04 + 0.96 * metal
        spec = jnp.power(jnp.maximum(ndh, 1e-9), spec_pow) * spec_norm \
            * spec_f0 * ndl
        kd = 1.0 - metal
        base = kd * (ndl / _PI)
        dr = (base * ar + spec) * srr
        dg = (base * ag + spec) * srg
        db_ = (base * ab + spec) * srb
    else:  # pbr_mr
        rough_c = jnp.clip(rough, 0.04, 1.0)
        f0r = 0.04 + (ar - 0.04) * metal
        f0g = 0.04 + (ag - 0.04) * metal
        f0b = 0.04 + (ab - 0.04) * metal
        a = rough_c * rough_c
        a2 = a * a
        dden = ndh * ndh * (a2 - 1.0) + 1.0
        d = a2 / (_PI * dden * dden + 1e-7)
        k = (a + 1.0) * (a + 1.0) * 0.125
        g1v = ndv / (ndv * (1.0 - k) + k + 1e-7)
        g1l = ndl / (ndl * (1.0 - k) + k + 1e-7)
        g = g1v * g1l
        vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
        fres = jnp.power(1.0 - vdh, 5.0)
        fr = f0r + (1.0 - f0r) * fres
        fg = f0g + (1.0 - f0g) * fres
        fb = f0b + (1.0 - f0b) * fres
        denom_s = jnp.maximum(4.0 * ndl * ndv, 1e-6)
        sr_ = d * g * fr / denom_s
        sg_ = d * g * fg / denom_s
        sb_ = d * g * fb / denom_s
        inv_pi = 1.0 / _PI
        kdr = (1.0 - fr) * (1.0 - metal)
        kdg = (1.0 - fg) * (1.0 - metal)
        kdb = (1.0 - fb) * (1.0 - metal)
        lit = ((ndl > 0.0) & (ndv > 0.0)).astype(jnp.float32)
        dr = (kdr * ar * inv_pi + sr_) * srr * ndl * lit
        dg = (kdg * ag * inv_pi + sg_) * srg * ndl * lit
        db_ = (kdb * ab * inv_pi + sb_) * srb * ndl * lit

    dr = dr * sun_vis
    dg = dg * sun_vis
    db_ = db_ * sun_vis

    # --- local lights (identical walk to _shade_kernel) -------------------
    shape = px.shape
    zero = jnp.zeros(shape, jnp.float32)

    def chunk_body(ci, carry):
        ldr_, ldg, ldb, lsr, lsg, lsb = carry
        base = pl.multiple_of(ci * chunk, chunk)
        blk = lrec_ref[0, pl.ds(base, chunk), :]

        def f(j):
            return blk[:, j].reshape(chunk, 1, 1)

        ltype = f(0)
        posx, posy, posz = f(1), f(2), f(3)

        def unit3(a_, b_, c_):
            il = jax.lax.rsqrt(jnp.maximum(a_ * a_ + b_ * b_ + c_ * c_, 1e-16))
            return a_ * il, b_ * il, c_ * il

        if has_spot or has_rect:
            fwdx, fwdy, fwdz = unit3(f(4), f(5), f(6))
        if has_rect:
            upx, upy, upz = unit3(f(7), f(8), f(9))
        if has_tube:
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

        is_spot = ltype == float(LIGHT_SPOT)
        is_rect = ltype == float(LIGHT_RECT_AREA)
        is_tube = ltype == float(LIGHT_TUBE_AREA)

        if has_rect or has_tube:
            dxp = px[None] - posx
            dyp = py[None] - posy
            dzp = pz[None] - posz
        emx, emy, emz = posx, posy, posz
        if has_rect:
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
            ux = jnp.clip(dxp * rx + dyp * ry + dzp * rz, -hex_, hex_)
            uy = jnp.clip(dxp * u2x + dyp * u2y + dzp * u2z, -hey, hey)
            rectx = posx + rx * ux + u2x * uy
            recty = posy + ry * ux + u2y * uy
            rectz = posz + rz * ux + u2z * uy
            emx = jnp.where(is_rect, rectx, emx)
            emy = jnp.where(is_rect, recty, emy)
            emz = jnp.where(is_rect, rectz, emz)

        if has_tube:
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
            emx = jnp.where(is_tube, tubex, emx)
            emy = jnp.where(is_tube, tubey, emy)
            emz = jnp.where(is_tube, tubez, emz)

        tlx = emx - px[None]
        tly = emy - py[None]
        tlz = emz - pz[None]
        dist = jnp.sqrt(jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-16))
        inv_d = 1.0 / dist
        llx, lly, llz = tlx * inv_d, tly * inv_d, tlz * inv_d

        shaping = 1.0
        if has_spot:
            cos_t = -(llx * fwdx + lly * fwdy + llz * fwdz)
            cin = jnp.cos(inner)
            cout = jnp.cos(outer)
            tt = jnp.clip((cos_t - cout) / jnp.maximum(cin - cout, 1e-5),
                          0.0, 1.0)
            spot_shape = jnp.where(cos_t > cout,
                                   tt * tt * (3.0 - 2.0 * tt), 0.0)
            shaping = jnp.where(is_spot, spot_shape, shaping)
        if has_rect:
            facing = jnp.maximum(-(fwdx * llx + fwdy * lly + fwdz * llz),
                                 0.0)
            rect_shape = jnp.where(facing > 0.0, 0.65 + 0.55 * facing, 0.0)
            shaping = jnp.where(is_rect, rect_shape, shaping)
        if has_tube:
            soft = jnp.clip(1.0 - dist / rng, 0.0, 1.0)
            tube_shape = 0.75 + 0.35 * soft
            shaping = jnp.where(is_tube, tube_shape, shaping)
        spec_pw = jnp.where(is_spot, 34.0, 36.0) if has_spot else 36.0
        spec_sc = jnp.where(is_spot, 0.32, 0.30) if has_spot else 0.30
        if has_rect:
            spec_pw = jnp.where(is_rect, 26.0, spec_pw)
            spec_sc = jnp.where(is_rect, 0.26, spec_sc)
        if has_tube:
            spec_pw = jnp.where(is_tube, 22.0, spec_pw)
            spec_sc = jnp.where(is_tube, 0.20, spec_sc)

        norm = jnp.clip(1.0 - dist / rng, 0.0, 1.0)
        smooth = norm * norm * (3.0 - 2.0 * norm)
        invsq = jnp.minimum(1.0, (rng * rng) / jnp.maximum(dist * dist, abias)) \
            * norm * norm
        fall = jnp.where(amodel == 0.0, norm,
                         jnp.where(amodel == 1.0, smooth, invsq))
        fall = jnp.power(jnp.maximum(fall, 1e-9), apow)
        fall = jnp.where((acut > 0.0) & (fall < acut), 0.0, fall)
        atten = jnp.where(dist < rng, fall, 0.0) * jnp.maximum(shaping, 0.0)

        lndl = jnp.maximum(nx[None] * llx + ny[None] * lly + nz[None] * llz, 0.0)
        live = (dist > 1e-4) & (lndl > 0.0) & (atten > 0.0) & covered[None]
        gain = jnp.where(live, intensity * atten, 0.0)
        if n_vis:
            # Local shadow maps (same one-hot plane select as
            # _shade_kernel; record lane 28 = the light's plane index,
            # plane n_vis-1 constant 1.0 for unshadowed lights).
            sidx = f(28)
            lvis = zero[None]
            for k in range(n_vis):
                lvis = lvis + jnp.where(sidx == float(k), vis_ref[k], 0.0)
            gain = gain * lvis

        hxl = llx + vx[None]
        hyl = lly + vy[None]
        hzl = llz + vz[None]
        hll = jax.lax.rsqrt(jnp.maximum(hxl * hxl + hyl * hyl + hzl * hzl, 1e-16))
        lndh = jnp.maximum(nx[None] * (hxl * hll) + ny[None] * (hyl * hll)
                           + nz[None] * (hzl * hll), 0.0)
        spec = spec_sc * jnp.power(jnp.maximum(lndh, 1e-9), spec_pw)

        wd = gain * lndl
        ws = gain * spec
        ldr_ = ldr_ + _sum0(jnp.maximum(colr, 0.0) * wd)
        ldg = ldg + _sum0(jnp.maximum(colg, 0.0) * wd)
        ldb = ldb + _sum0(jnp.maximum(colb, 0.0) * wd)
        lsr = lsr + _sum0(jnp.maximum(colr, 0.0) * ws)
        lsg = lsg + _sum0(jnp.maximum(colg, 0.0) * ws)
        lsb = lsb + _sum0(jnp.maximum(colb, 0.0) * ws)
        return ldr_, ldg, ldb, lsr, lsg, lsb

    cap = lrec_ref.shape[1]
    n_chunks = jnp.minimum(pl.cdiv(count, chunk), cap // chunk)
    ld_r, ld_g, ld_b, ls_r, ls_g, ls_b = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (zero, zero, zero, zero, zero, zero)
    )

    # --- fake-IBL ambient (eval_fake_ibl, shading/common.py) --------------
    ndv_c = nx * vx + ny * vy + nz * vz
    rvx = 2.0 * ndv_c * nx - vx
    rvy = 2.0 * ndv_c * ny - vy
    rvz = 2.0 * ndv_c * nz - vz
    up_n = jnp.clip(ny * 0.5 + 0.5, 0.0, 1.0)
    up_r = jnp.clip(rvy * 0.5 + 0.5, 0.0, 1.0)

    def env(up, c_g, c_h, c_z):
        return c_g + ((c_h + (c_z - c_h) * up) - c_g) * up

    # sky_zenith / sky_horizon / ground constants (common.py:168-170).
    env_n_r = env(up_n, 0.16, 0.62, 0.32)
    env_n_g = env(up_n, 0.15, 0.66, 0.46)
    env_n_b = env(up_n, 0.14, 0.72, 0.72)
    env_r_r = env(up_r, 0.16, 0.62, 0.32)
    env_r_g = env(up_r, 0.15, 0.66, 0.46)
    env_r_b = env(up_r, 0.14, 0.72, 0.72)

    m = metal
    rgh = jnp.clip(rough, 0.0, 1.0)
    fres_a = jnp.power(1.0 - jnp.maximum(ndv_c, 0.0), 5.0)
    f0ar = 0.04 + (jnp.maximum(ar, 0.0) - 0.04) * m
    f0ag = 0.04 + (jnp.maximum(ag, 0.0) - 0.04) * m
    f0ab = 0.04 + (jnp.maximum(ab, 0.0) - 0.04) * m
    far_ = f0ar + (1.0 - f0ar) * fres_a
    fag = f0ag + (1.0 - f0ag) * fres_a
    fab = f0ab + (1.0 - f0ab) * fres_a
    spec_str = 0.02 + (1.0 - rgh) * 0.18
    amb_r = ((1.0 - far_) * (1.0 - m) * ar * env_n_r * 0.12
             + env_r_r * far_ * spec_str) * ao
    amb_g = ((1.0 - fag) * (1.0 - m) * ag * env_n_g * 0.12
             + env_r_g * fag * spec_str) * ao
    amb_b = ((1.0 - fab) * (1.0 - m) * ab * env_n_b * 0.12
             + env_r_b * fab * spec_str) * ao

    covf = covered.astype(jnp.float32)
    outr = (dr + ar * ld_r + ls_r + (amb_r * amb_on + emr)) * covf \
        + bgr * (1.0 - covf)
    outg = (dg + ag * ld_g + ls_g + (amb_g * amb_on + emg)) * covf \
        + bgg * (1.0 - covf)
    outb = (db_ + ab * ld_b + ls_b + (amb_b * amb_on + emb)) * covf \
        + bgb * (1.0 - covf)
    out_ref[0] = outr
    out_ref[1] = outg
    out_ref[2] = outb
    for i in range(3, 8):
        out_ref[i] = zero


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "cap", "chunk",
                     "sun_model", "interpret", "rec_layout", "light_kinds"),
)
def resolve_fused_pallas(
    rec,                 # (H, W, 56) gathered interp records (with materials)
    sun_vis,             # (H, W)
    covered,             # (H, W) bool
    tex_albedo,          # (H, W, 3) multiplier (ones where untextured)
    camera_pos, sun_dir_ws, sun_radiance, background,
    lights, view, proj,
    width: int, height: int,
    tile_h: int = 64, tile_w: int = 128,
    cap: int = 256, chunk: int = 16,
    tile_depth_range=None,
    sun_model: str = "pbr_mr",
    interpret: bool | None = None,
    rec_layout: str = "planes",
    local_vis_planes=None,
    light_shadow_index=None,
    light_kinds: tuple | None = None,
):
    """Fused interp+shade resolve.  Returns ((H, W, 3) hdr, bin_stats).

    rec_layout: "planes" feeds the kernel (64, H, W) plane-major blocks
    (costs one XLA transpose of the ~500MB record stack per frame);
    "lanes" feeds pixel-major (th, tw, 64) blocks and extracts planes
    in-kernel (no transpose; lane selects instead) — same math, A/B'd on
    hardware.

    local_vis_planes: optional (K+1, H, W) PLANE-MAJOR local-shadow
    visibility (lighting/local_shadows.local_shadow_vis_planes; plane K
    must be constant 1.0); light_shadow_index: (L,) i32 plane per light —
    wires local shadow maps into the fused light loop."""
    if interpret is None:
        interpret = default_interpret()
    tiles_x = _cdiv(width, tile_w)
    tiles_y = _cdiv(height, tile_h)
    ph, pw = tiles_y * tile_h, tiles_x * tile_w

    lists, counts, bin_stats = cull_lights_tiled(
        lights, view, proj, width, height,
        tile_size=tile_w, tile_h=tile_h, cap=cap,
        tile_depth_range=tile_depth_range,
    )
    packed = pack_light_records(lights)
    if light_shadow_index is not None:
        packed = packed.at[:, 28].set(light_shadow_index.astype(jnp.float32))
    from lsr_tpu.core.gather import take_rows

    tile_rec = take_rows(packed, jnp.maximum(lists, 0))
    tile_rec = jnp.where((lists >= 0)[..., None], tile_rec, 0.0)

    def padp(x):
        return jnp.pad(
            x, ((0, ph - height), (0, pw - width)) + ((0, 0),) * (x.ndim - 2)
        )

    planes = jnp.concatenate([
        padp(rec),
        padp(sun_vis)[..., None],
        padp(covered.astype(jnp.float32))[..., None],
        padp(tex_albedo),
        jnp.zeros((ph, pw, 3), jnp.float32),
    ], axis=-1)                                   # (ph, pw, 64)
    if rec_layout == "planes":
        planes = jnp.transpose(planes, (2, 0, 1))  # (64, ph, pw)

    sd = sun_dir_ws / jnp.maximum(jnp.linalg.norm(sun_dir_ws), 1e-8)
    zparams = jnp.zeros((1, 128), jnp.float32)
    zparams = zparams.at[0, :3].set(camera_pos.astype(jnp.float32))
    zparams = zparams.at[0, 3:6].set(sd.astype(jnp.float32))
    zparams = zparams.at[0, 6:9].set(sun_radiance.astype(jnp.float32))
    zparams = zparams.at[0, 9:12].set(
        jnp.asarray(background, jnp.float32))
    zparams = zparams.at[0, 12].set(1.0)

    n_vis = 0
    vis_in = ()
    if local_vis_planes is not None:
        n_vis = int(local_vis_planes.shape[0])
        vis_pad = jnp.pad(local_vis_planes,
                          ((0, 0), (0, ph - height), (0, pw - width)),
                          constant_values=1.0)
        vis_in = (vis_pad,)

    kern = functools.partial(
        _resolve_kernel, chunk=chunk, tiles_x=tiles_x, sun_model=sun_model,
        tile_h=tile_h, tile_w=tile_w, rec_layout=rec_layout, n_vis=n_vis,
        light_kinds=light_kinds)
    rec_spec = (
        pl.BlockSpec((64, tile_h, tile_w), lambda i, j, c: (0, i, j),
                     memory_space=pltpu.VMEM)
        if rec_layout == "planes"
        else pl.BlockSpec((tile_h, tile_w, 64), lambda i, j, c: (i, j, 0),
                          memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, 128), lambda i, j, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cap, 32), lambda i, j, c: (i * tiles_x + j, 0, 0),
                     memory_space=pltpu.VMEM),
        rec_spec,
    ]
    if n_vis:
        in_specs.append(
            pl.BlockSpec((n_vis, tile_h, tile_w), lambda i, j, c: (0, i, j),
                         memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles_y, tiles_x),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile_h, tile_w), lambda i, j, c: (0, i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, ph, pw), jnp.float32),
        interpret=interpret,
    )(counts, zparams, tile_rec, planes, *vis_in)

    hdr = jnp.moveaxis(out[0:3, :height, :width], 0, -1)
    return hdr, bin_stats
