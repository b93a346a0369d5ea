"""Fused resolve kernel (interp+shade in one Pallas pass) vs classic path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.core.frame import ShadowPassParams
from lsr_tpu.io.obj import load_obj, make_plane
from lsr_tpu.lighting.light_types import LightSetBuilder
from lsr_tpu.passes.forward_plus import (
    resolve_forward_plus,
    shade_forward_plus,
)
from lsr_tpu.passes.shadow import make_sun_shadow
from lsr_tpu.raster.interp import (
    interpolate_gbuffer,
    reconstruct_world_pos,
)
from lsr_tpu.raster.setup import scene_setup
from lsr_tpu.raster.tiled import rasterize_direct
from lsr_tpu.scene.scene import SceneBuilder, make_camera
from lsr_tpu.shading.common import checkerboard_texture, make_materials
from lsr_tpu.shading.models import make_shade_context

MONKEY = "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"
SUN = (0.35, -0.7, 0.5)


def _scene(w, h):
    sb = SceneBuilder()
    sb.add(load_obj(MONKEY), np.asarray(m3.translate([0, 0.2, 0])))
    sb.add(make_plane(6.0, y=-1.0), material=1, casts_shadow=False)
    geom, objects = sb.build()
    cam = make_camera(w, h, (0.5, 1.5, -4.0), (0, 0, 0))
    mats = make_materials(base_color=[(0.8, 0.5, 0.3), (0.5, 0.55, 0.6)],
                          roughness=[0.4, 0.8], metallic=[0.1, 0.0],
                          tex_id=[-1, 0])
    ctx = make_shade_context(
        mats, light_dir_ws=SUN, camera_pos=(0.5, 1.5, -4.0),
        light_intensity=2.0,
        textures=jnp.asarray(checkerboard_texture(64))[None])
    sh = make_sun_shadow(geom, objects, jnp.asarray(SUN, jnp.float32),
                         ShadowPassParams(map_size=512, pcf_radius=2))
    ctx = dataclasses.replace(ctx, shadow=sh)
    lb = LightSetBuilder()
    rng = np.random.default_rng(1)
    for i in range(24):
        p = tuple(rng.uniform([-3, 0.2, -3], [3, 2, 3]).tolist())
        if i % 4 == 0:
            lb.spot(p, (0, -1, 0), range=3.0, outer_angle=0.6, intensity=2.0)
        else:
            lb.point(p, range=2.5, intensity=1.5)
    return geom, objects, cam, ctx, lb.build()


def test_reconstructed_world_pos_matches_interp():
    w, h = 160, 120
    geom, objects, cam, ctx, lights = _scene(w, h)
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    gb = interpolate_gbuffer(setup, depth, tid)
    wp_r = reconstruct_world_pos(depth, cam.view, cam.proj, cam.zn, cam.zf,
                                 w, h)
    cov = np.asarray(gb.covered)
    err = np.abs(np.asarray(wp_r) - np.asarray(gb.world_pos))[cov]
    assert err.max() < 5e-2 and err.mean() < 1e-3


def test_resolve_matches_classic_path():
    """The fused resolve kernel must reproduce the classic interp->shade
    composition (tolerance: fp reassociation only)."""
    w, h = 256, 192
    geom, objects, cam, ctx, lights = _scene(w, h)
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)

    gb = interpolate_gbuffer(setup, depth, tid, materials=ctx.materials)
    hdr_a, stats_a = shade_forward_plus(
        gb, ctx, lights, cam.view, cam.proj, cam.zn, cam.zf, w, h,
        tile_size=16, cap=64, mode="tiled", sun_model="pbr_mr")
    hdr_b, stats_b = resolve_forward_plus(
        setup, depth, tid, ctx, lights, cam.view, cam.proj, cam.zn, cam.zf,
        w, h, cap=64, sun_model="pbr_mr")
    a = np.asarray(jax.block_until_ready(hdr_a))
    b = np.asarray(jax.block_until_ready(hdr_b))
    d = np.abs(a - b)
    assert d.mean() < 5e-3
    assert (d.max(-1) > 0.05).mean() < 0.01
    assert int(stats_b["max_lights_per_bin"]) >= 1


def test_resolve_lanes_layout_matches_planes():
    """rec_layout="lanes" (pixel-major blocks, in-kernel plane extracts, no
    XLA transpose) must reproduce the planes-major path bit-exactly — the
    kernel math is identical, only the VMEM feed differs."""
    w, h = 256, 192
    geom, objects, cam, ctx, lights = _scene(w, h)
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    outs = {}
    for layout in ("planes", "lanes"):
        hdr, _ = resolve_forward_plus(
            setup, depth, tid, ctx, lights, cam.view, cam.proj, cam.zn,
            cam.zf, w, h, cap=64, sun_model="pbr_mr", rec_layout=layout)
        outs[layout] = np.asarray(jax.block_until_ready(hdr))
    np.testing.assert_array_equal(outs["planes"], outs["lanes"])


def test_resolve_with_local_shadows_matches_classic():
    """Local shadow maps through the fused resolve kernel: compare vs the
    classic interp->shade path with local_shadows.  Positions/normals feed
    the vis planes from reconstruction/corner-0 (the resolve path's
    documented approximation class), so tolerance matches the sun case."""
    from lsr_tpu.lighting.local_shadows import (
        plan_shadow_casters, render_local_shadow_maps)

    w, h = 256, 192
    geom, objects, cam, ctx, lights = _scene(w, h)
    spot_ids, point_ids = plan_shadow_casters(lights, max_spot=2,
                                              max_point=1)
    sh = render_local_shadow_maps(
        geom, objects, lights, spot_ids, point_ids,
        map_size=128, point_size=64, pcf_radius=1)
    assert sh.n_shadowed >= 2

    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)

    gb = interpolate_gbuffer(setup, depth, tid, materials=ctx.materials)
    hdr_a, _ = shade_forward_plus(
        gb, ctx, lights, cam.view, cam.proj, cam.zn, cam.zf, w, h,
        tile_size=16, cap=64, mode="tiled", sun_model="pbr_mr",
        local_shadows=sh)
    outs = {}
    for layout in ("planes", "lanes"):
        hdr_b, _ = resolve_forward_plus(
            setup, depth, tid, ctx, lights, cam.view, cam.proj, cam.zn,
            cam.zf, w, h, cap=64, sun_model="pbr_mr", local_shadows=sh,
            rec_layout=layout)
        outs[layout] = np.asarray(jax.block_until_ready(hdr_b))
    np.testing.assert_array_equal(outs["planes"], outs["lanes"])

    a = np.asarray(jax.block_until_ready(hdr_a))
    b = outs["planes"]
    d = np.abs(a - b)
    assert d.mean() < 5e-3
    assert (d.max(-1) > 0.05).mean() < 0.01

    # The local shadows must actually darken the fused output somewhere:
    # re-run the resolve WITHOUT local shadows and require a difference.
    hdr_ns, _ = resolve_forward_plus(
        setup, depth, tid, ctx, lights, cam.view, cam.proj, cam.zn,
        cam.zf, w, h, cap=64, sun_model="pbr_mr")
    diff = (np.asarray(jax.block_until_ready(hdr_ns)) - b).sum(-1)
    assert (diff > 0.01).sum() > 20


def test_resolve_kernel_light_kinds_specialization():
    """The resolve kernel's static light-type specialization (ADVICE r4:
    it duplicates the shade-kernel logic) must be BIT-exact on a mixed
    rect/tube/spot/point scene: light_kinds=None == light_kinds=full set."""
    from lsr_tpu.core.gather import take_rows
    from lsr_tpu.lighting.resolve_kernel import resolve_fused_pallas
    from lsr_tpu.raster.interp import pack_interp_records

    w, h = 160, 128
    geom, objects, cam, ctx, _ = _scene(w, h)
    rng = np.random.default_rng(7)
    lb = LightSetBuilder()
    for i in range(12):
        p = tuple(rng.uniform([-3, 0.2, -3], [3, 2, 3]).tolist())
        c = tuple(rng.uniform(0.3, 1.0, 3).tolist())
        if i % 4 == 0:
            lb.rect_area(p, (0, -1, 0), color=c, intensity=1.5, range=4.0)
        elif i % 4 == 1:
            lb.tube_area(p, axis=(1, 0, 0), color=c, intensity=1.5,
                         range=4.0)
        elif i % 4 == 2:
            lb.spot(p, (0, -1, 0), color=c, intensity=2.0, range=4.0)
        else:
            lb.point(p, color=c, intensity=1.5, range=3.0)
    lights = lb.build()
    kinds = tuple(sorted(int(t) for t in
                         np.unique(np.asarray(lights.type))))

    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, w, h)
    depth, tid, _ = rasterize_direct(setup, w, h, cam.zn, cam.zf)
    covered = tid >= 0
    rec = take_rows(pack_interp_records(setup, ctx.materials),
                    jnp.where(covered, tid, 0))
    tex_albedo = jnp.ones(depth.shape + (3,), jnp.float32)
    sun_vis = jnp.ones_like(depth)

    def run(lk):
        hdr, _ = resolve_fused_pallas(
            rec, sun_vis, covered, tex_albedo,
            ctx.camera_pos, ctx.light_dir_ws,
            ctx.light_color * ctx.light_intensity,
            jnp.asarray((0.04, 0.06, 0.1), jnp.float32),
            lights, cam.view, cam.proj, w, h,
            tile_h=64, tile_w=128, cap=64, chunk=8, light_kinds=lk)
        return np.asarray(jax.block_until_ready(hdr))

    a = run(None)
    b = run(kinds)
    assert (a == b).all(), np.abs(a - b).max()
