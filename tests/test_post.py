"""Post-process pass behaviors (motion blur, shafts, DoF, FXAA, TAA, etc.)."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.passes.post import (
    bloom_pass,
    depth_of_field_pass,
    fog_pass,
    fxaa_pass,
    gaussian_blur,
    light_shafts_pass,
    motion_blur_pass,
    motion_vectors_pass,
    outline_pass,
    taa_pass,
)


def _edge_image(h=48, w=64):
    img = np.zeros((h, w, 3), np.uint8)
    img[:, w // 2:] = 255
    return jnp.asarray(img)


def test_motion_blur_smears_along_velocity():
    img = _edge_image()
    h, w = img.shape[:2]
    depth = jnp.full((h, w), 0.5, jnp.float32)
    vel = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].set(10.0)
    out = np.asarray(motion_blur_pass(img, depth, vel, jnp.float32(1 / 60)))
    edge = w // 2
    # The hard edge becomes a ramp: pixels just left of it brighten.
    assert out[10, edge - 2, 0] > 0
    assert 0 < out[10, edge - 2, 0] < 255
    # Zero velocity -> passthrough (min_velocity gate).
    out2 = np.asarray(motion_blur_pass(
        img, depth, jnp.zeros((h, w, 2), jnp.float32), jnp.float32(1 / 60)))
    np.testing.assert_array_equal(out2, np.asarray(img))


def test_motion_blur_depth_rejection():
    img = _edge_image()
    h, w = img.shape[:2]
    # Right half much nearer: blur at the boundary must not bleed across.
    depth = jnp.where(
        jnp.arange(w)[None, :] >= w // 2,
        jnp.full((h, w), 0.1, jnp.float32),
        jnp.full((h, w), 0.9, jnp.float32),
    )
    vel = jnp.zeros((h, w, 2), jnp.float32).at[..., 0].set(10.0)
    out = np.asarray(motion_blur_pass(img, depth, vel, jnp.float32(1 / 60),
                                      depth_reject=0.05))
    assert out[10, w // 2 - 2, 0] == 0  # far-side pixel samples only far side


def test_light_shafts_brighten_toward_sun():
    h, w = 64, 64
    img = jnp.full((h, w, 3), 120, jnp.uint8)
    depth = jnp.ones((h, w), jnp.float32)  # sky everywhere
    cam_pos = jnp.zeros(3, jnp.float32)
    sun_dir = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)  # sun at +Z ahead? no:
    # dir FROM sun TO scene = -Z means sun is at +Z... camera looks +Z below.
    vp, zn, zf = _simple_vp(w, h)
    out = np.asarray(light_shafts_pass(img, depth, cam_pos, sun_dir, vp))
    assert out[..., 0].max() > 120  # brightened somewhere
    # Sun behind camera -> passthrough.
    out2 = np.asarray(light_shafts_pass(
        img, depth, cam_pos, jnp.asarray([0.0, 0.0, 1.0], jnp.float32), vp))
    np.testing.assert_array_equal(out2, np.asarray(img))


def _simple_vp(w, h):
    view = m3.look_at_lh(jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]),
                         jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective_lh_no(np.pi / 3, w / h, 0.1, 100.0)
    return proj @ view, 0.1, 100.0


def test_dof_autofocus_keeps_center_sharp():
    h, w = 64, 64
    hdr = jnp.zeros((h, w, 3), jnp.float32)
    hdr = hdr.at[h // 2, w // 2].set(jnp.asarray([5.0, 5.0, 5.0]))
    hdr = hdr.at[4, 4].set(jnp.asarray([5.0, 5.0, 5.0]))
    depth = jnp.full((h, w), 0.3, jnp.float32)
    depth = depth.at[:8, :8].set(0.9)  # corner far away
    out = np.asarray(depth_of_field_pass(hdr, depth, focus_range=0.1))
    # Center (at focus depth) stays sharp; far corner blurs.
    assert out[h // 2, w // 2, 0] > 4.0
    assert out[4, 4, 0] < 4.0


def test_fog_and_outline_and_bloom():
    h, w = 32, 32
    hdr = jnp.zeros((h, w, 3), jnp.float32)
    depth = jnp.linspace(0, 1, w)[None, :].repeat(h, 0)
    fogged = np.asarray(fog_pass(hdr, depth, fog_color=(1, 1, 1)))
    assert fogged[0, -1, 0] > fogged[0, 0, 0]  # far is foggier

    d2 = jnp.where(jnp.arange(w)[None, :] > 16, 0.8, 0.2).astype(jnp.float32)
    d2 = jnp.broadcast_to(d2, (h, w))
    outlined = np.asarray(outline_pass(jnp.ones((h, w, 3)), d2))
    assert outlined[5, 17].sum() == 0.0  # edge painted black
    assert outlined[5, 5].sum() == 3.0

    hdr2 = jnp.zeros((h, w, 3), jnp.float32).at[16, 16].set(
        jnp.asarray([10.0, 10.0, 10.0]))
    bloomed = np.asarray(bloom_pass(hdr2, threshold=1.0, intensity=1.0))
    assert bloomed[16, 18, 0] > 0.0  # glow spread


def test_fxaa_softens_diagonal():
    h, w = 32, 32
    img = np.zeros((h, w, 3), np.uint8)
    for i in range(min(h, w)):
        img[i, :i] = 255
    out = np.asarray(fxaa_pass(jnp.asarray(img)))
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() > 0           # something changed on the diagonal
    assert np.array_equal(out[0, w - 1], img[0, w - 1])  # flat area untouched


def test_taa_converges_and_clamps():
    h, w = 16, 16
    cur = jnp.full((h, w, 3), 1.0, jnp.float32)
    hist = jnp.zeros((h, w, 3), jnp.float32)
    vel = jnp.zeros((h, w, 2), jnp.float32)
    out, new_hist = taa_pass(cur, hist, vel, blend=0.5)
    a = np.asarray(out)
    # Neighborhood clamp pulls stale history toward current before blending.
    assert np.all(a >= 0.99)
    out2, _ = taa_pass(cur, new_hist, vel, blend=0.5)
    assert np.asarray(out2).mean() >= a.mean()


def test_motion_vectors_from_object_motion():
    from lsr_tpu.io.obj import make_cube
    from lsr_tpu.raster.brute import rasterize_brute
    from lsr_tpu.raster.interp import interpolate_gbuffer
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.scene.scene import SceneBuilder, make_camera
    import dataclasses

    w, h = 64, 64
    prev_model = np.asarray(m3.translate([-0.5, 0.0, 0.0]))
    cur_model = np.asarray(m3.translate([0.5, 0.0, 0.0]))
    b = SceneBuilder()
    b.add(make_cube(1.0), cur_model, prev_model=prev_model)
    geom, objects = b.build()
    cam = make_camera(w, h, (0, 0, -4.0), (0, 0, 0))
    setup = scene_setup(geom.positions, geom.normals, geom.uvs, geom.indices,
                        geom.vtx_obj, geom.tri_obj, objects.model,
                        objects.normal_mat, cam.viewproj, w, h)
    depth, tid = rasterize_brute(setup, w, h, cam.zn, cam.zf)
    gb = interpolate_gbuffer(setup, depth, tid)
    vel = np.asarray(motion_vectors_pass(gb, objects, cam.viewproj,
                                         cam.viewproj, w, h))
    cov = np.asarray(gb.covered)
    assert vel[cov][:, 0].mean() > 1.0   # moved right -> positive x velocity
    assert np.abs(vel[~cov]).max() == 0.0  # background has no velocity


def test_lens_flare_adds_ghosts():
    from lsr_tpu.passes.post import lens_flare_pass

    h, w = 64, 64
    hdr = jnp.zeros((h, w, 3), jnp.float32).at[20, 20].set(
        jnp.asarray([30.0, 30.0, 30.0]))
    out = np.asarray(lens_flare_pass(hdr, threshold=2.0))
    base = np.asarray(hdr)
    added = (out - base).sum(-1)
    assert added.max() > 0.01          # flare energy added
    # Ghost energy appears on the far side of the center from the source.
    assert added[40:, 40:].sum() > 0.0
    # No flare without bright pixels.
    out2 = np.asarray(lens_flare_pass(jnp.full((h, w, 3), 0.5), threshold=2.0))
    np.testing.assert_allclose(out2, 0.5, atol=1e-6)
