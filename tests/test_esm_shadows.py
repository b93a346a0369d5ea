"""ESM (exponential shadow map) prefiltered filtering.

The round-4 gather-floor redesign (VERDICT r3 item 1): the (2r+1)^2 PCF
window gather is replaced by a box prefilter over exp(c*z) baked into the
map (shadow_sample.prefilter_esm), so sampling is ONE 1-lane fetch per
(pixel, light).  Exact PCF stays the default/parity path; ESM is the
flagged performance variant (PARITY.md deviation class).  Reference filter
semantics source: shadow_sample.hpp:65, fp_stress_scene.frag:355-414.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.io.obj import make_cube, make_plane
from lsr_tpu.lighting.light_types import LightSetBuilder
from lsr_tpu.lighting.local_shadows import (
    local_shadow_vis_stack,
    render_local_shadow_maps,
)
from lsr_tpu.lighting.shadow_sample import (
    esm_visibility,
    fetch_soft,
    make_shadow_context,
    pack_soft_u16,
    prefilter_esm,
    shadow_visibility_dir,
)
from lsr_tpu.scene.scene import SceneBuilder


def _lme_oracle(depth, radius, c):
    """Numpy log-mean-exp box filter with edge clamping (the PCF window)."""
    d = np.asarray(depth, np.float64)
    p = np.pad(d, radius, mode="edge")
    k = 2 * radius + 1
    h, w = d.shape
    acc = np.zeros((h, w), np.float64)
    for dy in range(k):
        for dx in range(k):
            acc += np.exp((p[dy:dy + h, dx:dx + w] - 1.0) * c)
    return np.log(acc / (k * k)) / c + 1.0


def test_prefilter_matches_log_mean_exp_oracle():
    rng = np.random.default_rng(7)
    d = rng.uniform(0.0, 1.0, (16, 16)).astype(np.float32)
    for r in (1, 2):
        soft = np.asarray(prefilter_esm(jnp.asarray(d), r, 60.0))
        ref = _lme_oracle(d, r, 60.0)
        assert np.allclose(soft, ref, atol=2e-4), (
            f"r={r} max err {np.abs(soft - ref).max()}")
        # log-mean-exp lies within the window's [min, max].
        assert soft.min() >= d.min() - 1e-4
        assert soft.max() <= d.max() + 1e-4


def test_pack_fetch_roundtrip():
    rng = np.random.default_rng(3)
    soft = rng.uniform(0, 1, (8, 8)).astype(np.float32)
    packed = pack_soft_u16(jnp.asarray(soft))
    idx = jnp.arange(64, dtype=jnp.int32)
    got = np.asarray(fetch_soft(packed, idx)).reshape(8, 8)
    assert np.allclose(got, soft, atol=1.0 / 65535 + 1e-7)


def test_esm_estimator_limits():
    # Receiver in front of (or at) the filtered occluder -> fully lit;
    # far behind -> fully shadowed; the falloff width is ~1/c.
    soft = jnp.float32(0.5)
    c = 80.0
    assert float(esm_visibility(soft, jnp.float32(0.4), c)) == 1.0
    assert float(esm_visibility(soft, jnp.float32(0.5), c)) == 1.0
    assert float(esm_visibility(soft, jnp.float32(0.75), c)) < 1e-6


def _sun_scene():
    b = SceneBuilder()
    b.add(make_cube(0.8), np.asarray(m3.translate([0.0, 0.5, 0.0])))
    b.add(make_plane(6.0, y=-1.0), material=1, casts_shadow=False)
    return b.build()


def test_sun_esm_matches_pcf_on_clear_pixels():
    """Render a real sun shadow map; ESM and PCF must agree wherever PCF is
    saturated (fully lit / fully shadowed away from penumbra edges)."""
    from lsr_tpu.passes.shadow import render_shadow_map

    geom, objects = _sun_scene()
    sun_dir = jnp.asarray([0.3, -0.8, 0.4], jnp.float32)
    depth, light_vp = render_shadow_map(geom, objects, sun_dir,
                                        map_size=256)
    ctx_pcf = make_shadow_context(depth, light_vp, pcf_radius=2)
    ctx_esm = make_shadow_context(depth, light_vp, pcf_radius=2,
                                  filter_mode="esm")
    assert ctx_esm.filter_mode == "esm"

    xs = np.linspace(-2.5, 2.5, 40, dtype=np.float32)
    zs = np.linspace(-2.5, 2.5, 40, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    wp = jnp.asarray(
        np.stack([gx, np.full_like(gx, -1.0), gz], -1), jnp.float32)
    ndl = jnp.full(wp.shape[:-1], 0.8, jnp.float32)
    v_pcf = np.asarray(shadow_visibility_dir(ctx_pcf, wp, ndl))
    v_esm = np.asarray(shadow_visibility_dir(ctx_esm, wp, ndl))
    assert v_esm.shape == v_pcf.shape
    # The scene must actually contain both shadow and light.
    assert (v_pcf < 0.2).any() and (v_pcf > 0.9).any()
    sat = (v_pcf <= 0.0) | (v_pcf >= 1.0)
    agree = np.abs(v_esm - v_pcf)[sat]
    frac = float((agree < 0.1).mean())
    assert frac > 0.93, f"ESM disagrees with saturated PCF: {1-frac:.2%}"


def test_local_esm_spot_and_point_semantics():
    """The local-shadow scenario asserts (tests/test_local_shadows.py) must
    hold under ESM too: occluded ground dark, open ground lit, point faces
    selected, unshadowed channel constant 1."""
    geom, objects = _sun_scene()
    lb = LightSetBuilder()
    lb.spot((0.0, 4.0, 0.0), (0.0, -1.0, 0.0), intensity=3.0, range=10.0,
            inner_angle=0.6, outer_angle=1.1)
    lb.point((1.5, 1.0, 3.0), intensity=3.0, range=8.0)
    lights = lb.build()
    sh = render_local_shadow_maps(
        geom, objects, lights, spot_ids=(0,), point_ids=(1,),
        map_size=256, point_size=128, pcf_radius=1, filter_mode="esm")
    assert sh.filter_mode == "esm"
    # Packed soft tables: S*S/2 u32 rows per slot.
    assert sh.spot_taps.shape == (256 * 256 // 2,)
    assert sh.point_taps.shape == (6 * 128 * 128 // 2,)

    pts = jnp.asarray(
        [[[0.0, -1.0, 0.0],     # under the cube: spot-shadowed
          [2.5, -1.0, 2.5],     # open ground in the cone
          [20.0, -1.0, 0.0]]],  # outside every light: untouched
        jnp.float32)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), pts.shape)
    vis = np.asarray(local_shadow_vis_stack(sh, pts, nrm))[0]
    assert vis.shape == (3, 3)          # K=2 + constant plane
    assert np.allclose(vis[:, 2], 1.0)
    assert vis[0, 0] < 0.5, f"under-cube not spot-shadowed: {vis}"
    assert vis[1, 0] > 0.9, f"open ground wrongly shadowed: {vis}"
    assert np.allclose(vis[2], 1.0), f"out-of-range touched: {vis}"


def test_local_esm_crop_cascade_is_consistent():
    """ESM planes evaluated through the vis-crop cascade equal the
    full-grid ESM planes (the crop machinery is representation-agnostic)."""
    geom, objects = _sun_scene()
    lb = LightSetBuilder()
    lb.spot((0.5, 4.0, 0.5), (0.0, -1.0, 0.0), intensity=3.0, range=10.0,
            inner_angle=0.5, outer_angle=0.9)
    lights = lb.build()
    kw = dict(spot_ids=(0,), point_ids=(), map_size=128, pcf_radius=1,
              filter_mode="esm")
    sh_full = render_local_shadow_maps(geom, objects, lights, **kw)
    sh_crop = dataclasses.replace(sh_full, vis_crop=((16, 128), (32, 128)))

    xs = np.linspace(-3, 3, 64, dtype=np.float32)
    zs = np.linspace(-3, 3, 48, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    wp = jnp.asarray(
        np.stack([gx, np.full_like(gx, -1.0), gz], -1), jnp.float32)
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), wp.shape)
    v_full = np.asarray(local_shadow_vis_stack(sh_full, wp, nrm))
    v_crop = np.asarray(local_shadow_vis_stack(sh_crop, wp, nrm))
    assert np.allclose(v_full, v_crop, atol=1e-6)


def test_esm_radius0_falls_back_to_hard_pcf():
    geom, objects = _sun_scene()
    from lsr_tpu.passes.shadow import render_shadow_map

    depth, light_vp = render_shadow_map(
        geom, objects, jnp.asarray([0.3, -0.8, 0.4], jnp.float32),
        map_size=64)
    ctx = make_shadow_context(depth, light_vp, pcf_radius=0,
                              filter_mode="esm")
    assert ctx.filter_mode == "pcf" and ctx.depth_taps is None
