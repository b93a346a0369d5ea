"""Sky models, cubemap sampling, IBL precompute, SSAO."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.resources.ibl import (
    compute_irradiance_map,
    compute_prefiltered_specular,
    eval_ibl,
    sample_prefiltered,
)
from lsr_tpu.sky.sky_models import (
    camera_ray_dirs,
    procedural_sky,
    render_sky,
    sample_cubemap,
)


def _solid_cubemap(size=8):
    """Six faces, distinct constant colors."""
    cols = np.array([
        [1, 0, 0], [0, 1, 0], [0, 0, 1],
        [1, 1, 0], [1, 0, 1], [0, 1, 1],
    ], np.float32)
    return jnp.asarray(np.broadcast_to(
        cols[:, None, None, :], (6, size, size, 3)
    ).copy())


def test_cubemap_face_selection():
    faces = _solid_cubemap()
    dirs = jnp.asarray([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1],
    ], jnp.float32)
    out = np.asarray(sample_cubemap(faces, dirs))
    expect = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                       [1, 1, 0], [1, 0, 1], [0, 1, 1]], np.float32)
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_procedural_sky_gradient_and_sun():
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    sun_dir = (0.0, -0.7071, 0.7071)  # sun shines down-forward
    sky_up = np.asarray(procedural_sky(up, sun_dir_ws=sun_dir))[0]
    sky_dn = np.asarray(procedural_sky(down, sun_dir_ws=sun_dir))[0]
    assert sky_up[2] > sky_up[0]      # blue-ish zenith
    assert sky_dn.mean() < sky_up.mean()  # darker ground
    to_sun = jnp.asarray([[0.0, 0.7071, -0.7071]])
    disk = np.asarray(procedural_sky(to_sun, sun_dir_ws=sun_dir))[0]
    assert disk.sum() > 5.0  # bright sun disk


def test_render_sky_covers_frame():
    w, h = 64, 48
    view = m3.look_at_lh(jnp.zeros(3), jnp.asarray([0.0, 0.0, 1.0]),
                         jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective_lh_no(np.pi / 3, w / h, 0.1, 100.0)
    img = np.asarray(render_sky(proj @ view, w, h,
                                sun_dir_ws=jnp.asarray([0.3, -0.5, 0.8])))
    assert img.shape == (h, w, 3)
    assert np.isfinite(img).all()
    # Looking slightly up should be bluer at the top of the frame.
    assert img[-1, w // 2, 2] >= img[0, w // 2, 2] - 1e-5

    dirs = np.asarray(camera_ray_dirs(jnp.linalg.inv(proj @ view), w, h))
    lens = np.linalg.norm(dirs, axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    assert dirs[h // 2, w // 2, 2] > 0.9  # looking +Z


def test_ibl_precompute():
    # Environment: bright +Y hemisphere (white top, black bottom).
    size = 8
    faces = np.zeros((6, size, size, 3), np.float32)
    faces[2] = 1.0  # +Y face white
    env = jnp.asarray(faces)

    irr = compute_irradiance_map(env, out_size=8, samples=64)
    up = np.asarray(sample_cubemap(irr, jnp.asarray([[0.0, 1.0, 0.0]])))[0]
    dn = np.asarray(sample_cubemap(irr, jnp.asarray([[0.0, -1.0, 0.0]])))[0]
    assert up.mean() > dn.mean() + 0.05  # up-facing surface gathers more

    mips = compute_prefiltered_specular(env, out_size=16, samples=64, mips=3)
    assert len(mips) == 3
    sharp = np.asarray(sample_prefiltered(mips, jnp.asarray([[0.0, 1.0, 0.0]]),
                                          jnp.asarray([0.0])))[0]
    rough = np.asarray(sample_prefiltered(mips, jnp.asarray([[0.0, 1.0, 0.0]]),
                                          jnp.asarray([1.0])))[0]
    assert sharp.mean() >= rough.mean() - 1e-5  # blurrier = spread out

    n = jnp.asarray([[0.0, 1.0, 0.0]])
    v = jnp.asarray([[0.0, 1.0, 0.0]])
    c = np.asarray(eval_ibl(irr, mips, n, v, jnp.asarray([[0.8, 0.8, 0.8]]),
                            jnp.asarray([[0.0]]), jnp.asarray([[0.5]]),
                            jnp.asarray([[1.0]])))
    assert np.isfinite(c).all() and c.mean() > 0.0


def test_ssao_darkens_corners():
    import dataclasses
    from lsr_tpu.passes.ssao import ssao_pass
    from lsr_tpu.raster.interp import GBuffer

    h, w = 64, 64
    # Depth step: a near "box" occludes neighbors on the far plane around it.
    depth = np.full((h, w), 0.508, np.float32)
    depth[24:40, 24:40] = 0.5
    gb = GBuffer(
        world_pos=jnp.zeros((h, w, 3)),
        normal_ws=jnp.zeros((h, w, 3)).at[..., 1].set(1.0),
        uv=jnp.zeros((h, w, 2)),
        depth01=jnp.asarray(depth),
        obj_id=jnp.zeros((h, w), jnp.int32),
        covered=jnp.ones((h, w), bool),
        bary=jnp.zeros((h, w, 3)),
        face_normal=jnp.zeros((h, w, 3)).at[..., 1].set(1.0),
        tri_id=jnp.zeros((h, w), jnp.int32),
    )
    ao = np.asarray(ssao_pass(gb, 0.1, 100.0))
    assert ao.min() >= 0.0 and ao.max() <= 1.0
    # Pixels just outside the near box are occluded by it.
    assert ao[32, 42] < ao[8, 8] - 0.05
