"""Math kernel tests: LH conventions pinned against hand-computed GLM values."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3


def test_perspective_lh_no_matches_glm():
    # glm::perspectiveLH_NO(fovy=pi/2, aspect=2, zn=0.1, zf=100)
    m = np.asarray(m3.perspective_lh_no(np.pi / 2, 2.0, 0.1, 100.0))
    t = np.tan(np.pi / 4)
    assert np.isclose(m[0, 0], 1 / (2 * t), atol=1e-6)
    assert np.isclose(m[1, 1], 1 / t, atol=1e-6)
    assert np.isclose(m[2, 2], (100 + 0.1) / (100 - 0.1), atol=1e-6)
    assert np.isclose(m[2, 3], -(2 * 100 * 0.1) / (100 - 0.1), atol=1e-5)
    assert m[3, 2] == 1.0 and m[3, 3] == 0.0

    # A point on the near plane (z=+zn forward) maps to NDC z = -1,
    # far plane to +1 (NO = negative-one-to-one depth range).
    near = m @ np.array([0, 0, 0.1, 1.0])
    far = m @ np.array([0, 0, 100.0, 1.0])
    assert np.isclose(near[2] / near[3], -1.0, atol=1e-5)
    assert np.isclose(far[2] / far[3], 1.0, atol=1e-5)
    # LH: positive (forward) z gives positive w.
    assert near[3] > 0


def test_look_at_lh_basis():
    # Camera at -5z looking at origin: view forward is +Z, +X right, +Y up.
    v = np.asarray(m3.look_at_lh([0, 0, -5.0], [0, 0, 0.0], [0, 1, 0.0]))
    p_view = v @ np.array([0, 0, 0, 1.0])
    assert np.allclose(p_view[:3], [0, 0, 5], atol=1e-6)  # 5m in front
    right = v @ np.array([1, 0, 0, 0.0])
    up = v @ np.array([0, 1, 0, 0.0])
    assert np.allclose(right[:3], [1, 0, 0], atol=1e-6)
    assert np.allclose(up[:3], [0, 1, 0], atol=1e-6)


def test_ortho_lh_no():
    m = np.asarray(m3.ortho_lh_no(-2, 2, -1, 1, 0.0, 10.0))
    p = m @ np.array([2.0, 1.0, 10.0, 1.0])
    assert np.allclose(p[:3], [1, 1, 1], atol=1e-6)
    p = m @ np.array([-2.0, -1.0, 0.0, 1.0])
    assert np.allclose(p[:3], [-1, -1, -1], atol=1e-6)


def test_trs_and_normal_matrix():
    mdl = m3.compose_trs([1, 2, 3], m3.rotate_y(np.pi / 2), [2.0, 2.0, 2.0])
    p = np.asarray(m3.transform_points(mdl, jnp.array([[1.0, 0.0, 0.0]])))
    # rotate_y(pi/2) about +Y maps +X -> -Z (LH uses the same matrix form as glm).
    assert np.allclose(p[0], [1, 2, 3 - 2], atol=1e-5)

    nm = np.asarray(m3.normal_matrix(mdl))
    n = nm @ np.array([1.0, 0, 0])
    n = n / np.linalg.norm(n)
    assert np.allclose(n, [0, 0, -1], atol=1e-5)

    # Degenerate scale falls back to raw 3x3 (reference guard).
    degenerate = m3.scale([1.0, 1.0, 0.0])
    nm2 = np.asarray(m3.normal_matrix(degenerate))
    assert np.allclose(nm2, np.asarray(degenerate)[:3, :3], atol=1e-6)


def test_screen_mapping():
    s = np.asarray(m3.ndc_to_screen(jnp.array([[0.0, 0.0], [-1.0, -1.0], [1.0, 1.0]]), 640, 480))
    assert np.allclose(s[0], [(640 - 1) * 0.5, (480 - 1) * 0.5])
    assert np.allclose(s[1], [0, 0])
    assert np.allclose(s[2], [639, 479])


def test_project_to_ndc_w_guard():
    ndc = np.asarray(m3.project_to_ndc(jnp.array([[2.0, 4.0, 6.0, 2.0]])))
    assert np.allclose(ndc[0], [1, 2, 3])
