"""Procedural 2D shaders + canvas primitives (hello-shaders /
hello-pixel-primitives capability coverage)."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.raster.primitives2d import (
    alpha_blend,
    draw_circle_poly,
    draw_triangle_outline,
    fill_rect,
    fill_triangle_2d,
    image_blit,
)
from lsr_tpu.shading.procedural import (
    PROCEDURAL_SHADERS,
    f_random,
    fbm,
    hsb_to_rgb,
    snoise2,
)


def test_hash_and_noise_properties():
    x = jnp.linspace(0, 10, 256)
    y = jnp.linspace(0, 10, 256)
    r = np.asarray(f_random(x, y))
    assert ((r >= 0) & (r < 1)).all()
    assert r.std() > 0.2  # well spread

    xx, yy = jnp.meshgrid(jnp.linspace(0, 8, 64), jnp.linspace(0, 8, 64))
    n = np.asarray(snoise2(xx, yy))
    assert np.abs(n).max() <= 1.3
    assert n.std() > 0.1
    # Deterministic
    n2 = np.asarray(snoise2(xx, yy))
    np.testing.assert_array_equal(n, n2)

    f = np.asarray(fbm(xx, yy))
    assert np.isfinite(f).all()
    assert f.std() > n.std() * 0.3


def test_hsb_primaries():
    h = jnp.asarray([0.0, 1 / 3, 2 / 3])
    s = jnp.ones(3)
    b = jnp.ones(3)
    rgb = np.asarray(hsb_to_rgb(h, s, b))
    assert np.argmax(rgb[0]) == 0  # red-ish at hue 0
    assert np.argmax(rgb[1]) == 1  # green-ish
    assert np.argmax(rgb[2]) == 2  # blue-ish
    # Zero saturation -> white * brightness
    grey = np.asarray(hsb_to_rgb(jnp.asarray([0.4]), jnp.zeros(1), jnp.asarray([0.7])))
    np.testing.assert_allclose(grey[0], [0.7, 0.7, 0.7], atol=1e-6)


def test_all_procedural_shaders_render():
    for name, fn in PROCEDURAL_SHADERS.items():
        img = np.asarray(fn(96, 64, 1.25))
        assert img.shape == (64, 96, 3), name
        assert np.isfinite(img).all(), name
        assert img.std() > 0.01, f"{name} produced a flat image"


def test_green_noise_is_green():
    img = np.asarray(PROCEDURAL_SHADERS["green_noise"](128, 128, 2.0))
    assert img[..., 1].max() > 0.5
    assert img[..., 0].max() == 0.0 and img[..., 2].max() == 0.0


def test_fill_and_triangle():
    c = jnp.zeros((32, 32, 3), jnp.uint8)
    c = fill_rect(c, 2, 3, 5, 4, (255, 0, 0))
    a = np.asarray(c)
    assert np.array_equal(a[3, 2], [255, 0, 0])
    assert np.array_equal(a[6, 6], [255, 0, 0])
    assert np.array_equal(a[7, 2], [0, 0, 0])  # y = 3+4 exclusive

    c2 = fill_triangle_2d(jnp.zeros((32, 32, 3), jnp.uint8),
                          [(2, 2), (28, 4), (14, 28)], (0, 255, 0))
    a2 = np.asarray(c2)
    assert np.array_equal(a2[10, 14], [0, 255, 0])  # interior
    assert np.array_equal(a2[30, 2], [0, 0, 0])     # exterior

    c3 = draw_triangle_outline(jnp.zeros((32, 32, 3), jnp.uint8),
                               [(2, 2), (28, 4), (14, 28)], (0, 0, 255))
    a3 = np.asarray(c3)
    assert np.array_equal(a3[2, 2], [0, 0, 255])
    assert (a3.any(-1)).sum() < (a2.any(-1)).sum()  # outline < fill


def test_circle_blit_blend():
    c = draw_circle_poly(jnp.zeros((64, 64, 3), jnp.uint8), 32, 32, 20, 24,
                         (255, 255, 0))
    a = np.asarray(c)
    ys, xs = np.nonzero(a.any(-1))
    rr = np.sqrt((xs - 32.0) ** 2 + (ys - 32.0) ** 2)
    assert (np.abs(rr - 20) < 2.5).mean() > 0.9  # pixels near the radius

    img = jnp.full((8, 8, 3), 200, jnp.uint8)
    c2 = np.asarray(image_blit(jnp.zeros((16, 16, 3), jnp.uint8), img, 12, 12))
    assert np.array_equal(c2[13, 13], [200, 200, 200])
    assert np.array_equal(c2[11, 11], [0, 0, 0])  # outside paste rect

    blended = np.asarray(alpha_blend(
        jnp.zeros((4, 4, 3), jnp.uint8), jnp.full((4, 4, 3), 100, jnp.uint8), 0.5
    ))
    assert np.array_equal(blended[0, 0], [50, 50, 50])
