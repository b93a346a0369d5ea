"""Line rasterizer: closed-form Bresenham must match the reference loop exactly."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.raster.lines import line_points, rasterize_lines


def bresenham_reference(x0, y0, x1, y1):
    """Direct simulation of Canvas::draw_line (shs_renderer.hpp:808-822)."""
    dx = abs(x1 - x0)
    sx = 1 if x0 < x1 else -1
    dy = -abs(y1 - y0)
    sy = 1 if y0 < y1 else -1
    err = dx + dy
    pts = []
    while True:
        pts.append((x0, y0))
        if x0 == x1 and y0 == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x0 += sx
        if e2 <= dx:
            err += dx
            y0 += sy
    return pts


def test_line_points_match_bresenham():
    rng = np.random.default_rng(1)
    p0 = rng.integers(-30, 30, (200, 2)).astype(np.int32)
    p1 = rng.integers(-30, 30, (200, 2)).astype(np.int32)
    x, y, valid = line_points(jnp.array(p0), jnp.array(p1), max_steps=64)
    x, y, valid = np.asarray(x), np.asarray(y), np.asarray(valid)
    for i in range(200):
        ref = bresenham_reference(p0[i, 0], p0[i, 1], p1[i, 0], p1[i, 1])
        got = list(zip(x[i][valid[i]].tolist(), y[i][valid[i]].tolist()))
        assert got == ref, f"line {i}: {p0[i]}->{p1[i]}"


def test_rasterize_lines_bounds_and_color():
    canvas = jnp.zeros((16, 16, 3), jnp.uint8)
    p0 = jnp.array([[0, 0], [-5, 8]], jnp.int32)
    p1 = jnp.array([[15, 15], [20, 8]], jnp.int32)  # second crosses OOB
    out = np.asarray(rasterize_lines(canvas, p0, p1, jnp.array([0, 255, 0], jnp.uint8)))
    # Diagonal drawn
    assert np.array_equal(out[0, 0], [0, 255, 0])
    assert np.array_equal(out[15, 15], [0, 255, 0])
    # Horizontal row-8 drawn only inside bounds
    assert np.array_equal(out[8, 0], [0, 255, 0])
    assert np.array_equal(out[8, 15], [0, 255, 0])
    # Nothing outside
    assert out.shape == (16, 16, 3)
    # Untouched pixel stays black
    assert np.array_equal(out[1, 5], [0, 0, 0])
