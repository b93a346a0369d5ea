"""Debug draw overlays + texture loader/registry."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.io.png import write_png
from lsr_tpu.raster.debug_draw import aabb_segments, draw_aabbs, draw_segments
from lsr_tpu.resources.textures import ResourceRegistry, load_texture_linear


def _vp(w, h, eye=(0, 0, -5.0)):
    view = m3.look_at_lh(jnp.asarray(eye, jnp.float32), jnp.zeros(3),
                         jnp.asarray([0.0, 1.0, 0.0]))
    proj = m3.perspective_lh_no(np.pi / 3, w / h, 0.1, 100.0)
    return proj @ view


def test_draw_segments_overlay():
    w, h = 64, 64
    ldr = jnp.zeros((h, w, 3), jnp.uint8)
    p0 = jnp.asarray([[-1.0, 0.0, 0.0]])
    p1 = jnp.asarray([[1.0, 0.0, 0.0]])
    out = np.asarray(draw_segments(ldr, p0, p1, _vp(w, h)))
    row = out[h // 2 - 2:h // 2 + 2]
    assert (row.any(-1)).sum() > 10  # a horizontal line near center

    # Segment crossing the near plane must not explode (clip, not wrap).
    p0b = jnp.asarray([[0.0, 0.5, -10.0]])  # behind camera
    p1b = jnp.asarray([[0.0, 0.5, 5.0]])
    out2 = np.asarray(draw_segments(ldr, p0b, p1b, _vp(w, h)))
    assert out2.shape == (h, w, 3)


def test_aabb_overlay():
    w, h = 96, 96
    segs = aabb_segments(jnp.asarray([[-1.0, -1, -1]]), jnp.asarray([[1.0, 1, 1]]))
    assert segs[0].shape == (12, 3)
    out = np.asarray(draw_aabbs(jnp.zeros((h, w, 3), jnp.uint8),
                                jnp.asarray([[-1.0, -1, -1]]),
                                jnp.asarray([[1.0, 1, 1]]), _vp(w, h)))
    assert (out.any(-1)).sum() > 50  # box wireframe drawn


def test_texture_loader_and_registry(tmp_path):
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :8] = 255
    p = str(tmp_path / "t.png")
    write_png(p, img)

    tex = load_texture_linear(p)
    assert tex.shape == (16, 16, 3)
    assert abs(tex[0, 0, 0] - 1.0) < 1e-6  # 255 -> linear 1.0
    assert tex[0, 12, 0] == 0.0

    tex8 = load_texture_linear(p, size=8)
    assert tex8.shape == (8, 8, 3)

    reg = ResourceRegistry()
    t0 = reg.load_texture(p)
    t1 = reg.load_texture(p)  # auto-resized to first texture's size
    arr = reg.texture_array()
    assert arr.shape == (2, 16, 16, 3) and t0 == 0 and t1 == 1
    m = reg.add_material(base_color=(1, 0, 0), tex=t0)
    assert reg.counts() == {"meshes": 0, "textures": 2, "materials": 1}
    assert reg.materials()[m]["tex"] == t0
