"""Tiled Pallas rasterizer must agree with the brute XLA path."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.core import math3d as m3
from lsr_tpu.io.obj import load_obj, make_cube
from lsr_tpu.raster.brute import rasterize_brute
from lsr_tpu.raster.setup import scene_setup
from lsr_tpu.raster.tiled import bin_triangles, rasterize_tiled

MONKEY = "/root/reference/cpp-folders/src/assets/obj/monkey/monkey.rawobj"


def _setup_for(mesh, model, width, height):
    vp = np.asarray(
        m3.perspective_lh_no(np.pi / 3, width / height, 0.1, 100.0)
        @ m3.look_at_lh(
            jnp.array([0.0, 0.0, -3.0]), jnp.array([0.0, 0.0, 0.0]),
            jnp.array([0.0, 1.0, 0.0]),
        )
    )
    return scene_setup(
        jnp.asarray(mesh.positions),
        jnp.asarray(mesh.normals),
        jnp.asarray(mesh.uvs),
        jnp.asarray(mesh.indices),
        jnp.zeros(mesh.num_vertices, jnp.int32),
        jnp.zeros(mesh.num_triangles, jnp.int32),
        jnp.asarray(model)[None],
        np.asarray(m3.normal_matrix(jnp.asarray(model)))[None],
        jnp.asarray(vp),
        width,
        height,
    )


def test_tiled_matches_brute_monkey():
    mesh = load_obj(MONKEY)
    w, h = 160, 96  # not multiples of the tile size in x
    setup = _setup_for(mesh, np.asarray(m3.rotate_y(0.5)), w, h)
    d_b, t_b = rasterize_brute(setup, w, h, 0.1, 100.0)
    d_t, t_t, max_bin = rasterize_tiled(
        setup, w, h, jnp.float32(0.1), jnp.float32(100.0),
        tile_h=16, tile_w=128, cap=1024, chunk=8,
    )
    assert int(max_bin) <= 1024
    t_b, t_t = np.asarray(t_b), np.asarray(t_t)
    d_b, d_t = np.asarray(d_b), np.asarray(d_t)
    # Identical coverage and winners (same arithmetic, same order rules).
    mismatch = (t_b != t_t).sum()
    assert mismatch == 0, f"{mismatch} tid mismatches"
    np.testing.assert_allclose(d_b, d_t, atol=1e-6)


def test_tiled_overflow_reported():
    mesh = load_obj(MONKEY)
    w, h = 64, 64
    setup = _setup_for(mesh, np.eye(4, dtype=np.float32), w, h)
    lists, counts, max_bin = bin_triangles(setup, w, h, 32, 128, cap=16)
    assert int(max_bin) > 16  # the monkey concentrates way more than 16 tris
    assert int(counts.max()) <= 16  # but stored lists are capped


def test_tiled_depth_chaining():
    # Rasterizing mesh A then mesh B over the same buffers must equal
    # rasterizing A+B at once (depth buffer chaining across draws).
    cube = make_cube(1.5)
    w, h = 128, 128
    m_a = np.asarray(m3.translate([-0.4, 0.0, 0.2]))
    m_b = np.asarray(m3.translate([0.4, 0.0, -0.2]) @ m3.rotate_y(0.6))
    s_a = _setup_for(cube, m_a, w, h)
    s_b = _setup_for(cube, m_b, w, h)

    zn, zf = jnp.float32(0.1), jnp.float32(100.0)
    d1, t1, _ = rasterize_tiled(s_a, w, h, zn, zf, cap=256)
    d2, t2, _ = rasterize_tiled(s_b, w, h, zn, zf, depth_init=d1, tid_init=t1, cap=256)

    d_ref_a, _ = rasterize_brute(s_a, w, h, zn, zf)
    d_ref, _ = rasterize_brute(s_b, w, h, zn, zf, depth_init=d_ref_a)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref), atol=1e-6)
    assert (np.asarray(t2) >= 0).sum() > 100


def test_direct_matches_brute_monkey():
    from lsr_tpu.raster.tiled import rasterize_direct

    mesh = load_obj(MONKEY)
    w, h = 160, 96
    setup = _setup_for(mesh, np.asarray(m3.rotate_y(0.5)), w, h)
    d_b, t_b = rasterize_brute(setup, w, h, 0.1, 100.0)
    d_t, t_t, max_sup = rasterize_direct(
        setup, w, h, jnp.float32(0.1), jnp.float32(100.0),
        tile_h=16, tile_w=128,
    )
    assert int(max_sup) <= 128
    mismatch = (np.asarray(t_b) != np.asarray(t_t)).sum()
    assert mismatch == 0, f"{mismatch} tid mismatches"
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_t), atol=1e-6)


def test_direct_spatial_sort_depth_exact():
    """spatial_sort reorders setup rows for tighter chunk bboxes; the
    depth-only output (pure min resolve) must be bit-identical, and
    emitted tids must still index the caller's (unsorted) setup rows."""
    from lsr_tpu.raster.setup import DEPTH_NDC01
    from lsr_tpu.raster.tiled import rasterize_direct

    mesh = load_obj(MONKEY)
    w, h = 160, 96
    setup = _setup_for(mesh, np.asarray(m3.rotate_y(0.5)), w, h)
    # Adversarial input order: interleave far-apart triangles.
    n = setup.coef.shape[0]
    perm = np.argsort(np.arange(n) % 7, kind="stable").astype(np.int32)
    import jax

    shuffled = jax.tree_util.tree_map(lambda x: x[jnp.asarray(perm)], setup)
    kw = dict(depth_mode=DEPTH_NDC01, track_ids=False, tile_h=16)
    d0, _, _ = rasterize_direct(shuffled, w, h, jnp.float32(0.0),
                                jnp.float32(1.0), **kw)
    d1, _, _ = rasterize_direct(shuffled, w, h, jnp.float32(0.0),
                                jnp.float32(1.0), spatial_sort=True, **kw)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    # With id tracking, coverage must agree and every winning tid must map
    # back to the same screen triangle (ties aside: the monkey at this pose
    # has none — assert exact).
    df0, t0, _ = rasterize_direct(shuffled, w, h, jnp.float32(0.1),
                                  jnp.float32(100.0), tile_h=16)
    df1, t1, _ = rasterize_direct(shuffled, w, h, jnp.float32(0.1),
                                  jnp.float32(100.0), tile_h=16,
                                  spatial_sort=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(df0), np.asarray(df1))


def test_direct_band_offset():
    from lsr_tpu.raster.tiled import rasterize_direct

    mesh = load_obj(MONKEY)
    w, h = 128, 64
    setup = _setup_for(mesh, np.eye(4, dtype=np.float32), w, h)
    d_f, t_f, _ = rasterize_direct(setup, w, h, jnp.float32(0.1),
                                   jnp.float32(100.0), tile_h=16)
    band = h // 2
    d_b, t_b, _ = rasterize_direct(setup, w, band, jnp.float32(0.1),
                                   jnp.float32(100.0), tile_h=16,
                                   y_offset=band, full_height=h)
    np.testing.assert_array_equal(np.asarray(t_f)[band:], np.asarray(t_b))
    np.testing.assert_allclose(np.asarray(d_f)[band:], np.asarray(d_b), atol=1e-7)


def test_chunklist_matches_brute_monkey():
    from lsr_tpu.raster.tiled import rasterize_chunklist

    mesh = load_obj(MONKEY)
    w, h = 160, 96
    setup = _setup_for(mesh, np.asarray(m3.rotate_y(0.5)), w, h)
    d_b, t_b = rasterize_brute(setup, w, h, 0.1, 100.0)
    d_t, t_t, max_cnt = rasterize_chunklist(
        setup, w, h, jnp.float32(0.1), jnp.float32(100.0),
        tile_h=32, tile_w=128, sub_h=16,
    )
    assert int(max_cnt) > 0
    mismatch = (np.asarray(t_b) != np.asarray(t_t)).sum()
    assert mismatch == 0, f"{mismatch} tid mismatches"
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_t), atol=1e-6)


def test_chunklist_depth_only_and_band_offset():
    from lsr_tpu.raster.setup import DEPTH_NDC01
    from lsr_tpu.raster.tiled import rasterize_chunklist, rasterize_direct

    mesh = load_obj(MONKEY)
    w, h = 128, 64
    setup = _setup_for(mesh, np.eye(4, dtype=np.float32), w, h)
    d_ref, _, _ = rasterize_direct(setup, w, h, jnp.float32(0.0),
                                   jnp.float32(1.0), tile_h=16,
                                   depth_mode=DEPTH_NDC01, track_ids=False)
    d_c, _, _ = rasterize_chunklist(setup, w, h, jnp.float32(0.0),
                                    jnp.float32(1.0), tile_h=32, sub_h=32,
                                    depth_mode=DEPTH_NDC01, track_ids=False)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_c), atol=1e-7)

    band = h // 2
    d_b, t_b, _ = rasterize_chunklist(setup, w, band, jnp.float32(0.0),
                                      jnp.float32(1.0), tile_h=32, sub_h=32,
                                      depth_mode=DEPTH_NDC01,
                                      y_offset=band, full_height=h)
    np.testing.assert_allclose(np.asarray(d_c)[band:], np.asarray(d_b),
                               atol=1e-7)


def test_chunklist_depth_chaining():
    from lsr_tpu.raster.tiled import rasterize_chunklist

    cube = make_cube(1.5)
    w, h = 128, 128
    m_a = np.asarray(m3.translate([-0.4, 0.0, 0.2]))
    m_b = np.asarray(m3.translate([0.4, 0.0, -0.2]) @ m3.rotate_y(0.6))
    s_a = _setup_for(cube, m_a, w, h)
    s_b = _setup_for(cube, m_b, w, h)

    zn, zf = jnp.float32(0.1), jnp.float32(100.0)
    d1, t1, _ = rasterize_chunklist(s_a, w, h, zn, zf)
    d2, t2, _ = rasterize_chunklist(s_b, w, h, zn, zf,
                                    depth_init=d1, tid_init=t1)
    d_ref_a, _ = rasterize_brute(s_a, w, h, zn, zf)
    d_ref, _ = rasterize_brute(s_b, w, h, zn, zf, depth_init=d_ref_a)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d_ref), atol=1e-6)
    assert (np.asarray(t2) >= 0).sum() > 100


def test_direct_spatial_sort_tid_ties_exact():
    """Exact z ties: duplicating every setup row makes each covered pixel a
    perfect depth tie between tid i and tid i+n.  The sorted raster resolves
    ties by MIN TID (lexicographic), which must reproduce the unsorted
    first-wins result bit-exactly — winners all come from the first copy."""
    import jax

    from lsr_tpu.raster.tiled import rasterize_direct

    mesh = load_obj(MONKEY)
    w, h = 160, 96
    setup = _setup_for(mesh, np.asarray(m3.rotate_y(0.5)), w, h)
    n = setup.coef.shape[0]
    doubled = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x, x], axis=0), setup)
    d0, t0, _ = rasterize_direct(doubled, w, h, jnp.float32(0.1),
                                 jnp.float32(100.0), tile_h=16)
    d1, t1, _ = rasterize_direct(doubled, w, h, jnp.float32(0.1),
                                 jnp.float32(100.0), tile_h=16,
                                 spatial_sort=True)
    t0n, t1n = np.asarray(t0), np.asarray(t1)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(t0n, t1n)
    covered = t0n >= 0
    assert covered.any()
    assert (t0n[covered] < n).all(), "tie must keep the lower tid copy"
