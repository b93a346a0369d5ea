"""Support-shape volume library vs oracle cases (culling_query.hpp:61-173)."""

import jax.numpy as jnp
import numpy as np

from lsr_tpu.geometry.support_shapes import (
    CULL_INSIDE,
    CULL_INTERSECTING,
    CULL_OUTSIDE,
    classify_convex_vertices,
    classify_support_shapes,
    light_culling_shapes,
    make_aabbs,
    make_capsules,
    make_cone_frustums,
    make_cones,
    make_cylinders,
    make_obbs,
    make_spheres,
    support_max_dot,
    transform_shapes,
)


def _unit_cell():
    """Convex cell: the unit cube [-1,1]^3 as 6 inward planes."""
    planes = []
    for axis in range(3):
        for sign in (1.0, -1.0):
            n = np.zeros(3, np.float32)
            n[axis] = sign
            planes.append(np.concatenate([n, [1.0]]))  # n.x + 1 >= 0
    return jnp.asarray(np.stack(planes), jnp.float32)


def test_support_oracle_values():
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 2.0, 0.0],
                        [0.0, 0.0, -1.0]], jnp.float32)
    rec = jnp.concatenate([
        make_spheres([[1.0, 0.0, 0.0]], [2.0]),
        make_aabbs([[-1.0, -2.0, -3.0]], [[4.0, 5.0, 6.0]]),
        make_obbs([[0.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]],
                  [[0.0, 0.0, 1.0]], [[2.0, 3.0, 1.0]]),
        make_capsules([[0.0, -1.0, 0.0]], [[0.0, 3.0, 0.0]], [0.5]),
        make_cones([[0.0, 2.0, 0.0]], [[0.0, -1.0, 0.0]], [2.0], [1.5]),
        make_cylinders([[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]], [2.0], [0.5]),
        make_cone_frustums([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]],
                           [1.0], [3.0], [0.25], [1.0]),
    ])
    s = np.asarray(support_max_dot(rec, dirs))
    # Sphere c=(1,0,0) r=2: along +x -> 3; along (0,2,0) -> 0*?+2*|d|=4.
    np.testing.assert_allclose(s[0], [3.0, 4.0, 2.0], atol=1e-5)
    # AABB min(-1,-2,-3) max(4,5,6): +x -> 4; (0,2,0) -> 10; -z -> 3.
    np.testing.assert_allclose(s[1], [4.0, 10.0, 3.0], atol=1e-5)
    # OBB at origin, axes swapped (x<->y), he=(2,3,1):
    # +x -> |x.ax|*2 + |x.ay|*3 = 3; (0,2,0) -> 2*2=4... ax=(0,1,0):he_x=2
    # so +x picks ay=(1,0,0) he_y=3 -> 3; y dir -> ax he 2 *|2| = 4; -z -> 1.
    np.testing.assert_allclose(s[2], [3.0, 4.0, 1.0], atol=1e-5)
    # Capsule a=(0,-1,0) b=(0,3,0) r=.5: +x -> .5; (0,2,0) -> 6+1=7; -z -> .5
    np.testing.assert_allclose(s[3], [0.5, 7.0, 0.5], atol=1e-5)
    # Cone apex (0,2,0) axis -y h=2 r=1.5: +x -> base disk 1.5; (0,2,0) ->
    # apex 4; -z -> 1.5.
    np.testing.assert_allclose(s[4], [1.5, 4.0, 1.5], atol=1e-5)
    # Cylinder c=(1,0,0) axis y hh=2 r=.5: +x -> 1.5; (0,2,0) -> 4; -z -> .5
    np.testing.assert_allclose(s[5], [1.5, 4.0, 0.5], atol=1e-5)
    # ConeFrustum apex origin +z, near 1 r.25, far 3 r1: +x -> 1;
    # (0,2,0) -> 2; -z -> -1 (nearest disk at z=1).
    np.testing.assert_allclose(s[6], [1.0, 2.0, -1.0], atol=1e-5)


def test_classify_against_unit_cube():
    cell = _unit_cell()
    rec = jnp.concatenate([
        make_spheres([[0.0, 0.0, 0.0]], [0.5]),     # inside
        make_spheres([[5.0, 0.0, 0.0]], [0.5]),     # outside
        make_spheres([[1.0, 0.0, 0.0]], [0.5]),     # intersecting
        make_obbs([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]],
                  [[0.0, 0.0, 1.0]], [[0.2, 0.2, 0.2]]),   # inside
        make_capsules([[-3.0, 0.0, 0.0]], [[3.0, 0.0, 0.0]], [0.1]),  # inter
        make_cones([[0.0, 4.0, 0.0]], [[0.0, -1.0, 0.0]], [2.0], [1.0]),
        # cone spans y in [2,4] -> outside (above the cube)
        make_cylinders([[0.0, 0.0, 0.0]], [[0.0, 1.0, 0.0]], [0.3], [0.3]),
    ])
    c = np.asarray(classify_support_shapes(rec, cell))
    assert c.tolist() == [CULL_INSIDE, CULL_OUTSIDE, CULL_INTERSECTING,
                          CULL_INSIDE, CULL_INTERSECTING, CULL_OUTSIDE,
                          CULL_INSIDE]


def test_classify_convex_vertices_matches_support_for_boxes():
    cell = _unit_cell()
    rng = np.random.default_rng(0)
    centers = rng.uniform(-2.0, 2.0, (32, 3)).astype(np.float32)
    he = rng.uniform(0.1, 0.8, (32, 3)).astype(np.float32)
    rec = make_aabbs(centers - he, centers + he)
    corners = np.stack([
        centers + he * np.asarray(s, np.float32)
        for s in [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1)
                  for sz in (-1, 1)]
    ], axis=1)  # (32, 8, 3)
    a = np.asarray(classify_support_shapes(rec, cell))
    b = np.asarray(classify_convex_vertices(jnp.asarray(corners), cell))
    # For polytopes the support test and the vertex test are both exact.
    np.testing.assert_array_equal(a, b)


def test_transform_shapes_rigid_invariance():
    """support(R s + t, d) == support(s, R^T d) + dot(t, d)."""
    rng = np.random.default_rng(1)
    rec = jnp.concatenate([
        make_spheres(rng.uniform(-2, 2, (4, 3)), rng.uniform(0.2, 1, 4)),
        make_cones(rng.uniform(-2, 2, (4, 3)),
                   [v / np.linalg.norm(v) for v in rng.normal(size=(4, 3))],
                   rng.uniform(0.5, 2, 4), rng.uniform(0.2, 1, 4)),
        make_capsules(rng.uniform(-2, 2, (4, 3)), rng.uniform(-2, 2, (4, 3)),
                      rng.uniform(0.2, 1, 4)),
        make_aabbs(rng.uniform(-2, 0, (4, 3)), rng.uniform(0.5, 2, (4, 3))),
    ]).astype(jnp.float32)
    # A rotation about a skew axis + translation.
    ang = 0.7
    c, s = np.cos(ang), np.sin(ang)
    rot = jnp.asarray(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]],
                               np.float32) @
                      np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32))
    t = jnp.asarray([0.5, -1.0, 2.0], jnp.float32)
    rec_t = transform_shapes(rec, rot, t)

    dirs = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    lhs = np.asarray(support_max_dot(rec_t, dirs))
    rhs = (np.asarray(support_max_dot(rec, dirs @ rot))  # R^T d rows
           + np.asarray(dirs @ t)[None, :])
    np.testing.assert_allclose(lhs, rhs, atol=2e-4)


def test_spot_cone_shape_tighter_than_sphere_but_conservative():
    from lsr_tpu.lighting.light_types import LightSetBuilder

    lb = LightSetBuilder()
    lb.spot((0.0, 0.0, 0.0), (0.0, 0.0, 1.0), range=4.0, outer_angle=0.4)
    lights = lb.build()
    rec_cone = light_culling_shapes(lights, spot_cones=True)
    rec_sph = light_culling_shapes(lights, spot_cones=False)

    # Support along -z: sphere says 4 (reaches behind), cone says 0 (apex).
    back = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    assert float(support_max_dot(rec_sph, back)[0, 0]) > 3.9
    assert float(support_max_dot(rec_cone, back)[0, 0]) <= 1e-5

    # Conservative: cone support must dominate every point actually lit by
    # the spot (inside outer angle AND within range).
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    pts = []
    for _ in range(256):
        z = rng.uniform(0, 4.0)
        theta = rng.uniform(0, 0.4)
        phi = rng.uniform(0, 2 * np.pi)
        r = z * np.tan(theta)
        p = np.asarray([r * np.cos(phi), r * np.sin(phi), z])
        if np.linalg.norm(p) <= 4.0:
            pts.append(p)
    pts = np.asarray(pts, np.float32)
    sup = np.asarray(support_max_dot(rec_cone, jnp.asarray(dirs)))[0]
    pt_dots = pts @ dirs.T  # (P, D)
    assert (pt_dots.max(axis=0) <= sup + 1e-4).all()


def test_tiled_culling_with_shapes_still_conservative():
    """Binned-vs-dense equivalence must hold with support-shape culling on
    (spot cones cut lists, never lit pixels)."""
    from lsr_tpu.lighting.light_culling import cull_lights_tiled
    from lsr_tpu.lighting.light_types import LightSetBuilder
    from lsr_tpu.scene.scene import make_camera

    w, h = 128, 96
    cam = make_camera(w, h, (0.0, 1.0, -5.0), (0, 0, 0))
    lb = LightSetBuilder()
    rng = np.random.default_rng(7)
    for i in range(24):
        p = tuple(rng.uniform([-3, 0, -3], [3, 2, 3]).tolist())
        if i % 3 == 0:
            lb.spot(p, tuple(rng.normal(size=3).tolist()), range=3.0,
                    outer_angle=0.5)
        else:
            lb.point(p, range=2.0)
    lights = lb.build()

    lists_sh, _, st_sh = cull_lights_tiled(
        lights, cam.view, cam.proj, w, h, tile_size=16, cap=32,
        use_shapes=True)
    lists_sp, _, st_sp = cull_lights_tiled(
        lights, cam.view, cam.proj, w, h, tile_size=16, cap=32,
        use_shapes=False)
    # Shape lists are a subset of sphere lists per tile.
    a = np.asarray(lists_sh)
    b = np.asarray(lists_sp)
    for t in range(a.shape[0]):
        sa = set(a[t][a[t] >= 0].tolist())
        sb = set(b[t][b[t] >= 0].tolist())
        assert sa <= sb, f"tile {t}: shape list not a subset"
    assert int(st_sh["max_count"]) <= int(st_sp["max_count"])
