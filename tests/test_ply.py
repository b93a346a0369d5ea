"""PLY loader (ascii + binary little-endian), MeshData parity with OBJ."""

import struct

import numpy as np

from lsr_tpu.io.ply import load_ply


ASCII_PLY = """ply
format ascii 1.0
comment a quad + extra triangle
element vertex 5
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
2 0 0
4 0 1 2 3
3 1 4 2
"""


def test_ascii_ply_fan_triangulation(tmp_path):
    p = tmp_path / "quad.ply"
    p.write_text(ASCII_PLY)
    m = load_ply(str(p))
    assert m.num_vertices == 5
    # quad -> 2 tris + 1 tri = 3
    assert m.num_triangles == 3
    assert m.indices[0].tolist() == [0, 1, 2]
    assert m.indices[1].tolist() == [0, 2, 3]
    # generated normals are unit and +z/-z for this planar mesh
    ln = np.linalg.norm(m.normals, axis=-1)
    np.testing.assert_allclose(ln, 1.0, atol=1e-5)
    assert np.allclose(np.abs(m.normals[:, 2]), 1.0, atol=1e-5)


def test_binary_ply_roundtrip(tmp_path):
    verts = np.asarray([
        [0, 0, 0, 0, 0, 1], [1, 0, 0, 0, 0, 1],
        [1, 1, 0, 0, 0, 1], [0, 1, 0, 0, 0, 1],
    ], np.float32)
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 4\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property float nx\nproperty float ny\nproperty float nz\n"
              b"element face 2\n"
              b"property list uchar uint vertex_indices\n"
              b"end_header\n")
    body = verts.tobytes()
    body += struct.pack("<B3I", 3, 0, 1, 2)
    body += struct.pack("<B3I", 3, 0, 2, 3)
    p = tmp_path / "bin.ply"
    p.write_bytes(header + body)
    m = load_ply(str(p))
    assert m.num_vertices == 4 and m.num_triangles == 2
    np.testing.assert_allclose(m.positions, verts[:, :3])
    np.testing.assert_allclose(m.normals, verts[:, 3:])


def test_ply_renders_through_pipeline(tmp_path):
    p = tmp_path / "quad.ply"
    p.write_text(ASCII_PLY)
    mesh = load_ply(str(p))

    from lsr_tpu.raster.brute import rasterize_brute
    from lsr_tpu.raster.setup import scene_setup
    from lsr_tpu.scene.scene import SceneBuilder, make_camera

    b = SceneBuilder()
    b.add(mesh, np.eye(4, dtype=np.float32))
    geom, objects = b.build()
    cam = make_camera(64, 64, (0.5, 0.5, -2.0), (0.5, 0.5, 0.0))
    setup = scene_setup(
        geom.positions, geom.normals, geom.uvs, geom.indices,
        geom.vtx_obj, geom.tri_obj, objects.model, objects.normal_mat,
        cam.viewproj, 64, 64, cull_mode=0)
    depth, tid = rasterize_brute(setup, 64, 64, cam.zn, cam.zf)
    assert int((np.asarray(tid) >= 0).sum()) > 200
