import numpy as np

from tpunerf.core import obj_io


def test_parse_simple_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("""
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vt 0 0
vt 1 0
vt 0 1
f 1/1 2/2 3/3
f 2/2 4/1 3/3
""")
    m = obj_io.load_obj(p)
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (2, 3)
    assert m.uvs.shape == (3, 2)
    assert m.face_uvs_idx.shape == (2, 3)
    np.testing.assert_array_equal(m.faces[0], [0, 1, 2])
    np.testing.assert_array_equal(m.face_uvs_idx[1], [1, 0, 2])


def test_polygon_fan_and_negative_indices(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n")
    m = obj_io.load_obj(p)
    assert m.faces.shape == (2, 3)  # quad fan-triangulated
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


def test_reference_shapes_load():
    m = obj_io.load_mesh("/root/reference/shapes/sphere.obj")
    assert m.vertices.shape[0] > 100
    assert m.faces.min() >= 0
    assert m.faces.max() < m.vertices.shape[0]
    env = obj_io.load_mesh("/root/reference/shapes/env_sphere.obj")
    assert env.faces.shape[1] == 3


def test_off_parser(tmp_path):
    p = tmp_path / "t.off"
    p.write_text("OFF\n4 2 0\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n3 0 1 2\n3 0 2 3\n")
    m = obj_io.load_off(p)
    assert m.vertices.shape == (4, 3)
    assert m.faces.shape == (2, 3)


def test_export_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    vt = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    ft = np.array([[0, 1, 2]], np.int32)
    albedo = np.zeros((8, 8, 3), np.float32)
    obj_p, mtl_p, png_p = obj_io.save_obj_with_mtl(tmp_path, v, f, vt, ft,
                                                   albedo)
    assert obj_p.exists() and mtl_p.exists() and png_p.exists()
    m = obj_io.load_obj(obj_p)
    np.testing.assert_allclose(m.vertices, v)
    np.testing.assert_array_equal(m.faces, f)
    np.testing.assert_allclose(m.uvs, vt)
