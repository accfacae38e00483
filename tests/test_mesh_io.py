import numpy as np

from followmyhold_tpu.utils.mesh_io import (
    HostMesh,
    load_mesh,
    pad_mesh,
    read_obj,
    read_ply,
    write_obj,
    write_ply,
)


def _box():
    verts = np.array(
        [
            [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
            [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
        ],
        dtype=np.float32,
    )
    faces = np.array(
        [
            [0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6],
            [0, 4, 5], [0, 5, 1], [1, 5, 6], [1, 6, 2],
            [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0],
        ],
        dtype=np.int32,
    )
    return verts, faces


def test_ply_roundtrip_binary(tmp_path):
    v, f = _box()
    p = str(tmp_path / "box.ply")
    write_ply(p, v, f, binary=True)
    mesh = read_ply(p)
    np.testing.assert_allclose(mesh.vertices, v)
    np.testing.assert_array_equal(mesh.faces, f)


def test_ply_roundtrip_ascii(tmp_path):
    v, f = _box()
    p = str(tmp_path / "box.ply")
    write_ply(p, v, f, binary=False)
    mesh = read_ply(p)
    np.testing.assert_allclose(mesh.vertices, v)
    np.testing.assert_array_equal(mesh.faces, f)


def test_obj_roundtrip(tmp_path):
    v, f = _box()
    p = str(tmp_path / "box.obj")
    write_obj(p, v, f)
    mesh = read_obj(p)
    np.testing.assert_allclose(mesh.vertices, v)
    np.testing.assert_array_equal(mesh.faces, f)


def test_load_dispatch(tmp_path):
    v, f = _box()
    p = str(tmp_path / "box.ply")
    write_ply(p, v, f)
    mesh = load_mesh(p)
    assert mesh.num_vertices == 8 and mesh.num_faces == 12
    assert mesh.scale > 0


def test_pad_mesh_static_shapes():
    v, f = _box()
    mesh = HostMesh(v, f)
    pv, pf, nv, nf = pad_mesh(mesh, max_verts=16, max_faces=20)
    assert pv.shape == (16, 3) and pf.shape == (20, 3)
    assert nv == 8 and nf == 12
    # padding verts replicate vertex 0 so bbox is unchanged
    np.testing.assert_allclose(pv[8:], np.tile(v[0], (8, 1)))
    # padding faces are degenerate
    assert (pf[12:] == 0).all()
