import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.grid import generate_dense_grid_points
from followmyhold_tpu.ops.sdf import mesh_to_sdf, winding_number
from followmyhold_tpu.ops.surface import (
    PaddedMesh,
    face_normals,
    marching_tets,
    marching_tets_host,
    mesh_edges,
    vertex_normals,
)

RES = 24
BOUND = 1.1


def sphere_sdf(radius=0.7):
    xyz, gs, _ = generate_dense_grid_points([-BOUND] * 3, [BOUND] * 3, RES)
    sdf = jnp.linalg.norm(xyz, axis=-1) - radius
    return sdf, xyz


def test_marching_tets_sphere_geometry():
    sdf, _ = sphere_sdf()
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    nv = int(mesh.num_verts)
    nf = int(mesh.num_faces)
    assert nv > 100 and nf > 100
    v = np.asarray(mesh.verts)[np.asarray(mesh.vert_mask) > 0]
    r = np.linalg.norm(v, axis=-1)
    # vertices lie on the sphere up to grid-linearization error
    assert abs(r.mean() - 0.7) < 0.01
    assert np.abs(r - 0.7).max() < 0.05


def test_marching_tets_outward_orientation():
    sdf, _ = sphere_sdf()
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    fn = np.asarray(face_normals(mesh))
    centers = np.asarray(mesh.verts)[np.asarray(mesh.faces)].mean(axis=1)
    m = np.asarray(mesh.face_mask) > 0
    dots = (fn[m] * centers[m]).sum(-1) / np.maximum(
        np.linalg.norm(centers[m], axis=-1), 1e-9)
    # outward normals: positive dot with radial direction
    assert (dots > 0).mean() > 0.99


def test_marching_tets_watertight_winding():
    sdf, _ = sphere_sdf()
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    pts = jnp.asarray([[0.0, 0, 0], [1.0, 1.0, 1.0], [0.3, 0.2, -0.1]])
    wn = np.asarray(winding_number(pts, mesh.verts, mesh.faces, mesh.face_mask))
    np.testing.assert_allclose(wn, [1.0, 0.0, 1.0], atol=1e-3)


def test_marching_tets_differentiable():
    sdf, _ = sphere_sdf()
    lo = jnp.asarray([-BOUND] * 3)
    hi = jnp.asarray([BOUND] * 3)

    def mean_radius(s):
        mesh = marching_tets(s, lo, hi, RES, max_verts=8192, max_faces=16384)
        r = jnp.linalg.norm(mesh.verts, axis=-1)
        return jnp.sum(r * mesh.vert_mask) / jnp.sum(mesh.vert_mask)

    g = jax.grad(mean_radius)(sdf)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0
    # growing the sdf (more positive) shrinks the surface -> check sign via FD
    eps = 1e-3
    r0 = float(mean_radius(sdf))
    r1 = float(mean_radius(sdf + eps))
    fd = (r1 - r0) / eps
    an = float(np.sum(g))
    np.testing.assert_allclose(an, fd, rtol=0.05)


def test_marching_tets_sdf_roundtrip():
    # mesh -> sdf -> mesh round trip preserves the surface (parity with the
    # reference's test_conversion_mesh2sdf, kaolin_sdf_ops.py:112-128)
    sdf, xyz = sphere_sdf()
    lo = jnp.asarray([-BOUND] * 3)
    hi = jnp.asarray([BOUND] * 3)
    mesh = marching_tets(sdf, lo, hi, RES, max_verts=8192, max_faces=16384)
    sdf2 = mesh_to_sdf(xyz, mesh.verts, mesh.faces, mesh.face_mask)
    mesh2 = marching_tets(sdf2, lo, hi, RES, max_verts=8192, max_faces=16384)
    v2 = np.asarray(mesh2.verts)[np.asarray(mesh2.vert_mask) > 0]
    r = np.linalg.norm(v2, axis=-1)
    assert abs(r.mean() - 0.7) < 0.02


def test_marching_tets_host_matches_jax():
    sdf, _ = sphere_sdf()
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    hv, hf = marching_tets_host(np.asarray(sdf), [-BOUND] * 3, [BOUND] * 3, RES)
    assert hv.shape[0] == int(mesh.num_verts)
    assert hf.shape[0] == int(mesh.num_faces)
    # same vertex sets (order may differ; match by nearest neighbor since
    # fp32-vs-fp64 jitter makes lexicographic pairing unstable)
    jv = np.asarray(mesh.verts)[: hv.shape[0]]
    d = np.linalg.norm(hv[:, None] - jv[None], axis=-1)
    assert d.min(axis=1).max() < 1e-4


def test_empty_sdf_gives_empty_mesh():
    xyz, _, _ = generate_dense_grid_points([-BOUND] * 3, [BOUND] * 3, RES)
    sdf = jnp.ones(xyz.shape[0])  # all outside
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=1024, max_faces=2048)
    assert int(mesh.num_verts) == 0 and int(mesh.num_faces) == 0


def test_vertex_normals_and_edges():
    sdf, _ = sphere_sdf()
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    vn = np.asarray(vertex_normals(mesh))
    m = np.asarray(mesh.vert_mask) > 0
    v = np.asarray(mesh.verts)[m]
    radial = v / np.linalg.norm(v, axis=-1, keepdims=True)
    cos = (vn[m] * radial).sum(-1)
    assert cos.mean() > 0.97  # smooth outward normals

    edges, emask = mesh_edges(mesh.faces, mesh.face_mask)
    assert edges.shape[0] == mesh.faces.shape[0] * 3


def test_marching_tets_face_ids_stay_in_range():
    """Regression: jnp.nonzero pad rows (fill_value=0) must not clobber
    slot_of_key[0] — a corner-touching surface whose edge key 0 is active
    previously produced faces referencing slot max_verts-1, which dangles
    after host truncation to num_verts (crashed geometry/postprocess)."""
    xyz, _, _ = generate_dense_grid_points([-BOUND] * 3, [BOUND] * 3, RES)
    # sphere centered at the grid's first corner: edge key 0 crosses it
    corner = np.array([-BOUND, -BOUND, -BOUND], np.float32)
    sdf = jnp.linalg.norm(xyz - corner, axis=-1) - 0.5
    mesh = marching_tets(sdf, jnp.asarray([-BOUND] * 3), jnp.asarray([BOUND] * 3),
                         RES, max_verts=8192, max_faces=16384)
    nv, nf = int(mesh.num_verts), int(mesh.num_faces)
    assert nv > 0 and nf > 0
    faces = np.asarray(mesh.faces)[:nf]
    assert faces.max() < nv, (faces.max(), nv)
    assert faces.min() >= 0


def test_postprocess_drops_out_of_range_faces():
    from followmyhold_tpu.geometry.postprocess import remove_floaters

    verts = np.eye(3, dtype=np.float32)
    faces = np.asarray([[0, 1, 2], [0, 1, 9999]], np.int32)
    v, f = remove_floaters(verts, faces)
    assert len(f) == 1 and f.max() < len(v)


def test_marching_tets_host_native_matches_numpy(monkeypatch):
    """The C++ emission path must produce the same geometry as the numpy
    path (vertex/face sets; ordering may differ)."""
    import followmyhold_tpu.native as native
    from followmyhold_tpu.ops import surface

    if native.get_lib() is None:
        import pytest

        pytest.skip("no native toolchain")
    sdf, _ = sphere_sdf()
    s = np.asarray(sdf)
    nv, nf = marching_tets_host(s, [-BOUND] * 3, [BOUND] * 3, RES)
    monkeypatch.setattr(native, "marching_tets_cells",
                        lambda *a, **k: None)
    pv, pf = marching_tets_host(s, [-BOUND] * 3, [BOUND] * 3, RES)
    assert nv.shape == pv.shape and nf.shape == pf.shape
    d = np.linalg.norm(nv[:, None] - pv[None], axis=-1)
    assert d.min(axis=1).max() < 1e-5
    # same triangles as vertex-coordinate sets
    def canon(v, f):
        tri = np.sort(np.round(v[f] * 1e5).astype(np.int64).reshape(len(f), 9),
                      axis=1)
        return set(map(tuple, tri))
    assert canon(nv, nf) == canon(pv, pf)
