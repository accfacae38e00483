import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.camera import GuidanceCamera
from followmyhold_tpu.ops.rasterizer import rasterize, render_normal_and_disparity

CAM = GuidanceCamera(height=128, width=128, fov_deg=60.0)


def quad_at_z(z=-2.0, half=0.5, dz=0.0):
    """Two triangles forming a square facing the camera (GL convention:
    camera looks toward -z)."""
    verts = jnp.asarray(
        [[-half, -half, z], [half, -half, z + dz], [half, half, z], [-half, half, z]],
        jnp.float32,
    )
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    mask = jnp.ones(2)
    return verts, faces, normals, mask


def test_rasterize_quad_coverage_and_depth():
    v, f, n, m = quad_at_z(z=-2.0, half=0.5)
    out = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=64, chunk=16)
    # center pixel hit at depth 2
    assert out.face_id[64, 64] >= 0
    np.testing.assert_allclose(float(out.zbuf[64, 64]), 2.0, atol=1e-3)
    # corner empty
    assert out.face_id[2, 2] == -1
    assert float(out.zbuf[2, 2]) == -1.0
    assert float(out.alpha[64, 64]) > 0.95
    assert float(out.alpha[2, 2]) < 0.05
    # normal interpolated
    np.testing.assert_allclose(np.asarray(out.normal[64, 64]), [0, 0, 1], atol=1e-4)


def test_rasterize_projected_extent():
    # half=0.5 at z=-2 with f=(127/2)/tan(30deg): u extent = f*0.25
    v, f, n, m = quad_at_z(z=-2.0, half=0.5)
    out = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=64, chunk=16)
    cols = np.flatnonzero(np.asarray(out.face_id).max(axis=0) >= 0)
    f_px = CAM.focal_px
    expected_half_extent = f_px * 0.25
    center = 63.5
    assert abs(cols.min() - (center - expected_half_extent)) <= 1.5
    assert abs(cols.max() - (center + expected_half_extent)) <= 1.5


def test_rasterize_depth_ordering():
    # near quad occludes far quad
    v1, f1, n1, m1 = quad_at_z(z=-2.0, half=0.3)
    v2, f2, n2, m2 = quad_at_z(z=-4.0, half=0.8)
    v = jnp.concatenate([v1, v2])
    f = jnp.concatenate([f1, f2 + 4])
    n = jnp.concatenate([n1, jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))])
    m = jnp.ones(4)
    out = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=64, chunk=16)
    np.testing.assert_allclose(float(out.zbuf[64, 64]), 2.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.normal[64, 64]), [0, 0, 1], atol=1e-4)
    # outside near quad but inside far quad (far quad spans ~41.5..85.5 px,
    # near quad ~47..80 px)
    uv_far = 44
    assert out.face_id[64, uv_far] >= 2


def test_rasterize_face_mask_excludes():
    v, f, n, _ = quad_at_z()
    m = jnp.zeros(2)
    out = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=64, chunk=16)
    assert int((np.asarray(out.face_id) >= 0).sum()) == 0
    assert float(np.asarray(out.alpha).max()) < 1e-3


def test_rasterize_gradients_flow_to_verts():
    v, f, n, m = quad_at_z(z=-2.0, half=0.5, dz=-0.3)

    def mean_depth(verts):
        out = rasterize(CAM, verts, f, n, m, tile=64, faces_per_tile=64, chunk=16)
        hit = out.face_id >= 0
        return jnp.sum(jnp.where(hit, out.zbuf, 0.0)) / jnp.maximum(hit.sum(), 1)

    g = np.asarray(jax.grad(mean_depth)(v))
    assert np.isfinite(g).all()
    # depth depends on vertex z: z-gradients nonzero
    assert np.abs(g[:, 2]).sum() > 1e-3


def test_silhouette_gradient_at_boundary():
    v, f, n, m = quad_at_z(z=-2.0, half=0.5)

    def coverage(verts):
        out = rasterize(CAM, verts, f, n, m, tile=64, faces_per_tile=64,
                        chunk=16, sigma_px=1.0)
        return out.alpha.sum()

    g = np.asarray(jax.grad(coverage)(v))
    assert np.isfinite(g).all()
    # growing the quad increases coverage: gradient w.r.t. x of right verts > 0
    assert g[1, 0] > 0 and g[2, 0] > 0
    assert g[0, 0] < 0 and g[3, 0] < 0


def test_render_normal_and_disparity_semantics():
    v, f, n, m = quad_at_z(z=-2.0, half=0.5)
    n01, disp01, out = render_normal_and_disparity(CAM, v, f, n, m,
                                                   faces_per_tile=64)
    assert n01.shape == (128, 128, 3)
    assert disp01.shape == (128, 128)
    # background zero, foreground in [0,1]
    assert float(n01[2, 2].sum()) == 0.0
    assert 0.0 <= float(disp01.min()) and float(disp01.max()) <= 1.0
    # foreground disparity (1/2) >> background (1/10) after normalization
    assert float(disp01[64, 64]) > float(disp01[2, 2])
