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


# --------------------------------------------------------------------------- #
# Pallas path: interpret-mode parity vs the XLA path (values + gradients)
# --------------------------------------------------------------------------- #

import functools
from contextlib import contextmanager

from jax.experimental import pallas as pl

from followmyhold_tpu.ops import rasterizer as R


@contextmanager
def _pallas_interpret_on_cpu(monkeypatch_like=None):
    orig_call = pl.pallas_call
    orig_on_tpu = R._on_tpu
    pl.pallas_call = functools.partial(orig_call, interpret=True)
    R._on_tpu = lambda: True
    # the factory caches compiled-call closures; clear so the patched
    # (interpret) pallas_call is captured
    R._raster_tiles_pallas.cache_clear()
    try:
        yield
    finally:
        pl.pallas_call = orig_call
        R._on_tpu = orig_on_tpu
        R._raster_tiles_pallas.cache_clear()


def _irregular_mesh(n_tri=40, seed=5):
    """Random small triangles in front of the camera, no grid alignment."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.8, 0.8, (n_tri, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(-4.0, -2.0, n_tri)
    offs = rng.uniform(-0.25, 0.25, (n_tri, 3, 3)).astype(np.float32)
    offs[:, :, 2] *= 0.1
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    normals = rng.normal(size=(3 * n_tri, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mask = np.ones(n_tri, np.float32)
    return (jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            jnp.asarray(mask))


def test_pallas_raster_matches_xla_forward():
    v, f, n, m = _irregular_mesh()
    ref = rasterize(CAM, v, f, n, m, faces_per_tile=64, force_xla=True)
    with _pallas_interpret_on_cpu():
        out = rasterize(CAM, v, f, n, m, faces_per_tile=64)
    ref_mask = np.asarray(ref.face_id >= 0)
    out_mask = np.asarray(out.face_id >= 0)
    # coverage identical except possibly exact-tie pixels
    assert (ref_mask != out_mask).mean() < 0.001
    both = ref_mask & out_mask
    np.testing.assert_allclose(np.asarray(out.zbuf)[both],
                               np.asarray(ref.zbuf)[both], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=5e-3)
    # normals agree wherever the same face won
    same = both & (np.asarray(ref.face_id) == np.asarray(out.face_id))
    assert same.mean() > 0.99 * both.mean()
    np.testing.assert_allclose(np.asarray(out.normal)[same],
                               np.asarray(ref.normal)[same], atol=1e-3)


def test_pallas_raster_matches_xla_gradients():
    v, f, n, m = _irregular_mesh(n_tri=12, seed=7)
    tgt_a = jnp.zeros((128, 128)).at[40:90, 40:90].set(1.0)
    tgt_n = jnp.zeros((128, 128, 3)).at[..., 2].set(0.5)

    def loss(verts, normals, force_xla):
        out = rasterize(CAM, verts, f, normals, m, faces_per_tile=64,
                        force_xla=force_xla)
        return (jnp.sum((out.alpha - tgt_a) ** 2)
                + jnp.sum((out.normal - tgt_n) ** 2)
                + jnp.sum(jnp.where(out.face_id >= 0, out.zbuf, 0.0)))

    gv_ref, gn_ref = jax.grad(lambda a, b: loss(a, b, True), (0, 1))(v, n)
    with _pallas_interpret_on_cpu():
        gv, gn = jax.grad(lambda a, b: loss(a, b, False), (0, 1))(v, n)

    # gradients are dense sums over pixels; boundary-tie pixels may differ, so
    # compare with a tolerance scaled to the gradient magnitude
    ref_scale = float(jnp.abs(gv_ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_ref),
                               atol=2e-2 * ref_scale)
    nscale = float(jnp.abs(gn_ref).max()) + 1e-6
    np.testing.assert_allclose(np.asarray(gn), np.asarray(gn_ref),
                               atol=2e-2 * nscale)


def test_pallas_raster_rect_tile_matches_square(monkeypatch):
    """Rectangular pixel tiles (FOHO_RASTER_TILE) are value-identical to the
    128x128 default: per-pixel winner/depth tests don't depend on the tiling
    and each tile's face list keeps the same ascending order, so even the
    visibility product multiplies in the same order."""
    import os as _os

    v, f, n, m = _irregular_mesh(n_tri=40, seed=11)
    with _pallas_interpret_on_cpu():
        ref = rasterize(CAM, v, f, n, m, faces_per_tile=64)
    for shape in ("32x128", "8x128"):
        monkeypatch.setenv("FOHO_RASTER_TILE", shape)
        rasterize.clear_cache()
        R._raster_tiles_pallas.cache_clear()
        try:
            with _pallas_interpret_on_cpu():
                out = rasterize(CAM, v, f, n, m, faces_per_tile=64)
        finally:
            monkeypatch.delenv("FOHO_RASTER_TILE")
            rasterize.clear_cache()
            R._raster_tiles_pallas.cache_clear()
        np.testing.assert_array_equal(np.asarray(out.face_id),
                                      np.asarray(ref.face_id), err_msg=shape)
        np.testing.assert_allclose(np.asarray(out.zbuf), np.asarray(ref.zbuf),
                                   atol=1e-6, err_msg=shape)
        np.testing.assert_allclose(np.asarray(out.alpha),
                                   np.asarray(ref.alpha), atol=1e-6,
                                   err_msg=shape)


def test_pallas_raster_empty_and_overflow():
    """No faces at all, and more faces than capacity, both stay finite."""
    v, f, n, m = _irregular_mesh(n_tri=30, seed=9)
    with _pallas_interpret_on_cpu():
        out = rasterize(CAM, v, f, n, jnp.zeros_like(m), faces_per_tile=64)
        assert int((out.face_id >= 0).sum()) == 0
        assert float(out.alpha.max()) == 0.0
        out2 = rasterize(CAM, v, f, n, m, faces_per_tile=8)  # overflow capacity
        assert np.isfinite(np.asarray(out2.zbuf)).all()


def test_bin_max_overflow_indicator():
    """RasterOut.bin_max is the TRUE (pre-clamp) per-tile face count: it must
    exceed the capacity when faces are dropped and be capacity-independent,
    so callers can detect silent drops (the r4 sweep measured 16216 faces in
    one 128x128 tile on the 61k-face bench mesh vs the old 8192 cap)."""
    v, f, n, m = _irregular_mesh(n_tri=30, seed=9)
    ample = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=64, chunk=16)
    tight = rasterize(CAM, v, f, n, m, tile=64, faces_per_tile=8, chunk=8)
    true_max = int(ample.bin_max)
    assert true_max > 8                       # this mesh overflows cap=8
    assert int(tight.bin_max) == true_max     # indicator ignores the clamp
    # overflow visibly degrades the render (faces dropped somewhere)
    assert int((tight.face_id >= 0).sum()) < int((ample.face_id >= 0).sum())
    # invalid faces don't count toward bins
    empty = rasterize(CAM, v, f, n, jnp.zeros_like(m), tile=64,
                      faces_per_tile=64, chunk=16)
    assert int(empty.bin_max) == 0
