import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.icp import (
    IcpResult,
    axis_aligned_restarts,
    compute_init_transform,
    icp,
    procrustes,
    sample_surface,
)


def _random_similarity(seed=0, scale=1.4):
    rng = np.random.default_rng(seed)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = scale * q
    T[:3, 3] = rng.normal(size=3)
    return T


def test_procrustes_recovers_similarity():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(200, 3)).astype(np.float32)
    T_true = _random_similarity(1, scale=1.3)
    q = p @ T_true[:3, :3].T + T_true[:3, 3]
    T = np.asarray(procrustes(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(T, T_true, atol=1e-4)


def test_procrustes_weighted_ignores_outliers():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(100, 3)).astype(np.float32)
    T_true = _random_similarity(3, scale=0.9)
    q = p @ T_true[:3, :3].T + T_true[:3, 3]
    q[:10] += 100.0  # corrupt
    w = np.ones(100, np.float32)
    w[:10] = 0.0
    T = np.asarray(procrustes(jnp.asarray(p), jnp.asarray(q), jnp.asarray(w)))
    np.testing.assert_allclose(T, T_true, atol=1e-4)


def test_procrustes_no_reflection():
    rng = np.random.default_rng(4)
    p = rng.normal(size=(50, 3)).astype(np.float32)
    q = p * np.array([-1, 1, 1], np.float32)  # pure reflection
    T = np.asarray(procrustes(jnp.asarray(p), jnp.asarray(q)))
    assert np.linalg.det(T[:3, :3]) > 0


def test_icp_converges_on_rigid_offset():
    rng = np.random.default_rng(5)
    target = rng.normal(size=(500, 3)).astype(np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = [0.1, -0.05, 0.08]
    source = (target - T_true[:3, 3]).astype(np.float32)
    res = icp(jnp.asarray(source), jnp.asarray(target), n_iter=10)
    assert isinstance(res, IcpResult)
    aligned = source @ np.asarray(res.transform)[:3, :3].T + np.asarray(res.transform)[:3, 3]
    assert np.abs(aligned - target).max() < 1e-3
    assert float(res.cost) < 1e-4


def test_icp_restarts_recover_reflection_like_pose():
    # 180-degree rotated source: identity-start ICP stalls; restarts fix it.
    rng = np.random.default_rng(6)
    target = rng.normal(size=(300, 3)).astype(np.float32) * np.array([3, 1, 0.5], np.float32)
    Rz = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float32)
    source = target @ Rz.T
    cubes = axis_aligned_restarts()
    res = icp(jnp.asarray(source), jnp.asarray(target), n_iter=15,
              init_transforms=jnp.asarray(cubes))
    assert float(res.cost) < 1e-3


def test_icp_scale_clamp():
    rng = np.random.default_rng(7)
    target = rng.normal(size=(200, 3)).astype(np.float32)
    source = target * 10.0  # needs scale 0.1, below min_scale
    res = icp(jnp.asarray(source), jnp.asarray(target), n_iter=5,
              min_scale=0.7, max_scale=3.0)
    s = np.linalg.norm(np.asarray(res.transform)[:3, 0])
    assert 0.7 - 1e-4 <= s <= 3.0 + 1e-4


def test_compute_init_transform():
    rng = np.random.default_rng(8)
    src = rng.normal(size=(100, 3)).astype(np.float32)
    tgt = (src * 2.0 + np.array([5, 0, 0], np.float32)).astype(np.float32)
    T = compute_init_transform(src, tgt)
    mapped = src @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(mapped.mean(0), tgt.mean(0), atol=1e-4)
    s_scale = np.linalg.norm(mapped.max(0) - mapped.min(0))
    t_scale = np.linalg.norm(tgt.max(0) - tgt.min(0))
    np.testing.assert_allclose(s_scale, t_scale, rtol=1e-4)


def test_sample_surface_on_plane():
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pts = sample_surface(verts, faces, 500)
    assert pts.shape == (500, 3)
    assert (pts[:, 2] == 0).all()
    assert (pts[:, :2] >= 0).all() and (pts[:, :2] <= 1).all()


def test_axis_aligned_restarts_count():
    cubes = axis_aligned_restarts()
    assert cubes.shape == (17, 4, 4)  # 1 identity + 7 reflections + 9 rotations
