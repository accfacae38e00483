import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followmyhold_tpu.ops.rotations import (
    axis_angle_to_matrix,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    matrix_to_rot6d,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    rot6d_to_matrix,
)


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quaternion_identity():
    np.testing.assert_allclose(
        quaternion_to_matrix(jnp.array([1.0, 0, 0, 0])), np.eye(3), atol=1e-6
    )


def test_quaternion_90deg_z():
    # 90 deg about z: w=cos(45), z=sin(45)
    s = np.sin(np.pi / 4)
    R = quaternion_to_matrix(jnp.array([s, 0, 0, s]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


def test_quat_matrix_roundtrip():
    q = random_quats(64)
    q_canon = q * np.where(q[:, :1] < 0, -1, 1)
    R = quaternion_to_matrix(jnp.asarray(q))
    q2 = matrix_to_quaternion(R)
    np.testing.assert_allclose(np.asarray(q2), q_canon, atol=1e-5)


def test_rotation_matrices_orthonormal():
    q = random_quats(32, seed=3) * 2.7  # un-normalized input
    R = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(1)
    aa = rng.normal(size=(32, 3)).astype(np.float32)
    R = axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = matrix_to_axis_angle(R)
    R2 = axis_angle_to_matrix(aa2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_axis_angle_small_angle():
    R = axis_angle_to_matrix(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)
    # gradient finite at zero
    g = jax.grad(lambda a: axis_angle_to_matrix(a).sum())(jnp.zeros(3))
    assert np.isfinite(np.asarray(g)).all()


def test_rot6d_roundtrip():
    q = random_quats(16, seed=5)
    R = quaternion_to_matrix(jnp.asarray(q))
    six = matrix_to_rot6d(R)
    R2 = rot6d_to_matrix(six)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_rot6d_matches_hamer_packing():
    """HaMeR reshapes (B,6)->(B,2,3)->transpose (geometry.py:47-61): the six
    values are [col1; col2] read row-major from a (3,2) view."""
    import torch

    def hamer_rot6d(x):
        x = x.reshape(-1, 2, 3).permute(0, 2, 1).contiguous()
        a1, a2 = x[:, :, 0], x[:, :, 1]
        b1 = torch.nn.functional.normalize(a1)
        b2 = torch.nn.functional.normalize(
            a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1
        )
        b3 = torch.cross(b1, b2, dim=-1)
        return torch.stack((b1, b2, b3), dim=-1)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(8, 6)).astype(np.float32)
    ours = np.asarray(rot6d_to_matrix(jnp.asarray(x)))
    theirs = hamer_rot6d(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quaternion_to_axis_angle():
    s = np.sin(np.pi / 4)
    aa = quaternion_to_axis_angle(jnp.array([np.cos(np.pi / 4), 0, 0, s]))
    np.testing.assert_allclose(np.asarray(aa), [0, 0, np.pi / 2], atol=1e-5)
