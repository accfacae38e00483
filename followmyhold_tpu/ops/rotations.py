"""Rotation representations in pure JAX.

Covers the conversions the reference pulls from pytorch3d.transforms
(pipelines.py:151) and hamer.utils.geometry (rot6d: geometry.py:47):
quaternion (wxyz) / axis-angle / 6d-rotation <-> rotation matrix.

All functions are batched over leading dimensions and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from followmyhold_tpu.ops.safe import safe_normalize


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) [..., 4] -> rotation matrix [..., 3, 3].

    Normalizes the quaternion first (guidance optimizes raw quaternions, so
    they drift off the unit sphere; pytorch3d does the same normalization).
    """
    quat = safe_normalize(quat)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> wxyz quaternion [..., 4] (w >= 0).

    Branch-free Shepperd-style construction: compute all four candidate
    quaternions and pick the best-conditioned one with where-selects, so it
    jits with no data-dependent control flow.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidates, indexed by which diagonal term dominates.
    qw = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                    1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    qw = jnp.maximum(qw, 1e-12)
    q = jnp.sqrt(qw) * 0.5

    cand = jnp.stack(
        [
            jnp.stack([q[..., 0], (m21 - m12) / (4 * q[..., 0]),
                       (m02 - m20) / (4 * q[..., 0]), (m10 - m01) / (4 * q[..., 0])], axis=-1),
            jnp.stack([(m21 - m12) / (4 * q[..., 1]), q[..., 1],
                       (m01 + m10) / (4 * q[..., 1]), (m02 + m20) / (4 * q[..., 1])], axis=-1),
            jnp.stack([(m02 - m20) / (4 * q[..., 2]), (m01 + m10) / (4 * q[..., 2]),
                       q[..., 2], (m12 + m21) / (4 * q[..., 2])], axis=-1),
            jnp.stack([(m10 - m01) / (4 * q[..., 3]), (m02 + m20) / (4 * q[..., 3]),
                       (m12 + m21) / (4 * q[..., 3]), q[..., 3]], axis=-1),
        ],
        axis=-2,
    )  # [..., 4(candidate), 4(wxyz)]
    best = jnp.argmax(qw, axis=-1)
    quat = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    # Canonical sign: w >= 0
    return quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle [..., 3] -> wxyz quaternion [..., 4].

    Uses sinc(angle/2) so the zero-angle limit is exact and differentiable
    (same route HaMeR takes in aa_to_rotmat, geometry.py:5-21).
    """
    sq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sq < 1e-12
    # double-where keeps the gradient of sqrt finite at zero
    angle = jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, sq)))
    half = angle * 0.5
    # sin(half)/angle, stable at 0: equals 0.5 * sinc(half/pi)
    k = jnp.where(small, 0.5 - sq / 48.0,
                  jnp.sin(half) / jnp.where(small, 1.0, angle))
    w = jnp.cos(half)
    return jnp.concatenate([w, axis_angle * k], axis=-1)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector(s) [..., 3] -> rotation matrix (via quaternion,
    which is numerically tighter in fp32 than the direct Rodrigues form)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    quat = matrix_to_quaternion(matrix)
    return quaternion_to_axis_angle(quat)


def quaternion_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w = jnp.clip(quat[..., :1], -1.0, 1.0)
    xyz = quat[..., 1:]
    norm = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2 * jnp.arctan2(norm, w)
    small = norm < 1e-8
    axis = xyz / jnp.where(small, 1.0, norm)
    return jnp.where(small, jnp.zeros_like(xyz), axis * angle)


def rot6d_to_matrix(rot6d: jnp.ndarray) -> jnp.ndarray:
    """6d rotation [..., 6] -> matrix [..., 3, 3] (Zhou et al. CVPR'19).

    Matches HaMeR's packing (hamer/utils/geometry.py:47-61): the 6 values are
    the first two COLUMNS of the matrix stored contiguously — a1 = x[0:3],
    a2 = x[3:6]. Gram-Schmidt gives b1, b2 and b3 = b1 x b2 (the columns of R).
    """
    a = rot6d.reshape(*rot6d.shape[:-1], 2, 3)
    a1, a2 = a[..., 0, :], a[..., 1, :]
    # eps-guarded norms: degenerate inputs (e.g. zero-initialized heads)
    # fall back toward identity instead of NaN
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rot6d.dtype), (*a1.shape, 3))
    a1 = a1 + eye[..., 0, :] * 1e-6
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - proj + eye[..., 1, :] * 1e-6
    b2 = b2 / jnp.maximum(jnp.linalg.norm(b2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def matrix_to_rot6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Inverse packing of rot6d_to_matrix: [col1(3), col2(3)] concatenated."""
    return jnp.concatenate([matrix[..., :, 0], matrix[..., :, 1]], axis=-1)
