"""Rigid/similarity transforms over padded vertex buffers.

JAX equivalents of the reference mesh-transform helpers
(pipelines.py:95-175, 242-269). Meshes are (verts [V,3], vert_mask [V])
pytrees; the mask keeps bbox centers correct under padding.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from followmyhold_tpu.ops.precision import matmul_f32

from followmyhold_tpu.ops.rotations import quaternion_to_matrix


def masked_bbox_center(verts: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(min+max)/2 over valid vertices (reference pipelines.py:98)."""
    if mask is None:
        return (verts.min(axis=-2) + verts.max(axis=-2)) / 2.0
    big = jnp.asarray(jnp.finfo(verts.dtype).max, verts.dtype)
    m = mask[..., None].astype(bool)
    lo = jnp.where(m, verts, big).min(axis=-2)
    hi = jnp.where(m, verts, -big).max(axis=-2)
    return (lo + hi) / 2.0


def masked_centroid(verts: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if mask is None:
        return verts.mean(axis=-2)
    w = mask.astype(verts.dtype)[..., None]
    return (verts * w).sum(axis=-2) / jnp.maximum(w.sum(axis=-2), 1.0)


def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (or 3x4) transform: p' = p @ R^T + t (reference :242-250)."""
    return matmul_f32(points, T[:3, :3].T) + T[:3, 3]


def transform_around_center_w_scale(
    verts: jnp.ndarray,
    T: jnp.ndarray,
    scale: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """verts' = (scale*(v - c)) @ R^T + c + t, c = bbox center.

    Reference transform_mesh_around_center_w_scale (pipelines.py:108-118).
    """
    center = masked_bbox_center(verts, mask)
    return matmul_f32(scale * (verts - center), T[:3, :3].T) + center + T[:3, 3]


def transform_around_center(verts: jnp.ndarray, T: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference transform_mesh_around_center (pipelines.py:95-105)."""
    return transform_around_center_w_scale(verts, T, jnp.asarray(1.0, verts.dtype), mask)


def scale_trans_rot(
    verts: jnp.ndarray,
    scale: jnp.ndarray,
    trans: jnp.ndarray,
    rotation_quat_wxyz: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scale about centroid, rotate about centroid, then translate.

    Reference scale_trans_rot (pipelines.py:152-175): note scaling and
    rotation both pivot on the CENTROID here (not the bbox center).
    """
    centroid = masked_centroid(verts, mask)
    scaled = scale * (verts - centroid) + centroid
    R = quaternion_to_matrix(rotation_quat_wxyz)
    rotated = matmul_f32(scaled - centroid, R.T) + centroid
    return rotated + trans


def rt_from_quat_trans(quat_wxyz: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Build the 4x4 RT the guidance loop assembles per step
    (pipelines.py:1323-1325)."""
    R = quaternion_to_matrix(quat_wxyz)
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(trans)
    return T


def scale_around_bbox_center(verts: jnp.ndarray, scale: jnp.ndarray,
                             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Reference scale_mesh_around_bbox_center (pipelines.py:253-269)."""
    center = masked_bbox_center(verts, mask)
    return (verts - center) * scale + center
