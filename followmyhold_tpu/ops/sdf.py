"""Differentiable mesh -> SDF on a padded triangle soup.

Replaces Kaolin's point_to_mesh_distance + check_sign
(reference utilz/kaolin_sdf_ops.py:88-109):

- unsigned distance: exact point-triangle distance, min over faces,
  computed as a chunked dense reduction (no BVH — at 65^3 x few-k faces the
  dense form is one big VPU/MXU-friendly pass, SURVEY.md §2c),
- sign: generalized winding number (Jacobson et al. 2013), robust for the
  open/damaged meshes FlexiCubes can emit and fully differentiable.

All functions take (verts [V,3], faces [F,3], face_mask [F]) padded buffers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def point_triangle_sqdist(points: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Exact squared distance from [N,3] points to [F,3,3] triangles -> [N,F].

    Ericson's real-time-collision-detection closest-point construction,
    vectorized and branch-free (where-selects instead of region branches).
    """
    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]      # [F,3]
    ab = b - a
    ac = c - a
    p = points[:, None, :]                          # [N,1,3]
    ap = p - a[None]

    d1 = jnp.sum(ab[None] * ap, axis=-1)            # [N,F]
    d2 = jnp.sum(ac[None] * ap, axis=-1)
    bp = p - b[None]
    d3 = jnp.sum(ab[None] * bp, axis=-1)
    d4 = jnp.sum(ac[None] * bp, axis=-1)
    cp = p - c[None]
    d5 = jnp.sum(ab[None] * cp, axis=-1)
    d6 = jnp.sum(ac[None] * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-20
    # barycentric candidates for each region
    v_edge_ab = d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3)
    w_edge_ac = d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6)
    w_edge_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps, (d4 - d3) + (d5 - d6)
    )
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < eps, eps, denom)
    v_in = vb / denom
    w_in = vc / denom

    # region masks (mutually exclusive by construction order)
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    v = v_in
    w = w_in
    v = jnp.where(on_bc, 1.0 - w_edge_bc, v)
    w = jnp.where(on_bc, w_edge_bc, w)
    v = jnp.where(on_ac, 0.0, v)
    w = jnp.where(on_ac, w_edge_ac, w)
    v = jnp.where(on_ab, v_edge_ab, v)
    w = jnp.where(on_ab, 0.0, w)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    closest = a[None] + v[..., None] * ab[None] + w[..., None] * ac[None]
    diff = p - closest
    return jnp.sum(diff * diff, axis=-1)


def winding_number(points: jnp.ndarray, verts: jnp.ndarray, faces: jnp.ndarray,
                   face_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Generalized winding number of [N,3] points w.r.t. the mesh -> [N].

    ~0 outside, ~1 inside (for consistently wound closed meshes).
    """
    tri = verts[faces]                               # [F,3,3]
    a = tri[:, 0][None] - points[:, None]            # [N,F,3]
    b = tri[:, 1][None] - points[:, None]
    c = tri[:, 2][None] - points[:, None]
    la = jnp.linalg.norm(a, axis=-1)
    lb = jnp.linalg.norm(b, axis=-1)
    lc = jnp.linalg.norm(c, axis=-1)
    det = jnp.sum(a * jnp.cross(b, c), axis=-1)
    denom = (
        la * lb * lc
        + jnp.sum(a * b, axis=-1) * lc
        + jnp.sum(b * c, axis=-1) * la
        + jnp.sum(c * a, axis=-1) * lb
    )
    omega = 2.0 * jnp.arctan2(det, denom)            # solid angle per face
    if face_mask is not None:
        omega = omega * face_mask[None].astype(omega.dtype)
    return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)


def mesh_to_sdf(
    points: jnp.ndarray,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    face_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> jnp.ndarray:
    """Signed distance of [N,3] query points to the mesh (negative inside).

    Parity with reference mesh2sdf (kaolin_sdf_ops.py:88-109): distance from
    point_to_mesh_distance, sign from inside-test (winding > 0.5 == inside).
    """
    tri = verts[faces]

    def one_chunk(p):
        d2 = point_triangle_sqdist(p, tri)
        if face_mask is not None:
            big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
            d2 = jnp.where(face_mask[None, :].astype(bool), d2, big)
        dist = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 1e-20))
        wn = winding_number(p, verts, faces, face_mask)
        sign = jnp.where(wn > 0.5, -1.0, 1.0)
        return dist * sign

    n = points.shape[0]
    if n <= chunk:
        return one_chunk(points)
    pad = (-n) % chunk
    p = jnp.pad(points, ((0, pad), (0, 0)))
    out = jax.lax.map(one_chunk, p.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def shared_grid_sdfs(
    verts1: jnp.ndarray, faces1: jnp.ndarray, mask1: Optional[jnp.ndarray],
    verts2: jnp.ndarray, faces2: jnp.ndarray, mask2: Optional[jnp.ndarray],
    vert_mask1: Optional[jnp.ndarray] = None,
    vert_mask2: Optional[jnp.ndarray] = None,
    resolution: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """SDFs of two meshes on one shared grid spanning their joint bbox.

    Parity with get_sdf_of_meshes (kaolin_sdf_ops.py:131-160); used by the
    intersection loss in guidance phase 2.
    """
    from followmyhold_tpu.ops.grid import generate_grid_jax

    def _bounds(v, m):
        if m is None:
            return v.min(axis=0), v.max(axis=0)
        big = jnp.asarray(jnp.finfo(v.dtype).max, v.dtype)
        mm = m[:, None].astype(bool)
        return (jnp.where(mm, v, big).min(axis=0),
                jnp.where(mm, v, -big).max(axis=0))

    lo1, hi1 = _bounds(verts1, vert_mask1)
    lo2, hi2 = _bounds(verts2, vert_mask2)
    lo = jnp.minimum(lo1, lo2)
    hi = jnp.maximum(hi1, hi2)
    grid = generate_grid_jax(lo, hi, resolution)
    sdf1 = mesh_to_sdf(grid, verts1, faces1, mask1)
    sdf2 = mesh_to_sdf(grid, verts2, faces2, mask2)
    return sdf1, sdf2
