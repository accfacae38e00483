"""Guidance losses, fp32 with NaN guards.

JAX equivalents of the reference loss zoo:
- normal_alignment_loss          (pipelines.py:178-186)
- honerf_intersection_loss       (pipelines.py:231-239)
- silhouette BCE / disparity L1 / kps MSE (pipelines.py:1338-1341)
- mesh_edge_loss                 (pytorch3d.loss, used at pipelines.py:1430)
- attraction (clamped knn)       (pipelines.py:1529-1541)
- compute_loss_stable_fp32       (pipelines.py:1001-1018)

All reductions run in float32; where the reference skips NaN terms with
Python control flow, we mask with jnp.where so everything stays jittable.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from followmyhold_tpu.ops.safe import safe_norm, safe_normalize


def _normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # Matches torch.nn.functional.normalize semantics with a NaN-safe gradient
    # at zero vectors (double-where; see ops/safe.py).
    return safe_normalize(x, axis=axis, eps=eps)


def normal_alignment_loss(
    rendered_normals: jnp.ndarray,
    gt_normals: jnp.ndarray,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean (1 - cos) between unit normals over valid pixels."""
    r = _normalize(rendered_normals.astype(jnp.float32))
    g = _normalize(gt_normals.astype(jnp.float32))
    loss = 1.0 - jnp.sum(r * g, axis=-1)
    if valid_mask is None:
        return loss.mean()
    w = valid_mask.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """L1; when mask given, matches the reference's F.l1_loss(pred, target*mask)
    pattern (mean over ALL pixels of |pred - target*mask|)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is not None:
        target = target * mask.astype(jnp.float32)
    return jnp.abs(pred - target).mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean()


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray,
                         eps: float = 1e-7) -> jnp.ndarray:
    """Matches F.binary_cross_entropy on probabilities (clamped logs)."""
    p = jnp.clip(pred.astype(jnp.float32), eps, 1.0 - eps)
    t = target.astype(jnp.float32)
    return -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p)).mean()


def honerf_intersection_loss(sdf_hand: jnp.ndarray, sdf_obj: jnp.ndarray) -> jnp.ndarray:
    """(# grid points inside both hand and object) / 1000 (pipelines.py:231-239).

    Count is non-differentiable in the reference too (integer sum); kept
    identical. Returns float32.
    """
    inside_obj = sdf_obj < 0
    inside_hand = sdf_hand < 0
    return jnp.sum(inside_obj & inside_hand).astype(jnp.float32) / 1000.0


def soft_intersection_loss(sdf_hand: jnp.ndarray, sdf_obj: jnp.ndarray) -> jnp.ndarray:
    """Differentiable variant (reference safe_intersection_loss,
    pipelines.py:204-228): mean(relu(-sdf_h) * relu(-sdf_o))."""
    occ_h = jnp.maximum(-sdf_hand.astype(jnp.float32), 0.0)
    occ_o = jnp.maximum(-sdf_obj.astype(jnp.float32), 0.0)
    loss = jnp.mean(occ_h * occ_o)
    return jnp.where(jnp.isnan(loss), 0.0, loss)


def attraction_loss(dists_sq_hand_to_obj: jnp.ndarray, margin: float = 0.01,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean(clamp(d - margin, 0)) over hand verts (pipelines.py:1539-1541).

    Takes SQUARED distances as knn returns them (pytorch3d knn_points also
    returns squared distances — the reference feeds those directly).
    """
    d = dists_sq_hand_to_obj.astype(jnp.float32)
    attract = jnp.maximum(d - margin, 0.0)
    if mask is None:
        return attract.mean()
    w = mask.astype(jnp.float32)
    return jnp.sum(attract * w) / jnp.maximum(jnp.sum(w), 1.0)


def mesh_edge_loss(verts: jnp.ndarray, edges: jnp.ndarray,
                   edge_mask: Optional[jnp.ndarray] = None,
                   target_length: float = 0.0) -> jnp.ndarray:
    """Mean squared edge length (pytorch3d.loss.mesh_edge_loss semantics).

    edges: [E, 2] vertex indices (padded edges point at vertex 0 and are
    masked out).
    """
    v0 = verts[edges[:, 0]]
    v1 = verts[edges[:, 1]]
    length = safe_norm(v0 - v1, axis=-1)  # padded edges are zero-length
    loss = jnp.square(length - target_length)
    if edge_mask is None:
        return loss.mean()
    w = edge_mask.astype(jnp.float32)
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w), 1.0)


def verts_reg_loss(verts: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mean(v^2) over valid verts (pipelines.py:1424)."""
    sq = jnp.square(verts.astype(jnp.float32)).mean(axis=-1)
    if mask is None:
        return sq.mean()
    w = mask.astype(jnp.float32)
    return jnp.sum(sq * w) / jnp.maximum(jnp.sum(w), 1.0)


def combine_losses_fp32(loss_terms: Dict[str, jnp.ndarray],
                        weights: Dict[str, float]) -> jnp.ndarray:
    """Weighted fp32 sum; NaN terms contribute zero (pipelines.py:1001-1018)."""
    total = jnp.asarray(0.0, jnp.float32)
    for name, value in loss_terms.items():
        v = value.astype(jnp.float32)
        v = jnp.where(jnp.isnan(v), 0.0, v)
        total = total + weights.get(name, 1.0) * v
    return total
