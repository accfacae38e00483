"""TPU-native ICP with similarity Procrustes.

Replaces the reference's trimesh/scipy ICP (alignment/mesh_align.py:56-175):
- correspondence = dense nearest-neighbor argmin on device (ops.knn),
- Procrustes = Umeyama similarity fit via SVD,
- outlier rejection = drop the worst `outliers` fraction each iteration,
- scale clamped to [min_scale, max_scale] per iteration (mesh_align.py:131-135),
- optional restarts over 9 axis-aligned rotations + 7 reflections
  (mesh_align.py:37-54) evaluated with lax.map.

The whole solve is one jitted program; iterations are a lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.knn import nn_sqdist
from followmyhold_tpu.ops.precision import matmul_f32


def procrustes(
    p: jnp.ndarray,
    q: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    scale: bool = True,
) -> jnp.ndarray:
    """Weighted similarity Procrustes: 4x4 T minimizing ||T(p) - q||.

    Umeyama (1991) with reflection disallowed (det correction), matching
    trimesh.registration.procrustes(reflection=False, scale=True).
    """
    p = p.astype(jnp.float32)
    q = q.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(p.shape[0], jnp.float32)
    w = weights / jnp.maximum(weights.sum(), 1e-12)

    mu_p = jnp.sum(p * w[:, None], axis=0)
    mu_q = jnp.sum(q * w[:, None], axis=0)
    pc = p - mu_p
    qc = q - mu_q

    cov = matmul_f32((qc * w[:, None]).T, pc)          # [3,3]
    u, s, vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    diag = jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d])
    r = matmul_f32(u * diag[None, :], vt)

    var_p = jnp.sum(w * jnp.sum(pc * pc, axis=-1))
    if scale:
        s_fit = jnp.sum(s * diag) / jnp.maximum(var_p, 1e-12)
    else:
        s_fit = jnp.asarray(1.0, jnp.float32)

    t = mu_q - s_fit * matmul_f32(r, mu_p[:, None])[:, 0]
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(s_fit * r)
    T = T.at[:3, 3].set(t)
    return T


def _apply(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    return matmul_f32(pts, T[:3, :3].T) + T[:3, 3]


def _clamp_scale(T: jnp.ndarray, min_scale: float, max_scale: float) -> jnp.ndarray:
    s = jnp.linalg.norm(T[:3, 0])
    s_clamped = jnp.clip(s, min_scale, max_scale)
    R = T[:3, :3] / jnp.maximum(s, 1e-12)
    return T.at[:3, :3].set(R * s_clamped)


class IcpResult(NamedTuple):
    transform: jnp.ndarray  # [4,4]
    cost: jnp.ndarray       # scalar


def icp(
    source_points: jnp.ndarray,
    target_points: jnp.ndarray,
    n_iter: int,
    init_transforms: Optional[jnp.ndarray] = None,
    outliers: float = 0.0,
    fixed_scale: bool = False,
    min_scale: float = 0.5,
    max_scale: float = 2.0,
) -> IcpResult:
    """Run ICP from each init transform; return the best (reference :97-151).

    source/target: [N,3]/[M,3] pre-sampled point sets.
    init_transforms: [C,4,4]; defaults to identity only.
    """
    if init_transforms is None:
        init_transforms = jnp.eye(4, dtype=jnp.float32)[None]

    n = source_points.shape[0]
    n_outliers = int(outliers * n)
    n_inliers = n - n_outliers

    def run_one(cube: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def body(carry, _):
            transform, best_cost, best_T = carry
            p = _apply(transform, source_points)
            d2, qi = nn_sqdist(p, target_points)
            dist = jnp.sqrt(d2)
            q = target_points[qi]

            if n_outliers > 0:
                # Weight out the worst n_outliers correspondences; cost over
                # inliers only (reference mesh_align.py:114-121).
                thresh = jnp.sort(dist)[n_inliers - 1]
                w = (dist <= thresh).astype(jnp.float32)
                cost = jnp.sum(dist * w) / jnp.maximum(w.sum(), 1.0)
            else:
                w = jnp.ones_like(dist)
                cost = dist.mean()

            step = procrustes(p, q, weights=w, scale=not fixed_scale)
            transform = matmul_f32(step, transform)
            if not fixed_scale:
                transform = _clamp_scale(transform, min_scale, max_scale)

            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_T = jnp.where(better, transform, best_T)
            return (transform, best_cost, best_T), None

        init = (cube, jnp.asarray(jnp.inf, jnp.float32), cube)
        (final_T, best_cost, best_T), _ = jax.lax.scan(body, init, None, length=n_iter)
        return best_T, best_cost

    if init_transforms.shape[0] == 1:
        best_T, best_cost = run_one(init_transforms[0])
        return IcpResult(best_T, best_cost)

    transforms, costs = jax.lax.map(run_one, init_transforms)
    best = jnp.argmin(costs)
    return IcpResult(transforms[best], costs[best])


def axis_aligned_restarts(include_identity: bool = True,
                          rotations: bool = True,
                          reflections: bool = True) -> np.ndarray:
    """The 1 + 9 + 7 restart cubes of the reference (mesh_align.py:37-54,69-73)."""
    cubes = []
    if include_identity:
        cubes.append(np.eye(4))
    if reflections:
        for diag in ([1, 1, -1], [1, -1, 1], [-1, 1, 1], [-1, -1, 1],
                     [-1, 1, -1], [1, -1, -1], [-1, -1, -1]):
            cubes.append(np.eye(4) * np.append(diag, 1))
    if rotations:
        for coord in range(3):
            axis = np.zeros(3)
            axis[coord] = 1
            for angle in (-np.pi / 2, np.pi, np.pi / 2):
                c, s = np.cos(angle), np.sin(angle)
                K = np.array([[0, -axis[2], axis[1]],
                              [axis[2], 0, -axis[0]],
                              [-axis[1], axis[0], 0]])
                R = np.eye(3) + s * K + (1 - c) * (K @ K)
                T = np.eye(4)
                T[:3, :3] = R
                cubes.append(T)
    return np.stack(cubes).astype(np.float32)


def compute_init_transform(
    source_points: np.ndarray,
    target_points: np.ndarray,
    fixed_scale: bool = False,
) -> np.ndarray:
    """Centroid translation + bbox-diagonal scale init (mesh_align.py:25-35)."""
    sc = source_points.mean(axis=0)
    tc = target_points.mean(axis=0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = tc - sc
    if fixed_scale:
        return T
    s_scale = np.linalg.norm(source_points.max(axis=0) - source_points.min(axis=0))
    t_scale = np.linalg.norm(target_points.max(axis=0) - target_points.min(axis=0))
    scale = float(t_scale / max(s_scale, 1e-12))
    S = np.eye(4, dtype=np.float32)
    S[:3, :3] *= scale
    S[:3, 3] = sc - scale * sc
    return T @ S


def sample_surface(
    verts: np.ndarray, faces: np.ndarray, count: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform surface sampling (host-side, numpy).

    Replaces trimesh.sample.sample_surface_even (mesh_align.py:79).
    """
    rng = np.random.default_rng(seed)
    tri = verts[faces]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=-1)
    total = area.sum()
    if total <= 0:
        idx = rng.integers(0, len(faces), count)
    else:
        idx = rng.choice(len(faces), size=count, p=area / total)
    u = rng.random((count, 1))
    v = rng.random((count, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[idx]
    return (t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])).astype(np.float32)
