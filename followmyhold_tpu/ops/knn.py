"""Nearest-neighbor queries as XLA-friendly pairwise reductions.

Replaces pytorch3d.ops.knn_points (guidance attraction loss,
pipelines.py:1529-1541) and scipy cKDTree queries (ICP correspondence,
mesh_align.py:111). On TPU the pairwise-distance matrix IS the fast path:
it is one matmul-shaped contraction on the MXU, no tree needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,3] x [M,3] -> [N,M] squared distances.

    Direct (a-b)^2 expansion: exact in fp32 and better for TPU than the
    |a|^2+|b|^2-2ab matmul trick, which (a) catastrophically cancels for
    near-coincident points and (b) wastes the MXU on a K=3 contraction.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def nn_sqdist(
    query: jnp.ndarray,
    points: jnp.ndarray,
    points_mask: Optional[jnp.ndarray] = None,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point: (squared distance, index) of nearest point.

    points_mask masks out padded points. Chunked over queries with lax.map so
    the [chunk, M] distance tile stays in VMEM-friendly sizes.
    """
    n = query.shape[0]
    big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)

    def one_chunk(q):
        d = pairwise_sqdist(q, points)
        if points_mask is not None:
            d = jnp.where(points_mask[None, :].astype(bool), d, big)
        idx = jnp.argmin(d, axis=-1)
        return jnp.min(d, axis=-1), idx

    if n <= chunk:
        return one_chunk(query)

    pad = (-n) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, 3)
    dists, idxs = jax.lax.map(one_chunk, q)
    return dists.reshape(-1)[:n], idxs.reshape(-1)[:n]


def knn(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    points_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k nearest neighbors: (squared distances [N,k], indices [N,k])."""
    d = pairwise_sqdist(query, points)
    if points_mask is not None:
        big = jnp.asarray(jnp.finfo(jnp.float32).max, jnp.float32)
        d = jnp.where(points_mask[None, :].astype(bool), d, big)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx
