"""Dense SDF-query grids (reference generate_dense_grid_points,
pipelines.py:341-360)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def generate_dense_grid_points(
    bbox_min,
    bbox_max,
    octree_resolution: int,
) -> Tuple[jnp.ndarray, Tuple[int, int, int], jnp.ndarray]:
    """Regular (R+1)^3 grid over the bbox, 'ij' indexing, flattened [N, 3].

    Returns (xyz [N,3], grid_size, length) exactly like the reference.
    Uses numpy for the static linspace (resolution is a Python int) and
    returns a jnp array.
    """
    bbox_min = np.asarray(bbox_min, dtype=np.float32)
    bbox_max = np.asarray(bbox_max, dtype=np.float32)
    n = int(octree_resolution) + 1
    axes = [np.linspace(bbox_min[d], bbox_max[d], n, dtype=np.float32) for d in range(3)]
    xs, ys, zs = np.meshgrid(*axes, indexing="ij")
    xyz = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
    return jnp.asarray(xyz), (n, n, n), jnp.asarray(bbox_max - bbox_min)


def generate_grid_jax(bbox_min: jnp.ndarray, bbox_max: jnp.ndarray,
                      octree_resolution: int) -> jnp.ndarray:
    """Traceable version: bbox bounds may be traced arrays (dynamic bbox,
    static resolution). Used by the shared-grid SDF intersection loss
    (reference utilz/kaolin_sdf_ops.py:131-160)."""
    n = int(octree_resolution) + 1
    t = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    ax = bbox_min[0] + t * (bbox_max[0] - bbox_min[0])
    ay = bbox_min[1] + t * (bbox_max[1] - bbox_min[1])
    az = bbox_min[2] + t * (bbox_max[2] - bbox_min[2])
    xs, ys, zs = jnp.meshgrid(ax, ay, az, indexing="ij")
    return jnp.stack([xs, ys, zs], axis=-1).reshape(-1, 3)
