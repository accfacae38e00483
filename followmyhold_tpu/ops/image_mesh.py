"""Point-map -> mesh utilities (host-side numpy).

Replaces utils3d.numpy.{image_mesh, depth_edge} as used by the MoGe stage
(src/foho/geometry/moge.py:136-165): grid-connect valid pixels into triangles,
dropping faces across depth discontinuities.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def depth_edge(depth: np.ndarray, rtol: float = 0.04, kernel: int = 3) -> np.ndarray:
    """True where local relative depth variation exceeds rtol (depth
    discontinuity), computed over a (kernel x kernel) window."""
    H, W = depth.shape
    pad = kernel // 2
    d = np.pad(depth, pad, mode="edge")
    dmin = np.full_like(depth, np.inf)
    dmax = np.full_like(depth, -np.inf)
    for dy in range(kernel):
        for dx in range(kernel):
            w = d[dy:dy + H, dx:dx + W]
            dmin = np.minimum(dmin, w)
            dmax = np.maximum(dmax, w)
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = (dmax - dmin) / np.maximum(dmax, 1e-12)
    return rel > rtol


def image_mesh(
    points: np.ndarray,                 # [H,W,3]
    mask: Optional[np.ndarray] = None,  # [H,W] bool
    attrs: Optional[np.ndarray] = None,  # [H,W,C] per-vertex attributes
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Triangulate the pixel grid over valid pixels -> (verts, faces, attrs).

    Each quad of 4 valid pixels emits 2 triangles (same diagonal split as
    utils3d.image_mesh(tri=True)). Vertices are compacted to valid pixels.
    """
    H, W = points.shape[:2]
    if mask is None:
        mask = np.ones((H, W), bool)
    idx = np.full((H, W), -1, np.int64)
    ys, xs = np.nonzero(mask)
    idx[ys, xs] = np.arange(len(ys))
    verts = points[ys, xs].astype(np.float32)
    vattrs = attrs[ys, xs] if attrs is not None else None

    m00 = mask[:-1, :-1]
    m01 = mask[:-1, 1:]
    m10 = mask[1:, :-1]
    m11 = mask[1:, 1:]
    quad = m00 & m01 & m10 & m11
    qy, qx = np.nonzero(quad)

    i00 = idx[qy, qx]
    i01 = idx[qy, qx + 1]
    i10 = idx[qy + 1, qx]
    i11 = idx[qy + 1, qx + 1]
    # split along the 00-11 diagonal, CCW in image space
    f1 = np.stack([i00, i11, i01], axis=-1)
    f2 = np.stack([i00, i10, i11], axis=-1)
    faces = np.concatenate([f1, f2], axis=0).astype(np.int32)
    return verts, faces, vattrs
