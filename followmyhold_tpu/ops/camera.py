"""Cameras and projection.

Two camera models cover everything the reference uses:

1. ``perspective_projection`` — OpenCV pinhole used by HaMeR
   (hamer/utils/geometry.py:64-103) plus ``cam_crop_to_full``
   (hamer/utils/renderer.py:12-22) for weak-perspective crop cams.

2. ``GuidanceCamera`` — the guidance renderer camera. The reference builds a
   PyTorch3D FoVPerspectiveCameras with R = 180deg-about-y and T = 0
   (guidance/run.py:84-90) over meshes stored in GL convention (x right,
   y up, z toward viewer). Composing that camera's NDC + screen transforms
   collapses to an OpenCV pinhole on the flipped point (x, -y, -z):

       u = cx + f * x / (-z),   v = cy + f * (-y) / (-z)

   with f = (S-1)/2 / tan(fov/2), cx = (W-1)/2, cy = (H-1)/2, and camera-space
   depth  z_cam = -z. We implement that collapsed form directly; it is
   equivalent and removes an entire rotate-then-unrotate round trip.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from followmyhold_tpu.ops.precision import einsum_f32


def perspective_projection(
    points: jnp.ndarray,
    translation: jnp.ndarray,
    focal_length: jnp.ndarray,
    camera_center: jnp.ndarray | None = None,
    rotation: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """OpenCV pinhole projection of [B, N, 3] points -> [B, N, 2] pixels.

    Matches HaMeR's perspective_projection (geometry.py:64-103).
    """
    if rotation is not None:
        points = einsum_f32("bij,bkj->bki", rotation, points)
    points = points + translation[:, None, :]
    xy = points[..., :2] / points[..., 2:3]
    uv = xy * focal_length[:, None, :]
    if camera_center is not None:
        uv = uv + camera_center[:, None, :]
    return uv


def cam_crop_to_full(
    cam_bbox: jnp.ndarray,
    box_center: jnp.ndarray,
    box_size: jnp.ndarray,
    img_size: jnp.ndarray,
    focal_length: float = 5000.0,
) -> jnp.ndarray:
    """Weak-perspective crop camera (s, tx, ty) -> full-image translation.

    Matches hamer/utils/renderer.py:12-22.
    """
    img_w, img_h = img_size[:, 0], img_size[:, 1]
    cx, cy, b = box_center[:, 0], box_center[:, 1], box_size
    bs = b * cam_bbox[:, 0] + 1e-9
    tz = 2.0 * focal_length / bs
    tx = (2.0 * (cx - img_w / 2.0) / bs) + cam_bbox[:, 1]
    ty = (2.0 * (cy - img_h / 2.0) / bs) + cam_bbox[:, 2]
    return jnp.stack([tx, ty, tz], axis=-1)


@dataclass(frozen=True)
class GuidanceCamera:
    """The guidance-stage camera (collapsed PyTorch3D 180deg-y FoV camera).

    fov_deg is the horizontal FoV from MoGe's fov.json (guidance/run.py:228-231).
    znear/zfar match the reference (run.py:90).
    """

    height: int
    width: int
    fov_deg: float
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def focal_px(self) -> float:
        import math

        # PyTorch3D screen mapping uses (S-1)/2 half-extents.
        return (min(self.height, self.width) - 1) / 2.0 / math.tan(
            math.radians(self.fov_deg) / 2.0
        )

    def _focal(self, fov_deg):
        """focal_px for a (possibly traced) per-image fov override.

        fov varies per image (MoGe fov.json), so batched guidance threads it
        as a traced GuidanceTargets field rather than baking image 0's value
        into the static camera (reference guidance/run.py:84-90 builds the
        camera per image)."""
        if fov_deg is None:
            return self.focal_px
        half = jnp.deg2rad(fov_deg) / 2.0
        return (min(self.height, self.width) - 1) / 2.0 / jnp.tan(half)

    def to_camera_space(self, points: jnp.ndarray) -> jnp.ndarray:
        """GL-convention world points -> OpenCV camera coords (z>0 forward)."""
        return points * jnp.asarray([1.0, -1.0, -1.0], points.dtype)

    def project(self, points: jnp.ndarray, fov_deg=None) -> jnp.ndarray:
        """World points [..., 3] -> (u, v, depth) [..., 3].

        (u, v) in pixels (origin top-left, v down); depth is camera-space z.
        Equivalent to PyTorch3D transform_points_screen under the reference's
        camera (pipelines.py:1336). fov_deg (traced scalar) overrides the
        static fov for per-image batched intrinsics.
        """
        cam = self.to_camera_space(points)
        z = jnp.maximum(cam[..., 2], 1e-6)
        f = self._focal(fov_deg)
        u = (self.width - 1) / 2.0 + f * cam[..., 0] / z
        v = (self.height - 1) / 2.0 + f * cam[..., 1] / z
        return jnp.stack([u, v, cam[..., 2]], axis=-1)

    def ndc(self, points: jnp.ndarray, fov_deg=None) -> jnp.ndarray:
        """World points -> (x_ndc, y_ndc, depth); NDC in [-1, 1], x right/y down."""
        cam = self.to_camera_space(points)
        z = jnp.maximum(cam[..., 2], 1e-6)
        if fov_deg is None:
            import math

            s = 1.0 / math.tan(math.radians(self.fov_deg) / 2.0)
        else:
            s = 1.0 / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
        x = s * cam[..., 0] / z
        y = s * cam[..., 1] / z
        return jnp.stack([x, y, cam[..., 2]], axis=-1)
