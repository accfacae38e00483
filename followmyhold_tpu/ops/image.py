"""Image-space ops: affine crop, resize, bbox utilities, IoU.

XLA-compiled replacements for the reference's cv2 preprocessing
(preprocess/segment_hoi_sam2.py:23-142). The affine patch crop composes the
same source->destination triangle mapping as gen_trans_from_patch_cv and
samples with bilinear map_coordinates (differentiable, jittable, batchable).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gen_trans_from_patch(
    c_x: float, c_y: float,
    src_width: float, src_height: float,
    dst_width: float, dst_height: float,
    scale: float = 1.0, rot_deg: float = 0.0,
    inv: bool = False,
) -> np.ndarray:
    """2x3 affine mapping src patch -> dst image (segment_hoi_sam2.py:23-73).

    Solved in closed form (the mapping is a similarity transform, no cv2).
    """
    rot = np.pi * rot_deg / 180.0
    sn, cs = np.sin(rot), np.cos(rot)

    src_w = src_width * scale
    src_h = src_height * scale
    # rotated basis vectors of the source patch
    right = np.array([cs * src_w * 0.5, sn * src_w * 0.5], np.float64)
    down = np.array([-sn * src_h * 0.5, cs * src_h * 0.5], np.float64)
    src_center = np.array([c_x, c_y], np.float64)

    dst_center = np.array([dst_width * 0.5, dst_height * 0.5], np.float64)
    dst_right = np.array([dst_width * 0.5, 0.0], np.float64)
    dst_down = np.array([0.0, dst_height * 0.5], np.float64)

    # affine A s.t. A(src_center)=dst_center, A(src_center+down)=dst_center+dst_down,
    # A(src_center+right)=dst_center+dst_right
    src_mat = np.stack([right, down], axis=1)          # [2,2] columns
    dst_mat = np.stack([dst_right, dst_down], axis=1)
    if inv:
        lin = src_mat @ np.linalg.inv(dst_mat)
        trans = np.zeros((2, 3), np.float32)
        trans[:, :2] = lin
        trans[:, 2] = src_center - lin @ dst_center
    else:
        lin = dst_mat @ np.linalg.inv(src_mat)
        trans = np.zeros((2, 3), np.float32)
        trans[:, :2] = lin
        trans[:, 2] = dst_center - lin @ src_center
    return trans


def warp_affine(
    image: jnp.ndarray,
    trans: jnp.ndarray,
    out_hw: Tuple[int, int],
    order: int = 1,
) -> jnp.ndarray:
    """Apply a 2x3 forward affine (src->dst) to [H,W,C] via inverse bilinear
    sampling. Matches cv2.warpAffine(flags=INTER_LINEAR) semantics."""
    H, W = out_hw
    A = jnp.concatenate([trans, jnp.asarray([[0.0, 0.0, 1.0]], trans.dtype)], axis=0)
    Ainv = jnp.linalg.inv(A)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dst = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0).reshape(3, -1)
    src = Ainv @ dst
    src_x = src[0].reshape(H, W)
    src_y = src[1].reshape(H, W)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, [src_y, src_x], order=order, mode="constant", cval=0.0
        )

    if image.ndim == 2:
        return sample_channel(image.astype(jnp.float32))
    return jnp.stack(
        [sample_channel(image[..., c].astype(jnp.float32)) for c in range(image.shape[-1])],
        axis=-1,
    )


def generate_patch_image(
    image: jnp.ndarray,
    bbox_xywh,
    out_hw: Tuple[int, int],
    do_flip: bool = False,
    scale: float = 1.0,
    rot_deg: float = 0.0,
) -> Tuple[jnp.ndarray, np.ndarray]:
    """Crop an affine patch (segment_hoi_sam2.py:76-105). Returns (patch, 3x3 T)."""
    x, y, w, h = [float(v) for v in bbox_xywh]
    img_w = image.shape[1]
    c_x = x + 0.5 * w
    c_y = y + 0.5 * h
    if do_flip:
        image = image[:, ::-1]
        c_x = img_w - c_x - 1

    trans = gen_trans_from_patch(c_x, c_y, w, h, out_hw[1], out_hw[0], scale, rot_deg)
    patch = warp_affine(image, jnp.asarray(trans), out_hw)
    T = np.zeros((3, 3), np.float32)
    T[:2] = trans
    T[2, 2] = 1.0
    return patch, T


def process_bbox(bbox_xywh, factor: float = 1.25):
    """Square-ify and expand a bbox (segment_hoi_sam2.py:108-124)."""
    x, y, w, h = [float(v) for v in bbox_xywh]
    c_x = x + w / 2.0
    c_y = y + h / 2.0
    side = max(w, h)
    w = h = side * factor
    return [c_x - w / 2.0, c_y - h / 2.0, w, h]


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray) -> jnp.ndarray:
    """IoU of xyxy boxes, broadcasting [..., 4] x [..., 4]."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    a2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / union, 0.0)


def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of [H,W,C] or [H,W]."""
    shape = (*out_hw, image.shape[-1]) if image.ndim == 3 else out_hw
    return jax.image.resize(image.astype(jnp.float32), shape, method="bilinear")


def resize_nearest(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    shape = (*out_hw, image.shape[-1]) if image.ndim == 3 else out_hw
    return jax.image.resize(image, shape, method="nearest")


def normalize_imagenet(image01: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] in [0,1] -> ImageNet-normalized (HaMeR/MoGe/DINOv2 input)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], image01.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], image01.dtype)
    return (image01 - mean) / std
