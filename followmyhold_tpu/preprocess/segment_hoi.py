"""HOI detection, cropping, and segmentation.

Faithful port of the reference crop math (src/foho/preprocess/
segment_hoi_sam2.py:145-249): fuse hand-object-detector and hand-detector
boxes by IoU, union, pad +-10px, square-ify x1.25, affine-crop to 512^2,
horizontal-flip left hands, segment object and hand in the crop, and compose
the white-background / occluded-object images. Detection and segmentation
are pluggable (preprocess/detectors.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.image import (
    box_iou,
    generate_patch_image,
    process_bbox,
)
from followmyhold_tpu.configs.profiles import crop_size
from followmyhold_tpu.preprocess.detectors import DetectorBundle

CROP_SIZE = 512  # production; the tiny profile overrides via crop_size()
PAD_PX = 10
BBOX_FACTOR = 1.25


def hoi_detector(
    image_rgb: np.ndarray,
    bundle: DetectorBundle,
    iou_threshold: float = 0.3,
    object_name: Optional[str] = None,
):
    """-> dict with the 512^2 crop, masks, composed images, is_right, T.

    Mirrors segment_hoi_sam2.py:145-249.
    """
    H, W = image_rgb.shape[:2]

    obj_box, hod_hand_box = bundle.detect_hand_object(image_rgb)
    hands = bundle.detect_hands(image_rgb)

    # IoU-match detector hands against the hand-object detector's hand box
    # (segment_hoi_sam2.py:162-185)
    hand_box, is_right = None, True
    if hands:
        if hod_hand_box is not None:
            ious = [float(box_iou(jnp.asarray(h.box_xyxy),
                                  jnp.asarray(hod_hand_box))) for h in hands]
            best = int(np.argmax(ious))
            if ious[best] >= iou_threshold:
                hand_box = hands[best].box_xyxy
                is_right = bool(hands[best].is_right)
        if hand_box is None:
            best = int(np.argmax([h.score for h in hands]))
            hand_box = hands[best].box_xyxy
            is_right = bool(hands[best].is_right)
    elif hod_hand_box is not None:
        hand_box = hod_hand_box

    # union object + hand boxes, pad, square-ify (segment_hoi_sam2.py:186-196)
    boxes = [b for b in (obj_box, hand_box) if b is not None]
    if not boxes:
        union = np.array([0, 0, W - 1, H - 1], np.float32)
    else:
        arr = np.stack(boxes)
        union = np.array([arr[:, 0].min(), arr[:, 1].min(),
                          arr[:, 2].max(), arr[:, 3].max()], np.float32)
    union[0] = max(union[0] - PAD_PX, 0)
    union[1] = max(union[1] - PAD_PX, 0)
    union[2] = min(union[2] + PAD_PX, W - 1)
    union[3] = min(union[3] + PAD_PX, H - 1)

    bbox_xywh = process_bbox(
        [union[0], union[1], union[2] - union[0], union[3] - union[1]],
        factor=BBOX_FACTOR)

    size = crop_size()
    patch, T = generate_patch_image(
        jnp.asarray(image_rgb.astype(np.float32)), bbox_xywh,
        (size, size), do_flip=not is_right)
    crop = np.clip(np.asarray(patch), 0, 255).astype(np.uint8)

    # segment object + hand in the crop (segment_hoi_sam2.py:201-208)
    obj_mask = bundle.segment(crop, object_name or "object")
    hand_mask = bundle.segment(crop, "only hand")

    # composition (segment_hoi_sam2.py:232-245)
    white = np.full_like(crop, 255)
    hoi_mask = obj_mask | hand_mask
    crop_wo_bg = np.where(hoi_mask[..., None], crop, white)
    occluded_obj = np.where(obj_mask[..., None] & ~hand_mask[..., None], crop, white)

    return {
        "cropped_hoi": crop,
        "cropped_hoi_wo_bckg": crop_wo_bg,
        "occluded_obj": occluded_obj,
        "obj_mask": obj_mask,
        "hand_mask": hand_mask,
        "is_right": is_right,
        "transform": T,
        "bbox_xywh": bbox_xywh,
    }
