"""Hand-object detector: Faster R-CNN (ResNet backbone) + contact extension
head, in Flax.

Replaces the reference's torch/CUDA detector (third_party/estimator/
hand_object_detector: lib/model/faster_rcnn/*, lib/model/rpn/*, and the
native NMS/ROIAlign kernels in lib/model/csrc — here ops/nms.py XLA programs).
Classes: [__background__, targetobject, hand] (hoi_detector.py:256).

The extension head (lib/model/extension_layers/extension_layers.py:11-46)
predicts, per ROI:
- contact state: 5-way (none/self/other-person/portable/non-portable),
- offset to the contacted object: [magnitude, dx, dy] with (dx, dy) l2-
  normalized and scaled 0.1 (extension_layers.py:73-76),
- hand side: left/right logit.

filter_object matching (offset-vector projection to the nearest object
center, hoi_detector.py:179-195) is ported verbatim in match_hands_to_objects.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.nms import nms, roi_align

PASCAL_CLASSES = ("__background__", "targetobject", "hand")


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    width: int = 64            # ResNet stem width (256 at production scale)
    stage_blocks: Tuple[int, ...] = (3, 4, 23, 3)  # ResNet-101 layout
    feat_stride: int = 16
    num_classes: int = 3
    num_anchors: int = 12      # 4 scales x 3 ratios (cfg ANCHOR_SCALES 4,8,16,32)
    roi_size: int = 7
    head_dim: int = 2048
    pre_nms_top_n: int = 256
    post_nms_top_n: int = 64
    dtype: jnp.dtype = jnp.bfloat16


FRCNN_TINY = FrcnnConfig(width=8, stage_blocks=(1, 1, 1), head_dim=32,
                         pre_nms_top_n=32, post_nms_top_n=8,
                         dtype=jnp.float32)


class Bottleneck(nn.Module):
    ch: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        skip = x
        h = nn.Conv(self.ch, (1, 1), dtype=self.dtype, name="c1")(x)
        h = nn.relu(nn.GroupNorm(num_groups=min(8, self.ch), dtype=jnp.float32,
                                 name="n1")(h)).astype(self.dtype)
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype, name="c2")(h)
        h = nn.relu(nn.GroupNorm(num_groups=min(8, self.ch), dtype=jnp.float32,
                                 name="n2")(h)).astype(self.dtype)
        h = nn.Conv(self.ch * 4, (1, 1), dtype=self.dtype, name="c3")(h)
        h = nn.GroupNorm(num_groups=min(8, self.ch), dtype=jnp.float32,
                         name="n3")(h).astype(self.dtype)
        if skip.shape != h.shape:
            skip = nn.Conv(self.ch * 4, (1, 1),
                           strides=(self.stride, self.stride),
                           dtype=self.dtype, name="down")(skip)
        return nn.relu(h + skip)


class ResNetBackbone(nn.Module):
    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.width, (7, 7), strides=(2, 2), dtype=c.dtype,
                    name="stem")(x.astype(c.dtype))
        x = nn.relu(nn.GroupNorm(num_groups=8, dtype=jnp.float32,
                                 name="stem_n")(x)).astype(c.dtype)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        ch = c.width
        for s, blocks in enumerate(c.stage_blocks):
            stride = 1 if s == 0 else 2
            for b in range(blocks):
                x = Bottleneck(ch, stride if b == 0 else 1, c.dtype,
                               name=f"s{s}b{b}")(x)
            ch *= 2
        return x  # stride 16 with 3 downsampling stages after the stem


def make_anchors(gh: int, gw: int, stride: int, num: int) -> np.ndarray:
    """[gh*gw*num, 4] xyxy anchors (4 scales x 3 ratios)."""
    scales = np.array([4, 8, 16, 32], np.float32)[: max(num // 3, 1)] * stride
    ratios = np.array([0.5, 1.0, 2.0], np.float32)
    ws, rs = np.meshgrid(scales, ratios)
    w = (ws * np.sqrt(rs)).reshape(-1)[:num]
    h = (ws / np.sqrt(rs)).reshape(-1)[:num]
    cy, cx = np.meshgrid((np.arange(gh) + 0.5) * stride,
                         (np.arange(gw) + 0.5) * stride, indexing="ij")
    cx = cx[..., None]
    cy = cy[..., None]
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    return boxes.reshape(-1, 4).astype(np.float32)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard Faster R-CNN box decoding (bbox_transform_inv)."""
    wa = anchors[:, 2] - anchors[:, 0]
    ha = anchors[:, 3] - anchors[:, 1]
    cxa = anchors[:, 0] + wa / 2
    cya = anchors[:, 1] + ha / 2
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = jnp.exp(jnp.clip(dw, -5, 5)) * wa
    h = jnp.exp(jnp.clip(dh, -5, 5)) * ha
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


class HandObjectDetector(nn.Module):
    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """[H,W,3] in [0,1] -> per-ROI predictions (static post_nms_top_n)."""
        c = self.cfg
        feat = ResNetBackbone(c, name="backbone")(image[None])[0]
        gh, gw, _ = feat.shape

        # RPN (lib/model/rpn/rpn.py structure)
        rpn = nn.relu(nn.Conv(256, (3, 3), dtype=jnp.float32,
                              name="rpn_conv")(feat.astype(jnp.float32)))
        obj_logits = nn.Conv(c.num_anchors, (1, 1), name="rpn_obj")(rpn)
        box_deltas = nn.Conv(c.num_anchors * 4, (1, 1), name="rpn_box")(rpn)

        anchors = jnp.asarray(make_anchors(gh, gw, c.feat_stride, c.num_anchors))
        scores = jax.nn.sigmoid(obj_logits).reshape(-1)
        deltas = box_deltas.reshape(-1, 4)
        proposals = decode_deltas(anchors, deltas)
        H = gh * c.feat_stride
        W = gw * c.feat_stride
        proposals = jnp.clip(proposals, 0,
                             jnp.asarray([W - 1, H - 1, W - 1, H - 1], jnp.float32))

        top = min(c.pre_nms_top_n, proposals.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, top)
        top_boxes = proposals[top_idx]
        keep = nms(top_boxes, top_scores, 0.7, max_out=c.post_nms_top_n)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slots = jnp.where(keep, rank, c.post_nms_top_n)
        rois = jnp.zeros((c.post_nms_top_n + 1, 4)).at[slots].set(top_boxes)[:-1]
        roi_scores = jnp.zeros((c.post_nms_top_n + 1,)).at[slots].set(top_scores)[:-1]

        # ROI heads
        pooled = roi_align(feat.astype(jnp.float32), rois / c.feat_stride,
                           (c.roi_size, c.roi_size))
        h = pooled.reshape(c.post_nms_top_n, -1)
        h = nn.relu(nn.Dense(c.head_dim, name="fc6")(h))
        h = nn.relu(nn.Dense(c.head_dim, name="fc7")(h))

        cls_logits = nn.Dense(c.num_classes, name="cls_score")(h)
        bbox_deltas = nn.Dense(4 * c.num_classes, name="bbox_pred")(h)

        # extension head (extension_layers.py:30-36)
        contact = nn.Dense(32, name="ext_contact1")(h)
        contact = nn.Dense(5, name="ext_contact2")(nn.relu(contact))
        dydx = nn.Dense(3, name="ext_dydx")(h)
        from followmyhold_tpu.ops.safe import safe_normalize

        offset = jnp.concatenate(
            [dydx[:, :1], 0.1 * safe_normalize(dydx[:, 1:])], axis=-1)
        handside = nn.Dense(1, name="ext_lr")(h)[:, 0]

        return {
            "rois": rois,
            "roi_scores": roi_scores,
            "cls_probs": jax.nn.softmax(cls_logits, axis=-1),
            "bbox_deltas": bbox_deltas,
            "contact_state": jax.nn.softmax(contact, axis=-1),
            "offset": offset,            # [N,3] magnitude, dx, dy
            "hand_side": jax.nn.sigmoid(handside),
        }


def match_hands_to_objects(obj_boxes: np.ndarray, hand_boxes: np.ndarray,
                           contact: np.ndarray, offsets: np.ndarray) -> List[int]:
    """Port of filter_object (hoi_detector.py:179-195): project each
    in-contact hand's offset vector (x10000) and take the nearest object
    center; -1 for hands not in contact."""
    if len(obj_boxes) == 0:
        return [-1] * len(hand_boxes)
    obj_cc = (obj_boxes[:, :2] + obj_boxes[:, 2:]) / 2
    out = []
    for i in range(len(hand_boxes)):
        if contact[i] <= 0:
            out.append(-1)
            continue
        hand_cc = (hand_boxes[i, :2] + hand_boxes[i, 2:]) / 2
        point = hand_cc + offsets[i, 0] * 10000 * offsets[i, 1:3]
        out.append(int(np.argmin(np.sum((obj_cc - point) ** 2, axis=1))))
    return out


def detect_hand_object(
    model: HandObjectDetector, params, image_rgb: np.ndarray,
    score_thresh: float = 0.5,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """hand_object_detector(image) parity: union object box + union hand box
    over confident detections (hoi_detector.py:204-452 outcome)."""
    out = model.apply(params, jnp.asarray(image_rgb, jnp.float32) / 255.0)
    probs = np.asarray(out["cls_probs"])
    rois = np.asarray(out["rois"])

    def union(cls_id):
        m = probs[:, cls_id] > score_thresh
        if not m.any():
            return None
        b = rois[m]
        return np.array([b[:, 0].min(), b[:, 1].min(),
                         b[:, 2].max(), b[:, 3].max()], np.float32)

    return union(1), union(2)
