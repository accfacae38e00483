"""hand_object_detector (Faster R-CNN ResNet-101 + contact extension) in Flax.

Faithful port of the reference's detector
(third_party/estimator/hand_object_detector: lib/model/faster_rcnn/
{resnet,faster_rcnn}.py, lib/model/rpn/*, lib/model/extension_layers/
extension_layers.py) so its checkpoint converts losslessly:

- Caffe-style ResNet-101 (stride on the 1x1 conv1 of each bottleneck —
  resnet.py:225 "# change"); BatchNorms are FROZEN at inference and fused
  into conv biases at conversion.
- RCNN_base = conv1..layer3 (stride 16, 1024 ch); RCNN_top = layer4 applied
  to the 7x7 ROI-aligned features, then spatial mean (_head_to_tail).
- RPN: 3x3 conv 1024->512, 2-class softmax objectness + 4*na box deltas over
  the classic generate_anchors grid (scales 4/8/16/32, ratios 0.5/1/2).
- Heads: cls_score (3: background / targetobject / hand), bbox_pred (4*3),
  extension head: contact state (2048->32->5), dydx (2048->3, offset =
  [mag, 0.1*normalize(dx,dy)]), hand side (2048->1, sigmoid).

Pixel pipeline matches hoi_detector.py: BGR, mean-subtracted
(102.9801, 115.9465, 122.7717), shortest side 600 capped at 1000.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.nms import nms, roi_align


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    width: int = 64
    stage_blocks: Tuple[int, ...] = (3, 4, 23, 3)   # ResNet-101
    feat_stride: int = 16
    num_classes: int = 3
    anchor_scales: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    roi_size: int = 7
    pre_nms_top_n: int = 6000
    post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    dtype: jnp.dtype = jnp.bfloat16


FRCNN_TINY = FrcnnConfig(width=8, stage_blocks=(1, 1, 1, 1),
                         pre_nms_top_n=64, post_nms_top_n=16,
                         dtype=jnp.float32)


class FusedConv(nn.Module):
    """Conv with bias (the frozen BN is folded in at conversion)."""

    ch: int
    k: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        return nn.Conv(self.ch, (self.k, self.k),
                       strides=(self.stride, self.stride),
                       padding=((p, p), (p, p)), dtype=self.dtype,
                       name="conv")(x)


class Bottleneck(nn.Module):
    """Caffe-style: stride on conv1 (reference resnet.py Bottleneck)."""

    planes: int
    stride: int
    has_downsample: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.relu(FusedConv(self.planes, 1, self.stride, self.dtype,
                              name="conv1")(x))
        h = nn.relu(FusedConv(self.planes, 3, 1, self.dtype, name="conv2")(h))
        h = FusedConv(self.planes * 4, 1, 1, self.dtype, name="conv3")(h)
        if self.has_downsample:
            x = FusedConv(self.planes * 4, 1, self.stride, self.dtype,
                          name="downsample")(x)
        return nn.relu(h + x)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for b in range(self.blocks):
            need_down = b == 0 and (self.stride != 1
                                    or x.shape[-1] != self.planes * 4)
            x = Bottleneck(self.planes, self.stride if b == 0 else 1,
                           need_down, self.dtype, name=f"block{b}")(x)
        return x


def generate_anchors(base_size=16, ratios=(0.5, 1.0, 2.0),
                     scales=(4, 8, 16, 32)) -> np.ndarray:
    """Classic Faster R-CNN anchor generation (lib/model/rpn/
    generate_anchors.py): ratio enumeration with integer rounding, then scale
    enumeration about the base anchor center."""
    base = np.array([0, 0, base_size - 1, base_size - 1], np.float32)

    def whctrs(a):
        w = a[2] - a[0] + 1
        h = a[3] - a[1] + 1
        return w, h, a[0] + 0.5 * (w - 1), a[1] + 0.5 * (h - 1)

    def mkanchors(ws, hs, x_ctr, y_ctr):
        ws = ws[:, None]
        hs = hs[:, None]
        return np.hstack([x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
                          x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1)])

    w, h, xc, yc = whctrs(base)
    size = w * h
    size_ratios = size / np.asarray(ratios)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.asarray(ratios))
    ratio_anchors = mkanchors(ws, hs, xc, yc)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, xc, yc = whctrs(ratio_anchors[i])
        ws = w * np.asarray(scales, np.float32)
        hs = h * np.asarray(scales, np.float32)
        out.append(mkanchors(ws, hs, xc, yc))
    return np.vstack(out).astype(np.float32)


def shift_anchors(anchors: np.ndarray, gh: int, gw: int, stride: int) -> np.ndarray:
    sx = np.arange(gw) * stride
    sy = np.arange(gh) * stride
    xx, yy = np.meshgrid(sx, sy)
    shifts = np.stack([xx.ravel(), yy.ravel(), xx.ravel(), yy.ravel()], axis=1)
    all_a = anchors[None] + shifts[:, None].astype(np.float32)
    return all_a.reshape(-1, 4)


def decode_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """bbox_transform_inv (lib/model/rpn/bbox_transform.py)."""
    wa = anchors[:, 2] - anchors[:, 0] + 1.0
    ha = anchors[:, 3] - anchors[:, 1] + 1.0
    cxa = anchors[:, 0] + 0.5 * wa
    cya = anchors[:, 1] + 0.5 * ha
    dx, dy, dw, dh = deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3]
    cx = dx * wa + cxa
    cy = dy * ha + cya
    w = jnp.exp(jnp.clip(dw, -5, 5)) * wa
    h = jnp.exp(jnp.clip(dh, -5, 5)) * ha
    # this fork's bbox_transform_inv does NOT subtract 1 at x2/y2 (unlike
    # py-faster-rcnn): corners are symmetric around the center
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)


class HandObjectDetector(nn.Module):
    cfg: FrcnnConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray):
        """image: [H, W, 3] BGR, pixel-mean subtracted (hoi_detector.py
        preprocessing). Returns per-ROI predictions (static post_nms_top_n)."""
        c = self.cfg
        na = len(c.anchor_scales) * len(c.anchor_ratios)
        x = image[None].astype(c.dtype)

        # RCNN_base: conv1 / layer1-3
        x = nn.relu(FusedConv(c.width, 7, 2, c.dtype, name="conv1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ResNetStage(c.width, c.stage_blocks[0], 1, c.dtype, name="layer1")(x)
        x = ResNetStage(c.width * 2, c.stage_blocks[1], 2, c.dtype,
                        name="layer2")(x)
        feat = ResNetStage(c.width * 4, c.stage_blocks[2], 2, c.dtype,
                           name="layer3")(x)
        gh, gw = feat.shape[1], feat.shape[2]

        # RPN (lib/model/rpn/rpn.py): 2-class softmax objectness
        rpn = nn.relu(nn.Conv(512, (3, 3), dtype=jnp.float32,
                              name="rpn_conv")(feat.astype(jnp.float32)))
        cls_logits = nn.Conv(2 * na, (1, 1), name="rpn_cls")(rpn)[0]
        box_deltas = nn.Conv(4 * na, (1, 1), name="rpn_box")(rpn)[0]

        # softmax over the (bg, fg) pair per anchor: channel c maps to
        # (c // na = class, c % na = anchor) after the reshape trick
        # (rpn.py:44-56, 63-70); proposal ordering is position-major with the
        # anchor innermost, matching the classic proposal layer
        logits = cls_logits.reshape(gh, gw, 2, na)
        probs = jax.nn.softmax(logits, axis=2)[..., 1, :]      # fg prob
        scores = probs.reshape(-1)
        deltas = box_deltas.reshape(-1, 4)

        base_anchors = generate_anchors(c.feat_stride, c.anchor_ratios,
                                        c.anchor_scales)
        anchors = jnp.asarray(
            shift_anchors(base_anchors, gh, gw, c.feat_stride))

        proposals = decode_deltas(anchors, deltas)
        H = gh * c.feat_stride
        W = gw * c.feat_stride
        proposals = jnp.clip(
            proposals, 0, jnp.asarray([W - 1, H - 1, W - 1, H - 1], jnp.float32))

        top = min(c.pre_nms_top_n, proposals.shape[0])
        top_scores, top_idx = jax.lax.top_k(scores, top)
        top_boxes = proposals[top_idx]
        keep = nms(top_boxes, top_scores, c.rpn_nms_thresh,
                   max_out=c.post_nms_top_n)
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        slots = jnp.where(keep, rank, c.post_nms_top_n)
        n_roi = c.post_nms_top_n
        rois = jnp.zeros((n_roi + 1, 4)).at[slots].set(top_boxes)[:-1]
        roi_scores = jnp.zeros((n_roi + 1,)).at[slots].set(top_scores)[:-1]

        # ROIAlign 7x7 -> layer4 -> spatial mean (_head_to_tail)
        pooled = roi_align(feat[0].astype(jnp.float32),
                           rois / c.feat_stride, (c.roi_size, c.roi_size))
        h = ResNetStage(c.width * 8, c.stage_blocks[3], 2, c.dtype,
                        name="layer4")(pooled.astype(c.dtype))
        h = h.mean(axis=(1, 2)).astype(jnp.float32)            # [N, 2048]

        cls_logits = nn.Dense(c.num_classes, name="cls_score")(h)
        bbox_deltas = nn.Dense(4 * c.num_classes, name="bbox_pred")(h)

        # extension head (extension_layers.py:30-36, 69-75)
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


PIXEL_MEANS_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


def preprocess_image(image_rgb: np.ndarray,
                     target: int = 600, max_size: int = 1000):
    """hoi_detector.py test-time pipeline: BGR, mean subtract, shortest side
    600 capped at 1000. Returns (blob [H,W,3], scale)."""
    from PIL import Image

    H, W = image_rgb.shape[:2]
    scale = target / min(H, W)
    if scale * max(H, W) > max_size:
        scale = max_size / max(H, W)
    nh, nw = int(round(H * scale)), int(round(W * scale))
    img = np.asarray(Image.fromarray(image_rgb).resize((nw, nh)), np.float32)
    bgr = img[..., ::-1] - PIXEL_MEANS_BGR
    return bgr, scale


def match_hands_to_objects(obj_boxes: np.ndarray, hand_boxes: np.ndarray,
                           contact: np.ndarray, offsets: np.ndarray) -> List[int]:
    """filter_object (hoi_detector.py:179-195): each in-contact hand picks the
    object whose center is nearest to hand center + 1000 * scaled offset."""
    out = []
    for i in range(len(hand_boxes)):
        if contact[i] <= 0:
            out.append(-1)
            continue
        hc = np.array([(hand_boxes[i, 0] + hand_boxes[i, 2]) / 2,
                       (hand_boxes[i, 1] + hand_boxes[i, 3]) / 2])
        point = hc + 1000.0 * offsets[i, 0] * offsets[i, 1:]
        if len(obj_boxes) == 0:
            out.append(-1)
            continue
        oc = np.stack([(obj_boxes[:, 0] + obj_boxes[:, 2]) / 2,
                       (obj_boxes[:, 1] + obj_boxes[:, 3]) / 2], axis=1)
        out.append(int(np.argmin(np.linalg.norm(oc - point, axis=1))))
    return out


def detect_hand_object(
    model: HandObjectDetector, params, image_rgb: np.ndarray,
    thresh: float = 0.5,
):
    """-> (union object box, union hand box) in image pixels, the
    hand_object_detector(image) contract (hoi_detector.py:204-452)."""
    blob, scale = preprocess_image(image_rgb)
    out = model.apply(params, jnp.asarray(blob))
    rois = np.asarray(out["rois"]) / scale
    probs = np.asarray(out["cls_probs"])
    deltas = np.asarray(out["bbox_deltas"])

    def union(cls_id):
        # per-class refined boxes (bbox_pred with TEST stds, faster_rcnn
        # test path applies stds (0.1, 0.1, 0.2, 0.2))
        stds = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
        d = deltas[:, 4 * cls_id:4 * (cls_id + 1)] * stds
        boxes = np.asarray(decode_deltas(
            jnp.asarray(rois * scale), jnp.asarray(d))) / scale
        sel = probs[:, cls_id] > thresh
        if not sel.any():
            return None
        b = boxes[sel]
        return np.array([b[:, 0].min(), b[:, 1].min(),
                         b[:, 2].max(), b[:, 3].max()], np.float32)

    return union(1), union(2)     # targetobject, hand
