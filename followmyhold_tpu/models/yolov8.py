"""YOLOv8 detection graph (Flax) — the WiLoR hand-detector slot.

Faithful port of the ultralytics YOLOv8 detect architecture so the WiLoR
checkpoint (wilor_ckpt/detector.pt, fetched at reference
scripts/fetch_data.sh:13-15; classes encode handedness — cls == is_right,
segment_hoi_sam2.py:153-160) converts losslessly. Conv+BN pairs are FUSED at
conversion (inference-only), so the Flax graph holds plain biased convs.

Layout (ultralytics v8 yaml): stem + 4 stages of Conv/C2f, SPPF, PAN-FPN
(two up, two down), and the anchor-free Detect head with DFL box regression
(16-bin integral per side) at strides 8/16/32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class YoloV8Config:
    base_width: int = 16          # n=16, s=32, m=48(w0.75 cap768), l=64, x=80
    depth_mult: float = 0.33      # n/s=0.33, m=0.67, l/x=1.0
    max_channels: int = 1024      # n/s: 1024; m: 768; l: 512; x: 512
    num_classes: int = 2          # WiLoR: left / right hand
    reg_max: int = 16
    image_size: int = 640
    dtype: jnp.dtype = jnp.float32

    def ch(self, mult: int) -> int:
        return int(min(self.base_width * mult, self.max_channels
                       * self.base_width / 64 * 4))

    def n_rep(self, n: int) -> int:
        return max(round(n * self.depth_mult), 1)


YOLOV8_N = YoloV8Config()
YOLOV8_TINY_TEST = YoloV8Config(base_width=8, depth_mult=0.34, image_size=64)


class ConvBN(nn.Module):
    """ultralytics Conv (conv+BN+SiLU); BN folded into the conv bias."""

    ch: int
    k: int
    s: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(self.ch, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    name="conv")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    ch: int
    shortcut: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = ConvBN(self.ch, 3, 1, self.dtype, name="cv1")(x)
        h = ConvBN(self.ch, 3, 1, self.dtype, name="cv2")(h)
        return x + h if self.shortcut else h


class C2f(nn.Module):
    ch_out: int
    n: int
    shortcut: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.ch_out // 2
        y = ConvBN(2 * c, 1, 1, self.dtype, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, self.dtype,
                                    name=f"m{i}")(parts[-1]))
        return ConvBN(self.ch_out, 1, 1, self.dtype,
                      name="cv2")(jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c = self.ch // 2
        x = ConvBN(c, 1, 1, self.dtype, name="cv1")(x)
        outs = [x]
        for _ in range(3):
            outs.append(nn.max_pool(outs[-1], (5, 5), strides=(1, 1),
                                    padding=((2, 2), (2, 2))))
        return ConvBN(self.ch, 1, 1, self.dtype,
                      name="cv2")(jnp.concatenate(outs, axis=-1))


class DetectHead(nn.Module):
    cfg: YoloV8Config
    channels: Sequence[int]

    @nn.compact
    def __call__(self, feats):
        c = self.cfg
        c2 = max(16, self.channels[0] // 4, c.reg_max * 4)
        c3 = max(self.channels[0], min(c.num_classes, 100))
        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            b = ConvBN(c2, 3, 1, c.dtype, name=f"cv2_{i}_0")(f)
            b = ConvBN(c2, 3, 1, c.dtype, name=f"cv2_{i}_1")(b)
            b = nn.Conv(4 * c.reg_max, (1, 1), dtype=jnp.float32,
                        name=f"cv2_{i}_2")(b)
            q = ConvBN(c3, 3, 1, c.dtype, name=f"cv3_{i}_0")(f)
            q = ConvBN(c3, 3, 1, c.dtype, name=f"cv3_{i}_1")(q)
            q = nn.Conv(c.num_classes, (1, 1), dtype=jnp.float32,
                        name=f"cv3_{i}_2")(q)
            box_out.append(b)
            cls_out.append(q)
        return box_out, cls_out


class YoloV8(nn.Module):
    """[B,H,W,3] in [0,1] -> (boxes [B,N,4] xyxy px, scores [B,N,nc])."""

    cfg: YoloV8Config

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        c = self.cfg
        w = c.base_width
        d = c.dtype
        x = images.astype(d)
        x = ConvBN(w, 3, 2, d, name="m0")(x)                    # P1
        x = ConvBN(2 * w, 3, 2, d, name="m1")(x)                # P2
        x = C2f(2 * w, c.n_rep(3), True, d, name="m2")(x)
        x = ConvBN(4 * w, 3, 2, d, name="m3")(x)                # P3
        p3 = C2f(4 * w, c.n_rep(6), True, d, name="m4")(x)
        x = ConvBN(8 * w, 3, 2, d, name="m5")(p3)               # P4
        p4 = C2f(8 * w, c.n_rep(6), True, d, name="m6")(x)
        c5 = min(16 * w, c.max_channels)
        x = ConvBN(c5, 3, 2, d, name="m7")(p4)                  # P5
        x = C2f(c5, c.n_rep(3), True, d, name="m8")(x)
        p5 = SPPF(c5, d, name="m9")(x)

        # PAN-FPN
        u = jax.image.resize(p5, (p5.shape[0], p4.shape[1], p4.shape[2],
                                  p5.shape[3]), "nearest")
        f4 = C2f(8 * w, c.n_rep(3), False, d, name="m12")(
            jnp.concatenate([u, p4], axis=-1))
        u = jax.image.resize(f4, (f4.shape[0], p3.shape[1], p3.shape[2],
                                  f4.shape[3]), "nearest")
        f3 = C2f(4 * w, c.n_rep(3), False, d, name="m15")(
            jnp.concatenate([u, p3], axis=-1))
        x = ConvBN(4 * w, 3, 2, d, name="m16")(f3)
        f4b = C2f(8 * w, c.n_rep(3), False, d, name="m18")(
            jnp.concatenate([x, f4], axis=-1))
        x = ConvBN(8 * w, 3, 2, d, name="m19")(f4b)
        f5 = C2f(c5, c.n_rep(3), False, d, name="m21")(
            jnp.concatenate([x, p5], axis=-1))

        box_out, cls_out = DetectHead(
            c, (4 * w, 8 * w, c5), name="m22")([f3, f4b, f5])

        boxes_all, scores_all = [], []
        bins = jnp.arange(c.reg_max, dtype=jnp.float32)
        for lvl, (b, q) in enumerate(zip(box_out, cls_out)):
            B, gh, gw, _ = b.shape
            stride = images.shape[1] // gh
            dist = b.reshape(B, gh, gw, 4, c.reg_max)
            dist = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)
            ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5)
            xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5)
            cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
            x0 = (cx - dist[..., 0]) * stride
            y0 = (cy - dist[..., 1]) * stride
            x1 = (cx + dist[..., 2]) * stride
            y1 = (cy + dist[..., 3]) * stride
            boxes_all.append(jnp.stack([x0, y0, x1, y1], -1).reshape(B, -1, 4))
            scores_all.append(jax.nn.sigmoid(q).reshape(B, -1, c.num_classes))
        return (jnp.concatenate(boxes_all, axis=1),
                jnp.concatenate(scores_all, axis=1))


def detect_hands_yolov8(model: YoloV8, params, image_rgb: np.ndarray,
                        conf: float = 0.3, iou_thresh: float = 0.5,
                        max_det: int = 10) -> List[dict]:
    """WiLoR contract: per-hand dict(box xyxy in image px, score, is_right)
    (segment_hoi_sam2.py:153-160)."""
    from PIL import Image

    from followmyhold_tpu.ops.nms import nms

    c = model.cfg
    H, W = image_rgb.shape[:2]
    s = c.image_size
    img = np.asarray(Image.fromarray(image_rgb).resize((s, s)),
                     np.float32) / 255.0
    boxes, scores = model.apply(params, jnp.asarray(img)[None])
    boxes = np.asarray(boxes[0])
    scores = np.asarray(scores[0])
    cls = scores.argmax(-1)
    score = scores.max(-1)
    keepable = score > conf
    if not keepable.any():
        return []
    b = boxes[keepable]
    sc = score[keepable]
    cl = cls[keepable]
    keep_mask = np.asarray(nms(jnp.asarray(b), jnp.asarray(sc),
                               iou_threshold=iou_thresh))
    order = np.argsort(-sc)
    out = []
    sx, sy = W / s, H / s
    for i in order:
        if not keep_mask[i] or len(out) >= max_det:
            continue
        x0, y0, x1, y1 = b[i]
        out.append(dict(
            box=np.array([x0 * sx, y0 * sy, x1 * sx, y1 * sy], np.float32),
            score=float(sc[i]), is_right=bool(cl[i] == 1)))
    return out
