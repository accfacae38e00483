"""YOLO-class single-stage hand detector (Flax).

Replaces the WiLoR ultralytics checkpoint slot (reference:
preprocess/segment_hoi_sam2.py:153-160 — detections whose class encodes
handedness: cls == is_right). Anchor-free design: CSP-style conv backbone ->
FPN-lite -> per-cell (objectness, 2-class handedness, box ltrb) heads, decoded
with the XLA NMS from ops/nms.py.
"""

from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.nms import nms


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    width: int = 64
    depth: int = 3          # number of downsampling stages after the stem
    num_classes: int = 2    # left / right hand
    dtype: jnp.dtype = jnp.float32


YOLO_TINY = YoloConfig(width=8, depth=2)


class ConvBlock(nn.Module):
    ch: int
    stride: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch), dtype=jnp.float32,
                         name="gn")(x)
        return nn.silu(x).astype(self.dtype)


class YoloHand(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """[B,H,W,3] -> (boxes [B,N,4] xyxy, obj [B,N], cls [B,N,C])."""
        c = self.cfg
        B, H, W, _ = images.shape
        x = ConvBlock(c.width, 2, c.dtype, name="stem")(images.astype(c.dtype))
        stride = 2
        for i in range(c.depth):
            ch = c.width * (2 ** min(i + 1, 3))
            x = ConvBlock(ch, 2, c.dtype, name=f"stage{i}a")(x)
            x = x + ConvBlock(ch, 1, c.dtype, name=f"stage{i}b")(x)
            stride *= 2

        gh, gw = x.shape[1], x.shape[2]
        head = nn.Conv(4 + 1 + c.num_classes, (1, 1), dtype=jnp.float32,
                       name="head")(x.astype(jnp.float32))
        ltrb = jax.nn.softplus(head[..., :4]) * stride
        obj = jax.nn.sigmoid(head[..., 4])
        cls = jax.nn.softmax(head[..., 5:], axis=-1)

        ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * stride
        xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(ys, xs, indexing="ij")
        boxes = jnp.stack([cx - ltrb[..., 0], cy - ltrb[..., 1],
                           cx + ltrb[..., 2], cy + ltrb[..., 3]], axis=-1)
        return (boxes.reshape(B, -1, 4), obj.reshape(B, -1),
                cls.reshape(B, -1, c.num_classes))


def decode_detections(boxes: jnp.ndarray, obj: jnp.ndarray, cls: jnp.ndarray,
                      conf_threshold: float = 0.3,
                      iou_threshold: float = 0.5) -> List[dict]:
    """Single image: NMS'd detections with handedness (cls argmax == is_right,
    ultralytics convention the reference relies on)."""
    scores = np.asarray(obj)
    keep_conf = scores >= conf_threshold
    keep_nms = np.asarray(nms(boxes, obj, iou_threshold))
    out = []
    for i in np.flatnonzero(keep_conf & keep_nms):
        out.append({
            "box": np.asarray(boxes[i]),
            "score": float(scores[i]),
            "is_right": bool(int(np.argmax(np.asarray(cls[i])))),
        })
    return out
