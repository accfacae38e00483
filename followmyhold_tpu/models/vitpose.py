"""ViTPose-class wholebody keypoint estimator (Flax).

Replaces the vendored ViTPose stack (reference:
third_party/estimator/hamer/vitpose_model.py:17-72 wrapping mmpose; backbone
tree at hamer/third-party/ViTPose/). Architecture: ViT backbone (shared
models/vit.py) + classic top-down deconv head -> per-keypoint heatmaps; the
hand stage derives left/right hand boxes from the wholebody keypoint blocks
exactly like the reference (hand/hamer.py:134-152: wholebody indices
91..111 = left hand, 112..132 = right hand).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.vit import ViT, ViTConfig

# COCO-wholebody layout (133 keypoints)
NUM_WHOLEBODY_KPS = 133
LEFT_HAND_SLICE = slice(91, 112)
RIGHT_HAND_SLICE = slice(112, 133)


@dataclasses.dataclass(frozen=True)
class ViTPoseConfig:
    # ViTPose's ViT is the same ViTPose-style variant HaMeR vendors: 2px
    # patch-embed padding + a cls SLOT in pos_embed added as a bias
    # (hamer/models/backbones/vit.py:168,327)
    backbone: ViTConfig = ViTConfig(
        img_size=(256, 192), patch_size=16, embed_dim=1280, depth=32,
        num_heads=16, patch_padding=2, pos_embed_cls_slot=True)
    num_keypoints: int = NUM_WHOLEBODY_KPS
    deconv_channels: int = 256
    num_deconv: int = 2
    dtype: jnp.dtype = jnp.bfloat16


VITPOSE_TINY = ViTPoseConfig(
    backbone=ViTConfig(img_size=(64, 48), patch_size=16, embed_dim=32,
                       depth=1, num_heads=2, patch_padding=2,
                       pos_embed_cls_slot=True, dtype=jnp.float32),
    deconv_channels=16, dtype=jnp.float32)


class ViTPose(nn.Module):
    cfg: ViTPoseConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] -> heatmaps [B, H/4, W/4, K]."""
        c = self.cfg
        B, H, W, _ = images.shape
        tokens = ViT(c.backbone, name="backbone")(images)
        gh, gw = H // c.backbone.patch_size, W // c.backbone.patch_size
        x = tokens.reshape(B, gh, gw, -1).astype(c.dtype)
        for i in range(c.num_deconv):
            x = nn.ConvTranspose(c.deconv_channels, (4, 4), strides=(2, 2),
                                 dtype=c.dtype, name=f"deconv{i}")(x)
            # inference BatchNorm == per-channel affine; the converter folds
            # the checkpoint's BN (gamma, beta, running stats) into these
            scale = self.param(f"bn{i}_scale", nn.initializers.ones,
                               (c.deconv_channels,), jnp.float32)
            bias = self.param(f"bn{i}_bias", nn.initializers.zeros,
                              (c.deconv_channels,), jnp.float32)
            x = nn.relu(x.astype(jnp.float32) * scale + bias).astype(c.dtype)
        return nn.Conv(c.num_keypoints, (1, 1), dtype=jnp.float32,
                       name="final")(x.astype(jnp.float32))


def heatmaps_to_keypoints(heatmaps: jnp.ndarray,
                          image_hw: Tuple[int, int]) -> jnp.ndarray:
    """[B,h,w,K] -> [B,K,3] (x, y, confidence) in image pixels (argmax)."""
    B, h, w, K = heatmaps.shape
    flat = heatmaps.reshape(B, h * w, K)
    idx = jnp.argmax(flat, axis=1)
    conf = jnp.max(flat, axis=1)
    yy = (idx // w).astype(jnp.float32) * (image_hw[0] / h)
    xx = (idx % w).astype(jnp.float32) * (image_hw[1] / w)
    return jnp.stack([xx, yy, conf], axis=-1)


def hand_candidates_from_wholebody(kps: np.ndarray, conf_thresh: float = 0.5):
    """Keypoint blocks -> [(box_xyxy, score, is_right), ...] for both sides;
    score = mean confidence of the valid keypoints (feeds per-side NMS for
    multi-person frames, reference hand/hamer.py:134-176)."""
    out = []
    for sl, is_right in ((LEFT_HAND_SLICE, False), (RIGHT_HAND_SLICE, True)):
        block = kps[sl]
        valid = block[:, 2] > conf_thresh
        if valid.sum() > 3:
            pts = block[valid, :2]
            box = np.array([pts[:, 0].min(), pts[:, 1].min(),
                            pts[:, 0].max(), pts[:, 1].max()], np.float32)
            out.append((box, float(block[valid, 2].mean()), is_right))
    return out


def hand_bboxes_from_wholebody(kps: np.ndarray, conf_thresh: float = 0.5):
    """Keypoint blocks -> (left_box, right_box) xyxy or None, matching the
    reference's block logic (hand/hamer.py:134-152: valid if >3 confident
    keypoints; box = keypoint extent)."""
    out = []
    for sl in (LEFT_HAND_SLICE, RIGHT_HAND_SLICE):
        block = kps[sl]
        valid = block[:, 2] > conf_thresh
        if valid.sum() > 3:
            pts = block[valid, :2]
            out.append(np.array([pts[:, 0].min(), pts[:, 1].min(),
                                 pts[:, 0].max(), pts[:, 1].max()], np.float32))
        else:
            out.append(None)
    return out[0], out[1]
