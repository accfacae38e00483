"""Detection post-processing: NMS and ROIAlign as XLA ops.

TPU-native replacements for the reference's C/CUDA extension kernels
(third_party/estimator/hand_object_detector/lib/model/csrc/: nms.cu,
ROIAlign_cuda.cu, ROIPool_cuda.cu). Instead of translating the CUDA, NMS is
an IoU-matrix suppression sweep (static shapes, no host sync) and ROIAlign is
batched bilinear gather — both fuse into the surrounding detector graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from followmyhold_tpu.ops.image import box_iou


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        max_out: int | None = None) -> jnp.ndarray:
    """Greedy NMS over xyxy boxes -> keep mask [N] (True = kept).

    Equivalent to torchvision/CUDA nms: process in score order, suppress any
    box with IoU > threshold against an already-kept higher-scoring box.
    Implemented as a scan over the score-sorted list (static shape N).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sorted_boxes = boxes[order]

    iou = box_iou(sorted_boxes[:, None, :], sorted_boxes[None, :, :])  # [N,N]

    def body(keep, i):
        # suppressed if any earlier kept box overlaps > threshold
        earlier = jnp.arange(n) < i
        overlap = (iou[i] > iou_threshold) & earlier & keep
        keep_i = ~jnp.any(overlap)
        keep = keep.at[i].set(keep_i)
        return keep, keep_i

    keep_sorted, _ = jax.lax.scan(body, jnp.zeros(n, bool), jnp.arange(n))
    if max_out is not None:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (rank < max_out)
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlign: [H,W,C] features + [R,4] xyxy boxes -> [R,h,w,C].

    Matches the csrc ROIAlign semantics (average pooling over sampling_ratio^2
    bilinear samples per output bin, aligned=False half-pixel convention).
    """
    H, W, C = features.shape
    oh, ow = output_size
    s = sampling_ratio

    def one_roi(box):
        x1, y1, x2, y2 = box * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bin_w = roi_w / ow
        bin_h = roi_h / oh

        # sample grid: s x s points per bin
        iy = jnp.arange(oh * s, dtype=jnp.float32)
        ix = jnp.arange(ow * s, dtype=jnp.float32)
        ys = y1 + (iy + 0.5) * bin_h / s
        xs = x1 + (ix + 0.5) * bin_w / s
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

        def sample_channel(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [yy, xx], order=1, mode="constant", cval=0.0
            )

        samples = jnp.stack(
            [sample_channel(features[..., c]) for c in range(C)], axis=-1
        )  # [oh*s, ow*s, C]
        pooled = samples.reshape(oh, s, ow, s, C).mean(axis=(1, 3))
        return pooled

    return jax.vmap(one_roi)(boxes.astype(jnp.float32))
