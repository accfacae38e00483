"""Detection / segmentation bundle for the preprocess stage.

The reference chains four model families (SURVEY.md §2b): a Faster R-CNN
hand-object detector with CUDA NMS/ROIAlign (#14), a YOLO hand detector
(#15), and GroundingDINO + SAM2 text-prompted segmentation (#16). This module
defines the DetectorBundle protocol those slots plug into, plus:

- HeuristicBundle: a dependency-free classical fallback (skin-color hand
  detection in YCrCb, saliency-based object proposal, box-seeded GrabCut-style
  mask refinement) so the full pipeline runs without converted weights;
- the learned TPU-native bundles land behind the same protocol as weights
  are converted (followmyhold_tpu.convert).

The box-fusion logic consuming these lives in segment_hoi.py and is a
faithful port of the reference crop math (segment_hoi_sam2.py:145-249).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Protocol, Tuple

import numpy as np


@dataclass
class Detection:
    box_xyxy: np.ndarray   # [4]
    score: float
    is_right: Optional[bool] = None


class DetectorBundle(Protocol):
    def detect_hands(self, image_rgb: np.ndarray) -> List[Detection]: ...

    def detect_hand_object(self, image_rgb: np.ndarray) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """-> (object box, hand box) like hand_object_detector(image)
        (hoi_detector.py:204-452)."""
        ...

    def segment(self, image_rgb: np.ndarray, prompt: str) -> np.ndarray:
        """Text-prompted mask [H,W] bool (LangSAM.predict semantics)."""
        ...


def _largest_component_box(mask: np.ndarray) -> Optional[np.ndarray]:
    import cv2

    n, labels, stats, _ = cv2.connectedComponentsWithStats(mask.astype(np.uint8))
    if n <= 1:
        return None
    areas = stats[1:, cv2.CC_STAT_AREA]
    i = 1 + int(np.argmax(areas))
    x, y, w, h = stats[i, :4]
    return np.array([x, y, x + w, y + h], np.float32)


class HeuristicBundle:
    """Classical-vision fallback bundle (no learned weights needed)."""

    def skin_mask(self, image_rgb: np.ndarray) -> np.ndarray:
        import cv2

        ycrcb = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2YCrCb)
        mask = cv2.inRange(ycrcb, (0, 133, 77), (255, 180, 135)) > 0
        kernel = np.ones((5, 5), np.uint8)
        mask = cv2.morphologyEx(mask.astype(np.uint8), cv2.MORPH_OPEN, kernel)
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
        return mask > 0

    def foreground_mask(self, image_rgb: np.ndarray) -> np.ndarray:
        """Central-saliency foreground: Otsu on gradient magnitude + distance
        prior toward the image center."""
        import cv2

        gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
        gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0)
        gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1)
        mag = cv2.GaussianBlur(np.hypot(gx, gy), (21, 21), 0)
        mag8 = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
        _, th = cv2.threshold(mag8, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        mask = cv2.morphologyEx(th, cv2.MORPH_CLOSE, np.ones((15, 15), np.uint8))
        return mask > 0

    def detect_hands(self, image_rgb: np.ndarray) -> List[Detection]:
        skin = self.skin_mask(image_rgb)
        box = _largest_component_box(skin)
        if box is None:
            return []
        # handedness unknown for the heuristic: default right (the dataset
        # convention; the detector bundle with learned weights supplies it)
        return [Detection(box_xyxy=box, score=0.5, is_right=True)]

    def detect_hand_object(self, image_rgb: np.ndarray):
        skin = self.skin_mask(image_rgb)
        fg = self.foreground_mask(image_rgb)
        obj = fg & ~skin
        return _largest_component_box(obj), _largest_component_box(skin)

    def segment(self, image_rgb: np.ndarray, prompt: str) -> np.ndarray:
        if "hand" in prompt.lower():
            return self.skin_mask(image_rgb)
        return self.foreground_mask(image_rgb) & ~self.skin_mask(image_rgb)


class LearnedBundle:
    """The full learned stack: YOLO-class hand detector + Faster R-CNN
    hand-object detector + GroundingDINO-class text detection + SAM-class
    mask refinement. Built when converted weights exist under
    assets_root()/params/ (see followmyhold_tpu.convert)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        from followmyhold_tpu.models.gdino import GDINO_BASE, GroundingDino
        from followmyhold_tpu.models.hand_object_detector import FrcnnConfig, HandObjectDetector
        from followmyhold_tpu.models.sam2 import SAM2_LARGE, Sam2
        from followmyhold_tpu.models.yolov8 import YOLOV8_N, YoloV8
        from followmyhold_tpu.utils.params import load_or_init

        self.yolo = YoloV8(YOLOV8_N)
        self.frcnn = HandObjectDetector(FrcnnConfig())
        self.gdino = GroundingDino(GDINO_BASE)
        self.sam = Sam2(SAM2_LARGE)
        self.yolo_params = load_or_init(
            "yolov8_wilor",
            lambda k: self.yolo.init(
                k, jnp.zeros((1, self.yolo.cfg.image_size,
                              self.yolo.cfg.image_size, 3))))
        self.frcnn_params = load_or_init(
            "hand_object_detector",
            lambda k: self.frcnn.init(k, jnp.zeros((64, 64, 3))))

        def _init_gdino(k):
            c = self.gdino.cfg
            T = 8
            return self.gdino.init(
                k, pixel_values=jnp.zeros((1, c.image_size, c.image_size, 3)),
                input_ids=jnp.zeros((1, T), jnp.int32),
                token_type_ids=jnp.zeros((1, T), jnp.int32),
                text_self_attention_masks=jnp.ones((1, T, T), bool),
                position_ids=jnp.zeros((1, T), jnp.int32),
                text_token_mask=jnp.ones((1, T), bool))

        self.gdino_params = load_or_init("gdino", _init_gdino)
        self.sam_params = load_or_init(
            "sam2", lambda k: self.sam.init(
                k, jnp.zeros((1, self.sam.cfg.image_size,
                              self.sam.cfg.image_size, 3)),
                jnp.zeros((1, 4))))

    def detect_hands(self, image_rgb: np.ndarray) -> List[Detection]:
        from followmyhold_tpu.models.yolov8 import detect_hands_yolov8

        dets = detect_hands_yolov8(self.yolo, self.yolo_params, image_rgb)
        return [Detection(box_xyxy=d["box"], score=d["score"],
                          is_right=d["is_right"]) for d in dets]

    def detect_hand_object(self, image_rgb: np.ndarray):
        from followmyhold_tpu.models.hand_object_detector import detect_hand_object

        return detect_hand_object(self.frcnn, self.frcnn_params, image_rgb)

    def segment(self, image_rgb: np.ndarray, prompt: str) -> np.ndarray:
        from followmyhold_tpu.models.gdino import detect_text_prompt
        from followmyhold_tpu.models.sam2 import segment_box

        boxes, scores = detect_text_prompt(self.gdino, self.gdino_params,
                                           image_rgb, prompt)
        if len(boxes) == 0:
            return np.zeros(image_rgb.shape[:2], bool)
        mask = np.zeros(image_rgb.shape[:2], bool)
        for box in boxes[:1]:
            mask |= segment_box(self.sam, self.sam_params, image_rgb, box)
        return mask


def default_bundle() -> DetectorBundle:
    """Learned bundle when converted weights exist; heuristic fallback
    otherwise (keeps the pipeline runnable without downloads)."""
    from followmyhold_tpu.utils.params import has_params

    learned_ready = all(has_params(n) for n in
                        ("yolov8_wilor", "hand_object_detector", "gdino", "sam2"))
    if learned_ready:
        return LearnedBundle()
    return HeuristicBundle()
