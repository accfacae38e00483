"""Hand-removal inpainting stage.

Public surface mirrors src/foho/preprocess/inpaint.py:33-97: per cropped HOI
image, remove the hand and keep the object; outputs
{id}_inpainted_{is_right}.png under save_dir; deterministic (seed 2).

The reference runs FLUX.1-Kontext 4-bit ("Remove hands but keep the {object}",
28 steps, guidance 2.5 — inpaint.py:41-77). The diffusion inpainter slots in
behind the same interface once converted (followmyhold_tpu.convert); until
then the default backend is classical Navier-Stokes/Telea inpainting over the
hand mask, which preserves the deterministic contract and keeps the pipeline
end-to-end runnable.
"""

from __future__ import annotations

import argparse
import csv
import glob
import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from followmyhold_tpu.utils.artifacts import parse_cropped_hoi_name


def _read_gemini_names(path: Optional[str]) -> Dict[str, str]:
    names: Dict[str, str] = {}
    if path and os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            for row in csv.reader(f):
                if len(row) >= 3:
                    names[row[0]] = row[2]
    return names


_LEARNED = None


def _learned_inpainter():
    """FLUX-class diffusion inpainter when converted weights exist."""
    global _LEARNED
    if _LEARNED is not None:
        return _LEARNED
    from followmyhold_tpu.utils.params import has_params

    if not has_params("flux_inpaint"):
        _LEARNED = False
        return False
    import jax.numpy as jnp

    from followmyhold_tpu.models.flux_inpaint import FluxInpaintConfig, FluxInpainter
    from followmyhold_tpu.utils.params import load_or_init

    model = FluxInpainter(FluxInpaintConfig())
    params = load_or_init("flux_inpaint", lambda k: model.init(
        k, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64)),
        jnp.zeros((1, model.cfg.text.max_text_len), jnp.int32),
        jnp.zeros(1), jnp.zeros((1, 8, 8, model.cfg.latent_channels))))
    _LEARNED = (model, params)
    return _LEARNED


def inpaint_hand(image_rgb: np.ndarray, hand_mask: np.ndarray,
                 radius: int = 7, object_name: str = "object") -> np.ndarray:
    """Remove the hand region. Learned FLUX-class backend when weights exist
    (prompt "Remove hands but keep the {object}", matching inpaint.py:66-67);
    classical dilate+Telea fallback otherwise."""
    learned = _learned_inpainter()
    if learned:
        import jax
        import jax.numpy as jnp

        from followmyhold_tpu.models.flux_inpaint import inpaint as flux_inpaint
        from followmyhold_tpu.utils.prng import SEED_INPAINT, stage_key

        model, params = learned
        out = flux_inpaint(
            model, params,
            jnp.asarray(image_rgb, jnp.float32)[None] / 255.0,
            jnp.asarray(hand_mask, jnp.float32)[None],
            f"Remove hands but keep the {object_name}",
            stage_key(SEED_INPAINT, "inpaint"))
        return (np.asarray(out[0]) * 255).astype(np.uint8)

    import cv2

    mask = hand_mask.astype(np.uint8) * 255
    mask = cv2.dilate(mask, np.ones((9, 9), np.uint8))
    return cv2.inpaint(image_rgb, mask, radius, cv2.INPAINT_TELEA)


def run(
    save_dir: str,
    cropped_img_dir: str,
    gemini_responses: Optional[str] = None,
    mask_dir: Optional[str] = None,
) -> None:
    os.makedirs(save_dir, exist_ok=True)
    names = _read_gemini_names(gemini_responses)

    images = sorted(glob.glob(os.path.join(cropped_img_dir, "*.png")))
    if not images:
        print(f"No images found in {cropped_img_dir}")
        return

    if mask_dir is None:
        mask_dir = os.path.join(os.path.dirname(cropped_img_dir.rstrip("/")),
                                "cropped_hand_masks")

    for img_path in images:
        image_id, is_right = parse_cropped_hoi_name(img_path)
        rid = int(is_right)
        out_path = os.path.join(save_dir, f"{image_id}_inpainted_{rid}.png")
        if os.path.exists(out_path):  # resume (inpaint.py:61-63)
            print(f"{image_id} exists, skipping")
            continue

        img = np.asarray(Image.open(img_path).convert("RGB"))
        mask_path = os.path.join(mask_dir, f"{image_id}_cropped_hand_mask.png")
        if os.path.exists(mask_path):
            hand_mask = np.asarray(Image.open(mask_path).convert("L")) > 0
        else:
            hand_mask = np.zeros(img.shape[:2], bool)

        result = inpaint_hand(img, hand_mask,
                              object_name=names.get(image_id, "object"))
        Image.fromarray(result).save(out_path)
        print(f"Inpainted {image_id}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--cropped_img_dir", required=True)
    parser.add_argument("--gemini_responses", default=None)
    parser.add_argument("--mask_dir", default=None)
    args = parser.parse_args()
    run(args.save_dir, args.cropped_img_dir, args.gemini_responses, args.mask_dir)


if __name__ == "__main__":
    main()
