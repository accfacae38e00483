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


def tokenize_flux_prompt(prompt: str, clip_cfg, t5_cfg, t5_max_len: int = 512):
    """(clip_ids [1,77], t5_ids [1,512]) via the checkpoint tokenizers.

    Mirrors diffusers FluxKontextPipeline.encode_prompt: CLIP BPE padded to
    77 with EOS, T5 unigram padded to max_sequence_length=512 (no attention
    mask — padded slots attend, as in the reference). Vocabs are installed by
    convert.flux_text; without them, falls back to hashed ids for seed-init
    smoke runs but HARD-FAILS when real converted text-tower params exist
    (FOHO_ALLOW_HASH_TOKENIZER=1 overrides)."""
    from followmyhold_tpu.text.tokenizers import (
        load_clip_tokenizer,
        load_t5_tokenizer,
    )

    clip_tok = load_clip_tokenizer()
    t5_tok = load_t5_tokenizer()
    if clip_tok is not None and t5_tok is not None:
        return (clip_tok.encode(prompt, max_len=77),
                t5_tok.encode(prompt, max_len=t5_max_len, pad_to_max=True))
    from followmyhold_tpu.utils.params import has_params

    if ((has_params("flux_clip") or has_params("flux_t5"))
            and not os.environ.get("FOHO_ALLOW_HASH_TOKENIZER")):
        raise RuntimeError(
            "converted FLUX text-tower params exist but tokenizer vocabs are "
            "missing (expected assets tokenizers/flux_clip/{vocab.json,"
            "merges.txt} + tokenizers/flux_t5/{tokenizer.json|spiece.model} — "
            "rerun followmyhold_tpu.convert.flux_text with --tokenizer_dirs, "
            "or set FOHO_ALLOW_HASH_TOKENIZER=1 to knowingly use garbage ids)")
    from followmyhold_tpu.models.gdino import simple_tokenize

    t5_ids = simple_tokenize(prompt, 64, t5_cfg.vocab_size)
    words = prompt.lower().split()[:20]
    span = max(clip_cfg.vocab_size - 1000, 1)
    clip_ids = np.asarray(
        [[clip_cfg.eos_token_id - 1]
         + [1000 + hash(w) % (span - 2) for w in words]
         + [clip_cfg.eos_token_id]], np.int64)
    return clip_ids, t5_ids


class FluxKontextInpainter:
    """FLUX.1-Kontext hand removal (reference inpaint.py:41-77): transformer
    + VAE + CLIP/T5 text towers, all checkpoint-converted (convert/flux*.py).
    Built only when converted 'flux_transformer' + 'flux_vae' + 'flux_clip'
    + 'flux_t5' weights exist."""

    REQUIRED = ("flux_transformer", "flux_vae", "flux_clip", "flux_t5")

    def __init__(self):
        import jax.numpy as jnp

        from followmyhold_tpu.models.clip_text import CLIP_L, ClipTextModel
        from followmyhold_tpu.models.flux import (
            FLUX_DEV,
            FLUX_VAE,
            FluxTransformer,
            FluxVae,
        )
        from followmyhold_tpu.models.t5 import T5_XXL, T5Encoder
        from followmyhold_tpu.utils.params import load_or_init

        self.transformer = FluxTransformer(FLUX_DEV)
        self.vae = FluxVae(FLUX_VAE)
        self.clip = ClipTextModel(CLIP_L)
        self.t5 = T5Encoder(T5_XXL)
        n = 8
        self.t_params = load_or_init(
            "flux_transformer", lambda k: self.transformer.init(
                k, jnp.zeros((1, n, 64)), jnp.zeros((1, 4, 4096)),
                jnp.zeros((1, 768)), jnp.ones((1,)), jnp.zeros((n, 3)),
                jnp.zeros((4, 3)), jnp.ones((1,))))
        self.vae_params = load_or_init(
            "flux_vae", lambda k: self.vae.init(k, jnp.zeros((1, 64, 64, 3))))
        self.clip_params = load_or_init(
            "flux_clip",
            lambda k: self.clip.init(k, jnp.zeros((1, 8), jnp.int32)))
        self.t5_params = load_or_init(
            "flux_t5", lambda k: self.t5.init(k, jnp.zeros((1, 8), jnp.int32)))

    def __call__(self, image_rgb: np.ndarray, prompt: str) -> np.ndarray:
        import jax.numpy as jnp

        from followmyhold_tpu.models.flux import kontext_edit
        from followmyhold_tpu.utils.prng import SEED_INPAINT, stage_key

        clip_ids, t5_ids = tokenize_flux_prompt(prompt, self.clip.cfg,
                                                self.t5.cfg)
        t5_states = self.t5.apply(self.t5_params, jnp.asarray(t5_ids, jnp.int32))
        _, pooled = self.clip.apply(self.clip_params,
                                    jnp.asarray(clip_ids, jnp.int32))

        img = jnp.asarray(image_rgb, jnp.float32)[None] / 255.0
        out = kontext_edit(self.transformer, self.t_params, self.vae,
                           self.vae_params, t5_states, pooled, img,
                           stage_key(SEED_INPAINT, "inpaint"),
                           num_steps=28, guidance=2.5)
        return (np.asarray(out[0]) * 255).astype(np.uint8)


def _learned_inpainter():
    """FLUX.1-Kontext inpainter when all converted weights exist."""
    global _LEARNED
    if _LEARNED is not None:
        return _LEARNED
    from followmyhold_tpu.utils.params import has_params

    if not all(has_params(n) for n in FluxKontextInpainter.REQUIRED):
        _LEARNED = False
        return False
    _LEARNED = FluxKontextInpainter()
    return _LEARNED


def inpaint_hand(image_rgb: np.ndarray, hand_mask: np.ndarray,
                 radius: int = 7, object_name: str = "object") -> np.ndarray:
    """Remove the hand region. FLUX.1-Kontext backend when converted weights
    exist (prompt "Remove hands but keep the {object}", inpaint.py:66-67);
    classical dilate+Telea fallback otherwise."""
    learned = _learned_inpainter()
    if learned:
        return learned(image_rgb,
                       f"Remove hands but keep the {object_name}.")

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
