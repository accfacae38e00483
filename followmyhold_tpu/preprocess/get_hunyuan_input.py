"""HOI input generation stage.

Public surface mirrors src/foho/preprocess/get_hunyuan_input.py:22-160: per
image, detect + crop + segment and write the artifacts downstream stages
read (save-name grammar at get_hunyuan_input.py:97-118):
  original_imgs/{id}.png, masked_obj_imgs/{id}_masked_obj.png,
  cropped_hoi_imgs/{id}_cropped_hoi_{is_right}.png,
  cropped_hoi_imgs_wo_bckg/{id}_cropped_hoi_{is_right}.png,
  masks/{id}_cropped_obj_mask.png + {id}_cropped_hand_mask.png.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from followmyhold_tpu.preprocess.detectors import default_bundle
from followmyhold_tpu.preprocess.segment_hoi import hoi_detector


def _read_split(split_path: str) -> List[Tuple[str, str]]:
    """CSV with img_id,img_path[,...] header (test_splits/*.csv format)."""
    rows = []
    with open(split_path, "r", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            rows.append((row["img_id"], row["img_path"]))
    return rows


def _read_gemini_names(path: Optional[str]) -> Dict[str, str]:
    names: Dict[str, str] = {}
    if path and os.path.exists(path):
        with open(path, "r", encoding="utf-8") as f:
            for row in csv.reader(f):
                if len(row) >= 3:
                    names[row[0]] = row[2]
    return names


def run(
    occ_img_dir: str,
    cropped_img_dir: str,
    cropped_img_wo_bckg_dir: str,
    mask_dir: str,
    original_img_dir: str,
    split_path: Optional[str] = None,
    image_path: Optional[str] = None,
    gemini_responses: Optional[str] = None,
    project_root: Optional[str] = None,  # CLI parity
) -> None:
    for d in (occ_img_dir, cropped_img_dir, cropped_img_wo_bckg_dir,
              mask_dir, original_img_dir):
        os.makedirs(d, exist_ok=True)

    if split_path:
        items = _read_split(split_path)
    elif image_path:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        items = [(stem, image_path)]
    else:
        raise ValueError("Provide split_path or image_path")

    names = _read_gemini_names(gemini_responses)
    bundle = default_bundle()

    for image_id, path in items:
        try:
            # resume: skip if crops exist (get_hunyuan_input.py:73-75)
            done = [
                os.path.join(cropped_img_dir, f"{image_id}_cropped_hoi_{r}.png")
                for r in (0, 1)
            ]
            if any(os.path.exists(p) for p in done):
                print(f"{image_id} exists, skipping")
                continue

            img = np.asarray(Image.open(path).convert("RGB"))
            out = hoi_detector(img, bundle, object_name=names.get(image_id))
            rid = int(out["is_right"])

            Image.fromarray(img).save(
                os.path.join(original_img_dir, f"{image_id}.png"))
            Image.fromarray(out["occluded_obj"]).save(
                os.path.join(occ_img_dir, f"{image_id}_masked_obj.png"))
            Image.fromarray(out["cropped_hoi"]).save(
                os.path.join(cropped_img_dir, f"{image_id}_cropped_hoi_{rid}.png"))
            Image.fromarray(out["cropped_hoi_wo_bckg"]).save(
                os.path.join(cropped_img_wo_bckg_dir,
                             f"{image_id}_cropped_hoi_{rid}.png"))
            Image.fromarray((out["obj_mask"] * 255).astype(np.uint8)).save(
                os.path.join(mask_dir, f"{image_id}_cropped_obj_mask.png"))
            Image.fromarray((out["hand_mask"] * 255).astype(np.uint8)).save(
                os.path.join(mask_dir, f"{image_id}_cropped_hand_mask.png"))
            np.save(os.path.join(mask_dir, f"{image_id}_crop_transform.npy"),
                    out["transform"])
            print(f"Processed {image_id}")
        except Exception as e:  # skip-and-continue (get_hunyuan_input.py:121-128)
            print(f"Error processing {image_id}: {e}")
            continue


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--split_path", default=None)
    parser.add_argument("--image_path", default=None)
    parser.add_argument("--occ_img_dir", required=True)
    parser.add_argument("--cropped_img_dir", required=True)
    parser.add_argument("--cropped_img_wo_bckg_dir", required=True)
    parser.add_argument("--mask_dir", required=True)
    parser.add_argument("--original_img_dir", required=True)
    parser.add_argument("--gemini_responses", default=None)
    parser.add_argument("--project_root", default=None)
    args = parser.parse_args()
    run(args.occ_img_dir, args.cropped_img_dir, args.cropped_img_wo_bckg_dir,
        args.mask_dir, args.original_img_dir, args.split_path, args.image_path,
        args.gemini_responses, args.project_root)


if __name__ == "__main__":
    main()
