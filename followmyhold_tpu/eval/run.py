"""Chamfer-parity evaluation harness.

Consumes the reference's benchmark splits (test_splits/{dexycb,oakink,
arctic}_test.csv: img_id,img_path rows — SURVEY §4) and reports
chamfer / F-score of this framework's exported meshes, optionally against
stored reference meshes — this makes BASELINE.md's "chamfer parity"
north-star metric measurable.

Two modes:
- --pred_dir + --ref_dir: compare existing {id}_obj.ply pairs (ours vs the
  reference pipeline's exports) without re-running anything.
- --base_dir + --split_path [--image_root]: run the full pipeline over split
  rows first (artifact-exists resume applies), then compare whatever
  reference meshes exist under --ref_dir.

    python -m followmyhold_tpu.eval.run --split_path test_splits/dexycb_test.csv \
        --pred_dir out/guidance --ref_dir ref_exports --report report.json
"""

from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List, Optional

import numpy as np


def read_split(split_path: str) -> List[Dict[str, str]]:
    with open(split_path, "r", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def _mesh_pair_metrics(pred_path: str, ref_path: str, samples: int) -> Dict[str, float]:
    from followmyhold_tpu.eval.metrics import chamfer_between_meshes, f_score
    from followmyhold_tpu.ops.icp import sample_surface
    from followmyhold_tpu.utils.mesh_io import load_mesh

    import jax.numpy as jnp

    pred = load_mesh(pred_path)
    ref = load_mesh(ref_path)
    pa = sample_surface(np.asarray(pred.vertices), np.asarray(pred.faces),
                        samples, seed=0)
    pb = sample_surface(np.asarray(ref.vertices), np.asarray(ref.faces),
                        samples, seed=1)
    from followmyhold_tpu.eval.metrics import chamfer_distance

    cd = float(chamfer_distance(jnp.asarray(pa), jnp.asarray(pb)))
    f5 = float(f_score(jnp.asarray(pa), jnp.asarray(pb), threshold=0.005))
    f10 = float(f_score(jnp.asarray(pa), jnp.asarray(pb), threshold=0.01))
    return {"chamfer": cd, "f@5mm": f5, "f@10mm": f10}


def evaluate(
    split_path: str,
    pred_dir: str,
    ref_dir: Optional[str] = None,
    base_dir: Optional[str] = None,
    image_root: Optional[str] = None,
    samples: int = 10000,
    max_rows: Optional[int] = None,
    report_path: Optional[str] = None,
) -> Dict:
    rows = read_split(split_path)
    if max_rows:
        rows = rows[:max_rows]

    # optional: run the pipeline for split rows whose outputs are missing
    if base_dir is not None:
        from followmyhold_tpu.configs.pipeline import load_config
        from followmyhold_tpu.main import run_pipeline

        for row in rows:
            img_id = row["img_id"]
            out_obj = os.path.join(pred_dir, f"{img_id}_obj.ply")
            if os.path.exists(out_obj):
                continue
            img_path = row["img_path"]
            if image_root:
                img_path = os.path.join(image_root, img_path)
            if not os.path.exists(img_path):
                print(f"missing input image {img_path}; skipping {img_id}")
                continue
            cfg_file = os.path.join(base_dir, f"eval_{img_id}.env")
            with open(cfg_file, "w", encoding="utf-8") as f:
                f.write(f"PROJECT_ROOT={os.getcwd()}\n"
                        f"BASE_DIR={os.path.join(base_dir, img_id)}\n"
                        f"IMAGE_PATH={img_path}\nRUN_INPAINT=1\n")
            try:
                run_pipeline(load_config(cfg_file))
            except Exception as e:  # per-image skip-and-continue
                print(f"pipeline failed for {img_id}: {e}")

    per_image = {}
    missing_pred = 0
    missing_ref = 0
    for row in rows:
        img_id = row["img_id"]
        pred = os.path.join(pred_dir, f"{img_id}_obj.ply")
        if not os.path.exists(pred):
            missing_pred += 1
            continue
        if ref_dir is None:
            per_image[img_id] = {"exported": True}
            continue
        ref = os.path.join(ref_dir, f"{img_id}_obj.ply")
        if not os.path.exists(ref):
            missing_ref += 1
            continue
        try:
            per_image[img_id] = _mesh_pair_metrics(pred, ref, samples)
        except Exception as e:  # degenerate mesh etc.
            per_image[img_id] = {"error": str(e)}

    scored = [m for m in per_image.values() if "chamfer" in m]
    summary = {
        "split": os.path.basename(split_path),
        "rows": len(rows),
        "evaluated": len(scored),
        "missing_pred": missing_pred,
        "missing_ref": missing_ref,
    }
    if scored:
        for key in ("chamfer", "f@5mm", "f@10mm"):
            summary[f"mean_{key}"] = float(np.mean([m[key] for m in scored]))
            summary[f"median_{key}"] = float(np.median([m[key] for m in scored]))

    result = {"summary": summary, "per_image": per_image}
    print(json.dumps(summary, indent=2))
    if report_path:
        with open(report_path, "w", encoding="utf-8") as f:
            json.dump(result, f, indent=2)
        print(f"report -> {report_path}")
    return result


def main() -> None:
    parser = argparse.ArgumentParser(description="Chamfer-parity evaluation")
    parser.add_argument("--split_path", required=True)
    parser.add_argument("--pred_dir", required=True)
    parser.add_argument("--ref_dir", default=None,
                        help="reference meshes ({id}_obj.ply) to compare against")
    parser.add_argument("--base_dir", default=None,
                        help="run the pipeline for missing predictions here")
    parser.add_argument("--image_root", default=None)
    parser.add_argument("--samples", type=int, default=10000)
    parser.add_argument("--max_rows", type=int, default=None)
    parser.add_argument("--report", default=None)
    args = parser.parse_args()
    evaluate(args.split_path, args.pred_dir, args.ref_dir, args.base_dir,
             args.image_root, args.samples, args.max_rows, args.report)


if __name__ == "__main__":
    main()
