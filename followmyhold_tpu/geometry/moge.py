"""MoGe geometry stage: point map, metric depth, normals, FoV, scene mesh.

Public surface mirrors src/foho/geometry/moge.py:17-175: per input crop,
write into {out}/{id}_cropped_hoi/ the artifacts downstream stages consume:
depth.npy (+depth.exr when cv2 has EXR), mask.png, normal.png, fov.json
(fov_x/fov_y degrees), mesh.ply and pointcloud.ply in GL convention
(vertices * [1,-1,-1], reference moge.py:158), with depth-edge-cleaned
triangulation.

The output dir truncates the stem at "hoi" (reference moge.py:110-112), so
"{id}_cropped_hoi_1.png" maps to "{id}_cropped_hoi/".
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from followmyhold_tpu.models.moge import MoGe, MoGeConfig, moge_infer
from followmyhold_tpu.ops.image_mesh import depth_edge, image_mesh
from followmyhold_tpu.utils.mesh_io import write_ply
from followmyhold_tpu.utils.params import load_or_init


def _default_config() -> MoGeConfig:
    if os.environ.get("FOHO_TPU_PROFILE", "full") == "tiny":
        from followmyhold_tpu.models.vit import ViTConfig

        return MoGeConfig(
            encoder=ViTConfig(img_size=(28, 28), patch_size=14, embed_dim=32,
                              depth=2, num_heads=2, use_cls_token=True,
                              layerscale_init=1e-5, dtype=jnp.float32),
            intermediate_layers=(0, 1), dim_proj=16,
            neck_dims=(16, 16, 8), head_dims=(16, 16, 8), num_res_blocks=1,
            scale_head_dims=(16, 1), num_tokens_range=(4, 16),
            dtype=jnp.float32)
    return MoGeConfig()


def _build_model(cfg: MoGeConfig):
    model = MoGe(cfg)

    def init_fn(key):
        dummy = jnp.zeros((1, 70, 70, 3))
        return model.init(key, dummy, 25)

    return model, load_or_init("moge", init_fn)


def run(
    input_dir: str,
    output_dir: str,
    resolution_level: int = 9,
    threshold: float = 0.04,
    project_root: str | None = None,  # CLI parity
) -> None:
    os.makedirs(output_dir, exist_ok=True)
    cfg = _default_config()
    model, params = _build_model(cfg)

    images = sorted(
        glob.glob(os.path.join(input_dir, "*.png"))
        + glob.glob(os.path.join(input_dir, "*.jpg"))
    )
    if not images:
        print(f"No images found in {input_dir}")
        return

    for img_path in images:
        stem = os.path.splitext(os.path.basename(img_path))[0]
        # truncate at "hoi" (reference moge.py:110-112)
        if "hoi" in stem:
            stem = stem.split("hoi")[0] + "hoi"
        save_dir = os.path.join(output_dir, stem)
        fov_path = os.path.join(save_dir, "fov.json")
        mesh_path = os.path.join(save_dir, "mesh.ply")
        if os.path.exists(fov_path) and os.path.exists(mesh_path):
            print(f"{stem} exists, skipping")
            continue
        os.makedirs(save_dir, exist_ok=True)

        image = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        H, W = image.shape[:2]

        out = moge_infer(model, params, jnp.asarray(image)[None],
                         resolution_level=resolution_level)
        points = np.asarray(out.points[0])
        depth = np.asarray(out.depth[0])
        mask = np.asarray(out.mask[0])
        normal = np.asarray(out.normal[0]) if out.normal is not None else None

        np.save(os.path.join(save_dir, "depth.npy"), depth)
        np.save(os.path.join(save_dir, "points.npy"), points)
        Image.fromarray((mask * 255).astype(np.uint8)).save(
            os.path.join(save_dir, "mask.png"))
        if normal is not None:
            vis = ((normal * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
            Image.fromarray(vis).save(os.path.join(save_dir, "normal.png"))
        try:
            import cv2

            cv2.imwrite(os.path.join(save_dir, "depth.exr"), depth,
                        [cv2.IMWRITE_EXR_TYPE, cv2.IMWRITE_EXR_TYPE_FLOAT])
        except Exception:
            pass

        with open(fov_path, "w", encoding="utf-8") as f:
            json.dump({
                "fov_x": round(float(out.fov_x_deg[0]), 2),
                "fov_y": round(float(out.fov_y_deg[0]), 2),
            }, f)

        # scene mesh in GL convention, depth-edge cleaned
        mask_clean = mask & ~depth_edge(depth, rtol=threshold)
        verts, faces, _ = image_mesh(points, mask_clean)
        verts_gl = verts * np.array([1, -1, -1], np.float32)
        write_ply(mesh_path, verts_gl, faces)
        write_ply(os.path.join(save_dir, "pointcloud.ply"), verts_gl, None)
        print(f"Processed {stem}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--project_root", default=None)
    parser.add_argument("--resolution_level", type=int, default=9)
    parser.add_argument("--threshold", type=float, default=0.04)
    args = parser.parse_args()
    run(args.input, args.output, args.resolution_level, args.threshold,
        args.project_root)


if __name__ == "__main__":
    main()
