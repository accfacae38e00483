"""Align Hunyuan HOI mesh -> MoGe mesh; write {id}_hoi_mesh.npy transforms.

Parity with src/foho/alignment/h2m.py:12-58 (same ICP knobs: coarse 50 it @
1k/5k, fine 100 it @ 5k/10k, 20% outliers, scale in [0.7, 3.0]).
"""

from __future__ import annotations

import argparse
import glob
import os

from followmyhold_tpu.alignment.mesh_align import align_meshes_impl


def run(hunyuan_mesh_dir: str, moge_out_dir: str, h2m_rt_dir: str) -> None:
    meshes = sorted(glob.glob(os.path.join(hunyuan_mesh_dir, "*.ply")))
    if not meshes:
        print(f"No Hunyuan HOI meshes found in {hunyuan_mesh_dir}")
        return
    os.makedirs(h2m_rt_dir, exist_ok=True)

    for mesh_path in meshes:
        base = os.path.basename(mesh_path)
        image_id = base.split("_")[0]
        stem = os.path.splitext(base)[0]
        out_path = os.path.join(h2m_rt_dir, f"{stem}.npy")
        if os.path.exists(out_path):
            print(f"{image_id} transform exists, skipping")
            continue

        moge_dir = os.path.join(moge_out_dir, f"{image_id}_cropped_hoi")
        target = None
        for name in ("mesh.ply", "pointcloud.ply"):
            cand = os.path.join(moge_dir, name)
            if os.path.isfile(cand):
                target = cand
                break
        if target is None:
            print(f"No MoGe mesh found for {image_id} in {moge_dir}. Skipping.")
            continue

        align_meshes_impl(
            source_mesh_path=mesh_path,
            target_mesh_path=target,
            transform_path=os.path.join(h2m_rt_dir, stem),
            transformed_mesh_path=None,
            fixed_scale=False, outliers=0.2,
            test_rotations=False, test_reflections=False, on_surface=False,
            iterations_coarse=50, count_source_coarse=1000,
            count_target_coarse=5000, iterations_fine=100,
            count_source_fine=5000, count_target_fine=10000,
            min_scale=0.7, max_scale=3.0, plot=False,
        )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hunyuan_mesh_dir", required=True)
    parser.add_argument("--moge_out_dir", required=True)
    parser.add_argument("--h2m_rt_dir", required=True)
    args = parser.parse_args()
    run(args.hunyuan_mesh_dir, args.moge_out_dir, args.h2m_rt_dir)


if __name__ == "__main__":
    main()
