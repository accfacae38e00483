"""Align HaMeR MANO mesh -> Hunyuan HOI mesh; write aligned mesh.

Parity with src/foho/alignment/mano.py:12-54.
"""

from __future__ import annotations

import argparse
import glob
import os

from followmyhold_tpu.alignment.mesh_align import align_meshes_impl


def run(hamer_out_dir: str, hunyuan_mesh_dir: str, aligned_mano_dir: str) -> None:
    meshes = sorted(glob.glob(os.path.join(hamer_out_dir, "*.obj")))
    if not meshes:
        print(f"No HaMeR meshes found in {hamer_out_dir}")
        return
    os.makedirs(aligned_mano_dir, exist_ok=True)

    for mesh_path in meshes:
        base = os.path.basename(mesh_path)
        image_id = base.split("_")[0]
        stem = os.path.splitext(base)[0]
        target = os.path.join(hunyuan_mesh_dir, f"{image_id}_hoi_mesh.ply")
        out_path = os.path.join(aligned_mano_dir, f"{stem}_aligned_mano.ply")
        if os.path.exists(out_path):
            print(f"{image_id} aligned mano exists, skipping")
            continue
        if not os.path.isfile(target):
            print(f"No Hunyuan mesh for {image_id}. Skipping.")
            continue

        align_meshes_impl(
            source_mesh_path=mesh_path,
            target_mesh_path=target,
            transform_path=None,
            transformed_mesh_path=out_path,
            fixed_scale=False, outliers=0.2,
            test_rotations=False, test_reflections=False, on_surface=False,
            iterations_coarse=50, count_source_coarse=1000,
            count_target_coarse=5000, iterations_fine=100,
            count_source_fine=5000, count_target_fine=10000,
            min_scale=0.7, max_scale=3.0, plot=False,
        )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--hamer_out_dir", required=True)
    parser.add_argument("--hunyuan_mesh_dir", required=True)
    parser.add_argument("--aligned_mano_dir", required=True)
    args = parser.parse_args()
    run(args.hamer_out_dir, args.hunyuan_mesh_dir, args.aligned_mano_dir)


if __name__ == "__main__":
    main()
