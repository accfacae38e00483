"""Two-phase ICP mesh alignment driver (TPU-native).

Public surface mirrors the reference (src/foho/alignment/mesh_align.py:178-217):
align_meshes_impl(source, target, ...) with coarse (50 it @ 1k/5k samples) and
fine (100 it @ 5k/10k) phases, 20% outlier rejection, scale clamped to
[0.7, 3.0], optional axis-aligned rotation/reflection restarts. The solver
itself is the jitted on-device ICP from ops/icp.py instead of scipy cKDTree.
"""

from __future__ import annotations

import argparse
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.icp import (
    axis_aligned_restarts,
    compute_init_transform,
    icp,
    sample_surface,
)
from followmyhold_tpu.utils.mesh_io import load_mesh, save_mesh


def _sample(mesh, count: int, seed: int) -> np.ndarray:
    if mesh.num_faces == 0:  # point cloud: use vertices directly
        return mesh.vertices
    return sample_surface(mesh.vertices, mesh.faces, count, seed=seed)


def align_meshes_impl(
    source_mesh_path: str,
    target_mesh_path: str,
    transform_path: Optional[str] = None,
    transformed_mesh_path: Optional[str] = None,
    fixed_scale: bool = False,
    outliers: float = 0.2,
    test_rotations: bool = False,
    test_reflections: bool = False,
    on_surface: bool = False,  # accepted for surface parity; NN is always used
    iterations_coarse: int = 50,
    count_source_coarse: int = 1000,
    count_target_coarse: int = 5000,
    iterations_fine: int = 100,
    count_source_fine: int = 5000,
    count_target_fine: int = 10000,
    min_scale: float = 0.7,
    max_scale: float = 3.0,
    plot: bool = False,  # accepted, ignored (no viz backend)
    seed: int = 0,
) -> np.ndarray:
    start = time.time()
    source = load_mesh(source_mesh_path)
    target = load_mesh(target_mesh_path)

    src_pts = _sample(source, max(count_source_coarse, count_source_fine), seed)
    tgt_pts_coarse = _sample(target, count_target_coarse, seed + 1)
    tgt_pts_fine = _sample(target, count_target_fine, seed + 2)

    init_T = compute_init_transform(source.vertices, target.vertices, fixed_scale)

    cubes = None
    if test_rotations or test_reflections:
        cubes = jnp.asarray(axis_aligned_restarts(
            include_identity=True, rotations=test_rotations,
            reflections=test_reflections))

    def _apply(T, pts):
        return pts @ T[:3, :3].T + T[:3, 3]

    src_coarse = _apply(init_T, src_pts[:count_source_coarse])
    res_coarse = icp(
        jnp.asarray(src_coarse), jnp.asarray(tgt_pts_coarse),
        n_iter=iterations_coarse, init_transforms=cubes, outliers=outliers,
        fixed_scale=fixed_scale, min_scale=min_scale, max_scale=max_scale)
    T_coarse = np.asarray(res_coarse.transform)

    src_fine = _apply(T_coarse @ init_T, src_pts[:count_source_fine])
    res_fine = icp(
        jnp.asarray(src_fine), jnp.asarray(tgt_pts_fine),
        n_iter=iterations_fine, outliers=outliers,
        fixed_scale=fixed_scale, min_scale=min_scale, max_scale=max_scale)
    T_fine = np.asarray(res_fine.transform)

    final_T = (T_fine @ T_coarse @ init_T).astype(np.float32)

    if transform_path is not None:
        np.save(transform_path, final_T)
    if transformed_mesh_path is not None:
        verts = _apply(final_T, source.vertices)
        save_mesh(transformed_mesh_path, verts, source.faces)

    print(f"Elapsed time: {time.time() - start:.2f} seconds "
          f"(cost {float(res_fine.cost):.5f})")
    return final_T


def main() -> None:
    parser = argparse.ArgumentParser(description="ICP mesh alignment")
    parser.add_argument("source_mesh_path")
    parser.add_argument("target_mesh_path")
    parser.add_argument("-tp", "--transform_path", default=None)
    parser.add_argument("-tmp", "--transformed_mesh_path", default=None)
    parser.add_argument("-fs", "--fixed_scale", action="store_true")
    parser.add_argument("-o", "--outliers", type=float, default=0.2)
    parser.add_argument("-trot", "--test_rotations", action="store_true")
    parser.add_argument("-tref", "--test_reflections", action="store_true")
    parser.add_argument("-ir", "--iterations_coarse", type=int, default=50)
    parser.add_argument("-if", "--iterations_fine", type=int, default=100)
    parser.add_argument("-mis", "--min_scale", type=float, default=0.7)
    parser.add_argument("-mas", "--max_scale", type=float, default=3.0)
    args = parser.parse_args()
    align_meshes_impl(
        args.source_mesh_path, args.target_mesh_path, args.transform_path,
        args.transformed_mesh_path, args.fixed_scale, args.outliers,
        args.test_rotations, args.test_reflections, False,
        args.iterations_coarse, 1000, 5000, args.iterations_fine, 5000, 10000,
        args.min_scale, args.max_scale, False)


if __name__ == "__main__":
    main()
