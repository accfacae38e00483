"""Runtime size profiles.

FOHO_TPU_PROFILE=full (default) runs production shapes (512^2 crops, 64^3
SDF grids, reference step counts). FOHO_TPU_PROFILE=tiny shrinks every knob
for single-core CPU smoke runs and integration tests — same code paths, same
artifact grammar, ~1000x less compute.
"""

from __future__ import annotations

import os

from followmyhold_tpu.configs.guidance import OptimizationConfig


def profile_name() -> str:
    return os.environ.get("FOHO_TPU_PROFILE", "full")


def is_tiny() -> bool:
    return profile_name() == "tiny"


def crop_size() -> int:
    return 64 if is_tiny() else 512


def optimization_config() -> OptimizationConfig:
    if is_tiny():
        return OptimizationConfig(
            num_inference_steps=6,
            optimization_steps_hand=3,
            optimization_steps_scale=2,
            optimization_steps_joint=2,
            octree_resolution=12,
            final_octree_resolution=16,
        )
    return OptimizationConfig()


def hunyuan_octree_resolution() -> int:
    """Stage-5 export resolution: reference 384 (geometry/hunyuan.py:70);
    tiny CPU profile shrinks it like every other knob."""
    return 24 if is_tiny() else 384


def guidance_mesh_caps() -> dict:
    if is_tiny():
        return dict(max_verts=2048, max_faces=4096, vae_chunk=512,
                    raster_faces_per_tile=512)
    # raster capacity: true per-tile max measured at 16216 on the 61k-face
    # bench mesh (see OptimizationConfig.raster_faces_per_tile)
    return dict(max_verts=32768, max_faces=65536, vae_chunk=8192,
                raster_faces_per_tile=24576)
