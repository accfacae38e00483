"""Torch-checkpoint -> Flax parameter conversion.

The reference's five model families ship torch checkpoints (HaMeR ViT-H,
MoGe-2/DINOv2, Hunyuan3D-2 DiT+ShapeVAE, GroundingDINO+SAM2, FLUX). Each
converter maps a torch state dict onto this framework's Flax param trees and
saves them with utils.params.save_params so every stage picks them up
(SURVEY.md §7 hard part #4: layout fidelity — qkv packing, conv transposes,
6d-rot head ordering — is what these helpers encode).

Usage:
    python -m followmyhold_tpu.convert.hamer --ckpt hamer.ckpt
"""

from followmyhold_tpu.convert.common import (
    ConversionReport,
    conv_kernel,
    dense_kernel,
    put,
)

__all__ = ["ConversionReport", "conv_kernel", "dense_kernel", "put"]
