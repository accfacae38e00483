"""Precision policy helpers.

TPU MXU matmuls default to reduced precision (bf16 passes); that is the right
choice for the neural backbones (HaMeR/MoGe/DiT) but NOT for geometry math,
where a 1e-2-relative rotation error wrecks ICP/procrustes/projection. This
module provides full-fp32 contraction wrappers for the geometry layer.

(Verified on this stack: default jnp.dot of 64x64 f32 has ~7e-2 max error;
Precision.HIGHEST gives ~3e-6.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul_f32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum_f32(subscripts: str, *operands) -> jnp.ndarray:
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
