"""NaN-safe differentiable norms.

sqrt(sum(x^2)) has a NaN gradient at x = 0, and `where`/`maximum` guards do
NOT block it (0 * NaN = NaN in the chain rule). The double-where pattern
evaluates sqrt only on a safe operand, so both value AND gradient are clean
at zero. Padded mesh buffers make zero-length vectors routine here, so every
differentiated norm in the framework goes through these.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-12) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    small = sq < eps
    return jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, sq)))


def safe_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    small = sq < eps
    inv = jnp.where(small, 0.0, 1.0 / jnp.sqrt(jnp.where(small, 1.0, sq)))
    return x * inv
