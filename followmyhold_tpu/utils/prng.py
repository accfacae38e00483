"""Seeded PRNG discipline.

The reference fixes seeds per stage (inpaint seed 2: preprocess/inpaint.py:74,
hunyuan seed 2025: geometry/hunyuan.py:93, guidance seed 2: guidance/run.py:120).
Here every stage derives jax.random keys from one root key via fold_in on a
stable stage tag, so runs are reproducible and order-independent across the
image shard.
"""

from __future__ import annotations

import hashlib

import jax

# Stage seeds mirroring the reference constants.
SEED_INPAINT = 2
SEED_HUNYUAN = 2025
SEED_GUIDANCE = 2


def stage_key(seed: int, stage: str, image_id: str | int = 0) -> jax.Array:
    """Derive a per-stage, per-image key: root(seed) ∘ stage ∘ image."""
    key = jax.random.key(seed)
    key = jax.random.fold_in(key, _stable_tag(stage))
    key = jax.random.fold_in(key, _stable_tag(image_id))
    return key


def _stable_tag(value: str | int) -> int:
    if isinstance(value, int):
        return value & 0x7FFFFFFF
    digest = hashlib.sha256(value.encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
