"""Shared torch->flax conversion primitives.

Layout rules encoded once:
- torch nn.Linear weight [out, in]  -> flax Dense kernel [in, out] (transpose)
- torch nn.Conv2d weight [out, in, kh, kw] -> flax Conv kernel [kh, kw, in, out]
- torch LayerNorm weight/bias -> flax scale/bias
- packed qkv stays packed (both sides use one matrix here)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np


def dense_kernel(w) -> np.ndarray:
    return np.asarray(w).T


def conv_kernel(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


@dataclass
class ConversionReport:
    mapped: List[str] = field(default_factory=list)
    missing_src: List[str] = field(default_factory=list)
    unused_src: List[str] = field(default_factory=list)

    def summary(self) -> str:
        return (f"mapped {len(self.mapped)} tensors; "
                f"{len(self.missing_src)} missing, {len(self.unused_src)} unused")


def put(params: Dict[str, Any], flax_path: str, value: np.ndarray,
        report: ConversionReport) -> None:
    """Set params['params']['a']['b']...['kernel'] = value, checking shape."""
    node = params
    keys = flax_path.split("/")
    for k in keys[:-1]:
        node = node[k]
    old = node[keys[-1]]
    if tuple(np.shape(old)) != tuple(np.shape(value)):
        raise ValueError(
            f"{flax_path}: shape mismatch {np.shape(old)} vs {np.shape(value)}")
    node[keys[-1]] = np.asarray(value, dtype=np.asarray(old).dtype)
    report.mapped.append(flax_path)


def to_mutable(params) -> Dict[str, Any]:
    """flax FrozenDict/immutable tree -> nested plain dict of numpy arrays."""
    import jax

    return jax.tree_util.tree_map(np.asarray, jax.device_get(
        params if isinstance(params, dict) else dict(params)))
