"""Model parameter persistence: load converted checkpoints or seed-init.

Checkpoints live under assets_root()/params/<name>.msgpack (flax
serialization). When absent, models initialize deterministically from a fixed
seed so every stage stays runnable end-to-end without downloads; converted
real weights drop into the same slot (followmyhold_tpu.convert).
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
from flax import serialization

from followmyhold_tpu.configs.paths import assets_root


def params_path(name: str) -> str:
    return os.path.join(assets_root(), "params", f"{name}.msgpack")


def save_params(name: str, params: Any) -> str:
    path = params_path(name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_or_init(name: str, init_fn: Callable[[jax.Array], Any], seed: int = 0) -> Any:
    """Returns checkpoint params if present, else init_fn(key)."""
    template = None
    path = params_path(name)
    if os.path.exists(path):
        template = init_fn(jax.random.key(seed))
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    return init_fn(jax.random.key(seed))


def has_params(name: str) -> bool:
    return os.path.exists(params_path(name))
