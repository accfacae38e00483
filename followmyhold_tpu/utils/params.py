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


def scheduler_config(name: str = "hunyuan_scheduler") -> dict:
    """Checkpoint scheduler config saved by the converter
    (assets_root()/params/<name>.json), e.g. {"shift": 1.0}.

    The reference applies the checkpoint scheduler_config's `shift` inside
    set_timesteps even for the explicitly-passed linspace(0,1) sigmas
    (schedulers.py:199-202), so a real checkpoint shipping shift != 1 must
    reach every make_schedule call — both the HOI sampling stage and the
    guided sampler read it from here."""
    import json

    path = os.path.join(assets_root(), "params", f"{name}.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_scheduler_config(cfg: dict, name: str = "hunyuan_scheduler") -> str:
    import json

    path = os.path.join(assets_root(), "params", f"{name}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path


def scheduler_shift() -> float:
    return float(scheduler_config().get("shift", 1.0))


def fast_init(init_fn: Callable[..., Any], *args, seed: int = 0, scale: float = 0.02):
    """Build a param tree WITHOUT running the init forward pass.

    jax.eval_shape traces init_fn abstractly (no device compute — big-model
    init over a remote TPU tunnel otherwise takes minutes), then ONE jitted
    program fills all leaves with small random values ON DEVICE (host->device
    transfer of multi-GB param trees over the tunnel is the other bottleneck).
    For benchmarking and smoke runs only; real weights come from
    load_or_init/converted ckpts.
    """
    shapes = jax.eval_shape(init_fn, jax.random.key(seed), *args)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    @jax.jit
    def build(key):
        keys = jax.random.split(key, len(leaves))
        return [
            (jax.random.normal(k, l.shape, jax.numpy.float32) * scale).astype(l.dtype)
            for k, l in zip(keys, leaves)
        ]

    return jax.tree_util.tree_unflatten(treedef, build(jax.random.key(seed)))
