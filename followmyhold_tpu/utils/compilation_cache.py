"""Persistent XLA compilation cache.

The guidance phase graphs (value_and_grad through VAE decode -> surface
extraction -> rasterizer) take tens of minutes to compile on a single-core
host driving a remote TPU. The persistent cache amortizes that to one compile
per (shape, code) across processes and rounds.

Enabled by default under <repo>/.jax_cache; override with FOHO_TPU_JAX_CACHE
(empty string disables).
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("FOHO_TPU_JAX_CACHE")
    if cache_dir == "":
        return
    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
