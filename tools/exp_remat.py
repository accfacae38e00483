"""TPU experiment: vae_query_logits grad time vs remat knobs.

The guidance loop differentiates the full 65^3 VAE decode every obj/joint
iteration (550 iters/image); remat_blocks / remat_chunks trade one extra
forward (~225 ms) for activation HBM. This measures all four combos at bench
shapes to pick the default (VERDICT r2 item 5).

Run: python tools/exp_remat.py            (on the TPU)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.configs.guidance import OptimizationConfig
from followmyhold_tpu.models.hunyuan import (
    ShapeVAE,
    ShapeVAEConfig,
    vae_query_logits,
)
from followmyhold_tpu.ops.grid import generate_dense_grid_points
from followmyhold_tpu.utils.params import fast_init


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def _timeit(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters


def main() -> None:
    cfg = OptimizationConfig()
    res = cfg.octree_resolution
    xyz, _, _ = generate_dense_grid_points([-1.1] * 3, [1.1] * 3, res)
    xyz = jnp.asarray(xyz)

    base_cfg = ShapeVAEConfig()
    latents = jax.random.normal(jax.random.key(0),
                                (1, base_cfg.num_latents, base_cfg.embed_dim))
    print("# init vae params...", file=sys.stderr, flush=True)
    vae0 = ShapeVAE(base_cfg)
    params = fast_init(vae0.init, latents, jnp.zeros((1, 8, 3)))

    for blocks in (True, False):
        vae = ShapeVAE(dataclasses.replace(base_cfg, remat_blocks=blocks))
        for chunks in (True, False):
            tag = f"blocks={int(blocks)} chunks={int(chunks)}"
            try:
                @jax.jit
                def vae_grad(vp, lat, _vae=vae, _chunks=chunks):
                    return jax.grad(lambda l: jnp.sum(vae_query_logits(
                        _vae, vp, l, xyz[None], 8192,
                        remat_chunks=_chunks)))(lat)

                t = _timeit(vae_grad, params, latents, iters=3)
                print(f"# vae_grad {tag}: {t*1e3:.1f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"# vae_grad {tag} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                traceback.print_exc(file=sys.stderr)


if __name__ == "__main__":
    main()
