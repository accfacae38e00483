"""Split the 384^3 export hierarchical decode cost into its device parts.

BENCH r4 run2 measured the deduped export decode at 22.4 s vs 11.4 s for the
old per-cell (duplicated) decode — despite querying 4.7M instead of 8.2M
points. This times each subgraph separately on the real device:

  kv        : ShapeVAE decode + geo k/v projection
  coarse    : 97^3 = 912k point geo query
  ids       : _refine_point_ids_device alone (57M-element mark + nonzero)
  fine_new  : point_cap = 72*cap = 4.72M point geo query
  fine_old  : 125*cap = 8.19M point geo query (old duplicated layout)
  compose   : host compose incl. refine_point_ids_host (np.unique of 7.7M)

Usage: python tools/exp_export_profile.py   (runs on the default device)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

from followmyhold_tpu.models.hunyuan import (  # noqa: E402
    EXPORT_CELL_CAP,
    ShapeVAE,
    ShapeVAEConfig,
    _geo_query_grouped,
    _refine_point_budget,
    _refine_point_ids_device,
    compose_hierarchical_grid,
    vae_decode_kv,
)
from followmyhold_tpu.utils.params import fast_init  # noqa: E402


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def timeit(fn, *args, iters=2, warmup=1, label=""):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"# {label}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)
    return dt


def main():
    res, cf, cap, chunk = 384, 4, EXPORT_CELL_CAP, 8192
    box = 1.1
    vae_cfg = ShapeVAEConfig()
    vae = ShapeVAE(vae_cfg)
    key = jax.random.key(0)
    latents = jax.random.normal(
        key, (1, vae_cfg.num_latents, vae_cfg.embed_dim), jnp.float32)
    params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    n_c = res // cf + 1
    n_f = res + 1
    point_cap = _refine_point_budget(cf) * cap

    kv_fn = jax.jit(lambda p, l: vae_decode_kv(vae, p, l))
    kv = kv_fn(params, latents)
    timeit(kv_fn, params, latents, label="kv")

    ax = jnp.linspace(-box, box, n_c)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts_c = jnp.stack([X, Y, Z], -1).reshape(1, -1, 3)

    coarse_fn = jax.jit(lambda p, k: _geo_query_grouped(vae, p, k, pts_c,
                                                        chunk))
    g_c = coarse_fn(params, kv)[0].reshape(n_c, n_c, n_c)
    timeit(coarse_fn, params, kv, label=f"coarse ({pts_c.shape[1]} pts)")

    ids_fn = jax.jit(lambda g: _refine_point_ids_device(g, res, cf, cap, 0.5))
    pt_ids, n_sel, n_pts = ids_fn(g_c)
    print(f"# n_sel={int(n_sel)} n_pts={int(n_pts)} point_cap={point_cap}",
          file=sys.stderr, flush=True)
    timeit(ids_fn, g_c, label="ids (mark+nonzero over 57M)")

    step_f = 2 * box / res

    def fine_new(p, k, ids):
        fi = ids // (n_f * n_f)
        fj = (ids // n_f) % n_f
        fk = ids % n_f
        pf = -box + jnp.stack([fi, fj, fk], -1).astype(jnp.float32) * step_f
        return _geo_query_grouped(vae, p, k, pf.reshape(1, -1, 3), chunk)

    fine_new_fn = jax.jit(fine_new)
    g_f = fine_new_fn(params, kv, pt_ids)
    timeit(fine_new_fn, params, kv, pt_ids,
           label=f"fine_new ({point_cap} pts)")

    n_old = 125 * cap
    pts_old = jax.random.uniform(key, (1, n_old, 3), jnp.float32, -box, box)
    fine_old_fn = jax.jit(
        lambda p, k, q: _geo_query_grouped(vae, p, k, q, chunk))
    _sync(fine_old_fn(params, kv, pts_old))
    timeit(fine_old_fn, params, kv, pts_old, label=f"fine_old ({n_old} pts)")

    # D2H + host compose (both modes)
    g_c_h = np.asarray(g_c)
    g_f_h = np.asarray(g_f)[0]
    pt_ids_h = np.asarray(pt_ids)
    for mode, ids in (("pt_ids", pt_ids_h), ("host-recompute", None)):
        t0 = time.time()
        compose_hierarchical_grid(g_c_h, g_f_h, res, coarse_factor=cf,
                                  cell_cap=cap, expect_n_pts=int(n_pts),
                                  pt_ids=ids)
        print(f"# compose (host, {mode}): {(time.time()-t0)*1e3:.1f} ms",
              file=sys.stderr, flush=True)

    t0 = time.time()
    np.asarray(fine_new_fn(params, kv, pt_ids))
    print(f"# fine_new + full D2H ({point_cap*4/1e6:.0f} MB): "
          f"{(time.time()-t0)*1e3:.1f} ms", file=sys.stderr, flush=True)

    # end-to-end: the ONE jitted decode + D2H + compose, as production runs
    from followmyhold_tpu.models.hunyuan import hierarchical_decode_fn

    decode_fn = hierarchical_decode_fn(vae, box, res, chunk=chunk,
                                       cell_cap=cap)

    def full_decode():
        g_c2, ids2, fine2, _, n2 = decode_fn(params, latents)
        return compose_hierarchical_grid(np.asarray(g_c2),
                                         np.asarray(fine2), res,
                                         expect_n_pts=int(n2),
                                         pt_ids=np.asarray(ids2))

    full_decode()
    t0 = time.time()
    full_decode()
    print(f"# FULL export decode (device+D2H+compose): "
          f"{(time.time()-t0)*1e3:.1f} ms", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
