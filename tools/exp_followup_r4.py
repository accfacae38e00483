"""Round-4 follow-up measurements (one TPU session, sequential):

1. True per-tile face counts for the bench raster mesh at 128x128/K=8192 —
   the tile sweep's npix drift (65460 at K=8192 vs 65523 at small tiles)
   says the bin cap silently drops faces on the 61k-face bench mesh.
2. Geo-decoder cost split (kv vs attention head vs MLP tail) for the
   in-loop decode shapes — is the 24%-MFU fwd attention-bound or
   bandwidth-bound?
3. Export compose timing, interleaved pt_ids vs host-recompute x3 each
   (the single-shot profile measured 11.3 s vs 2.3 s, almost certainly a
   first-call page-fault artifact — settle it).

Run: python tools/exp_followup_r4.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models import hunyuan as H
from followmyhold_tpu.utils.params import fast_init


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def timeit(label, fn, *args, iters=3, warmup=1, div=1.0):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    dt = (time.time() - t0) / iters / div
    print(f"# {label}: {dt*1e3:.2f} ms", flush=True)
    return dt


def section_counts():
    from followmyhold_tpu.ops.camera import GuidanceCamera
    from followmyhold_tpu.ops.rasterizer import _bin_faces, _face_screen
    from followmyhold_tpu.ops.surface import marching_tets

    res = 64
    n = res + 1
    g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf0 = jnp.asarray((np.sqrt(X**2 + Y**2 + Z**2) - 0.8).reshape(-1))
    lo = jnp.asarray([-1.1] * 3)
    hi = jnp.asarray([1.1] * 3)
    mesh = jax.jit(lambda s: marching_tets(s, lo, hi, res, max_verts=65536,
                                           max_faces=131072))(sdf0)
    cam = GuidanceCamera(height=512, width=512, fov_deg=60.0)
    verts = mesh.verts + jnp.asarray([0.0, 0.0, -2.5])
    tri = _face_screen(cam, verts, mesh.faces)
    valid = (mesh.face_mask > 0) & jnp.all(tri[..., 2] > cam.znear, axis=-1)
    for th, tw in ((128, 128), (32, 128)):
        # capacity 1 << 17 >> any real count: measure TRUE counts
        _, counts, _, _, _, _ = _bin_faces(tri, valid, 512, 512, th, tw,
                                           1 << 17, 0.7)
        c = np.asarray(counts)
        print(f"# bin counts {th}x{tw}: max={c.max()} sum={c.sum()} "
              f"top4={np.sort(c)[-4:].tolist()}", flush=True)


def section_vae_split():
    cfg = H.VAE_FULL
    vae = H.ShapeVAE(cfg)
    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, cfg.num_latents, cfg.embed_dim),
                                jnp.float32)
    params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))

    kv_fn = jax.jit(lambda p, l: H.vae_decode_kv(vae, p, l))
    kv = kv_fn(params, latents)
    timeit("vae decode+kv (once per iter)", kv_fn, params, latents)

    # in-loop-like query set: 131072 points (coarse 36k + fine 92k rounded)
    q = jax.random.uniform(key, (1, 131072, 3), jnp.float32, -1.1, 1.1)

    def head_only(p, k, qq):
        def step(c, _):
            qc = qq[0].reshape(16, 8192, 3)
            qr, am = vae.apply(p, qc, jnp.broadcast_to(k, (16,) + k.shape[1:]),
                               method=H.ShapeVAE.geo_query_head)
            return c + qr.sum() * 1e-12 + am.sum() * 1e-12, ()
        return jax.lax.scan(step, 0.0, None, length=4)[0]

    def full_q(p, k, qq):
        def step(c, _):
            out = H._geo_query_grouped(vae, p, k, qq, 8192)
            return c + out.sum() * 1e-12, ()
        return jax.lax.scan(step, 0.0, None, length=4)[0]

    def full_q_grad(p, k, qq):
        def step(c, _):
            g = jax.grad(lambda kk: H._geo_query_grouped(
                vae, p, kk, qq, 8192, remat="tail").sum())(k)
            return c + g.sum() * 1e-12, ()
        return jax.lax.scan(step, 0.0, None, length=4)[0]

    timeit("geo head (embed+proj+attn) 131k pts", jax.jit(head_only),
           params, kv, q, div=4)
    timeit("geo full query 131k pts fwd", jax.jit(full_q), params, kv, q,
           div=4)
    timeit("geo full query 131k pts grad(kv) tail-remat",
           jax.jit(full_q_grad), params, kv, q, div=4)


def section_compose():
    from followmyhold_tpu.models.hunyuan import (
        EXPORT_CELL_CAP,
        ShapeVAE,
        compose_hierarchical_grid,
        hierarchical_decode_fn,
    )

    res = 384
    cfg = H.VAE_FULL
    vae = ShapeVAE(cfg)
    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, cfg.num_latents, cfg.embed_dim),
                                jnp.float32)
    params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))
    decode_fn = hierarchical_decode_fn(vae, 1.1, res, chunk=8192)
    g_c, ids, fine, n_sel, n_pts = decode_fn(params, latents)
    t0 = time.time()
    g_c_h = np.asarray(g_c)
    ids_h = np.asarray(ids)
    fine_h = np.asarray(fine)
    print(f"# D2H g_c+ids+fine ({(g_c.size+ids.size+fine.size)*4/1e6:.0f} "
          f"MB): {(time.time()-t0)*1e3:.0f} ms", flush=True)
    for it in range(3):
        for mode, pid in (("pt_ids", ids_h), ("host-recompute", None)):
            t0 = time.time()
            compose_hierarchical_grid(g_c_h, fine_h, res,
                                      expect_n_pts=int(n_pts), pt_ids=pid)
            print(f"# compose[{it}] {mode}: {(time.time()-t0)*1e3:.0f} ms",
                  flush=True)


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    section_counts()
    section_vae_split()
    section_compose()


if __name__ == "__main__":
    main()
