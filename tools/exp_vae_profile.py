"""TPU experiment: where does the 65^3 vae decode fwd/grad time go?

Sections (each scanned x4 inside ONE jit, marginal per-iter):
  decoder  : ShapeVAEDecoder fwd and value_and_grad wrt latents
  geo      : grouped geo_query fwd and grad (feats fixed) wrt kv? no — wrt
             latent-independent q is meaningless; grad wrt kv approximates
             the bwd cost through attention + MLP
  full     : vae_query_logits fwd and value_and_grad wrt (latents, noise-ish)
  noremat  : full with remat_chunks=False (may OOM — guarded)

Run: python tools/exp_vae_profile.py
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
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(name, fn, *args, iters=4):
    try:
        out = fn(*args)
        _sync(out)
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        dt = (time.time() - t0) / iters
        print(f"# {name}: {dt * 1e3:.1f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"# {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main() -> None:
    cfg = H.VAE_FULL
    vae = H.ShapeVAE(cfg)
    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, cfg.num_latents, cfg.embed_dim),
                                jnp.float32)
    print("# init params...", flush=True)
    params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))
    print("# params ready", flush=True)

    # 65^3 grid
    n = 65
    ax = jnp.linspace(-1.01, 1.01, n)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.stack([X, Y, Z], -1).reshape(1, -1, 3)

    def scan4(f):
        # the carry perturbs the first traced arg so the measured op is NOT
        # loop-invariant (XLA would hoist it out of the scan otherwise)
        def wrapped(*args):
            def step(c, _):
                out = f(args[0], jax.tree_util.tree_map(
                    lambda a: a + c * 1e-30 if hasattr(a, "dtype") and
                    jnp.issubdtype(a.dtype, jnp.floating) else a, args[1]),
                    *args[2:])
                first = jax.tree_util.tree_leaves(out)[0]
                return c + first.ravel()[0].astype(jnp.float32) * 1e-30, None
            out, _ = jax.lax.scan(step, jnp.float32(0), None, length=4)
            return out
        return jax.jit(wrapped)

    # --- decoder only ---
    dec_fwd = scan4(lambda p, l: vae.apply(p, l / cfg.scale_factor,
                                           method=H.ShapeVAE.decode))
    timeit("decoder fwd", dec_fwd, params, latents)

    dec_loss = lambda p, l: jnp.sum(  # noqa: E731
        vae.apply(p, l / cfg.scale_factor, method=H.ShapeVAE.decode)
        .astype(jnp.float32))
    dec_grad = scan4(lambda p, l: jax.value_and_grad(
        lambda ll: dec_loss(p, ll))(l))
    timeit("decoder fwd+grad", dec_grad, params, latents)

    # --- geo only (feats fixed; grad wrt feats->kv covers attn+mlp bwd) ---
    feats = vae.apply(params, latents / cfg.scale_factor,
                      method=H.ShapeVAE.decode)

    def geo_all(p, f):
        kv = vae.apply(p, f, method=H.ShapeVAE.geo_kv)
        B, N, _ = pts.shape
        chunk = 8192
        pad = (-N) % chunk
        qp = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
        qc = qp.reshape(B, -1, chunk, 3).transpose(1, 0, 2, 3)
        nch = qc.shape[0]
        qg = qc.reshape(1, nch * B, chunk, 3)[0]
        kvg = jnp.broadcast_to(kv[None], (nch,) + kv.shape).reshape(
            nch * B, *kv.shape[1:])
        out = vae.apply(p, qg, kvg, method=H.ShapeVAE.geo_query)
        return out

    geo_fwd = scan4(geo_all)
    timeit("geo fwd (group=34, no remat)", geo_fwd, params, feats)

    geo_grad = scan4(lambda p, f: jax.value_and_grad(
        lambda ff: jnp.sum(geo_all(p, ff)))(f))
    timeit("geo fwd+grad (no remat)", geo_grad, params, feats)

    geo_grad_r = scan4(lambda p, f: jax.value_and_grad(
        lambda ff: jnp.sum(jax.checkpoint(
            lambda f2: geo_all(p, f2))(ff)))(f))
    timeit("geo fwd+grad (remat)", geo_grad_r, params, feats)

    # --- full vae_query_logits ---
    for remat in (True, False):
        tag = "remat" if remat else "noremat"
        full_fwd = scan4(lambda p, l: H.vae_query_logits(
            vae, p, l, pts, remat_chunks=remat))
        timeit(f"full fwd ({tag})", full_fwd, params, latents)
        full_grad = scan4(lambda p, l: jax.value_and_grad(
            lambda ll: jnp.sum(H.vae_query_logits(
                vae, p, ll, pts, remat_chunks=remat)))(l))
        timeit(f"full fwd+grad ({tag})", full_grad, params, latents)


if __name__ == "__main__":
    main()
