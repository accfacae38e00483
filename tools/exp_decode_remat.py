"""TPU experiment: in-loop decode remat mode A/B at production shapes (r5).

The joint-split experiment pinned the in-loop decode at ~246 ms/iter
(obj_iter 351 minus the 105 ms fixed-mesh obj-render part) — the dominant
slice of the joint iteration (59%). The remat knob was last A/B'd on the
DENSE 65^3 decode (r3: 'tail' slower than 'full', 452 vs 435 ms grad
epoch) and the default flipped to 'tail' together with the hier decode
without a post-hier re-measurement (CLAUDE.md: "re-try only combined with
hier"). The hier decode queries ~128k points vs dense 274k, which shifts
the HBM-residual vs recompute trade — this measures the obj-phase
per-iteration marginal (scan-length differencing, the bench pattern) for
remat in {tail, full, none} in ONE session so tunnel drift cancels.

Run on TPU: python tools/exp_decode_remat.py      (~30 min incl. compiles)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.configs.guidance import OptimizationConfig
from followmyhold_tpu.diffusion import guidance as G
from followmyhold_tpu.diffusion.scheduler import make_schedule
from followmyhold_tpu.models.hunyuan import ShapeVAE, ShapeVAEConfig
from followmyhold_tpu.models.mano import synthetic_mano
from followmyhold_tpu.ops.camera import GuidanceCamera
from followmyhold_tpu.utils.params import fast_init


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def _timeit(fn, *args, iters=5):
    """Min-of-N: the tunnel adds large positive noise spikes (hundreds of ms
    observed 2026-08-20, swamping a mean-of-2 difference), and min is robust
    to additive spikes while mean is not."""
    _sync(fn(*args))  # compile
    best = None
    for _ in range(iters):
        t0 = time.time()
        _sync(fn(*args))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = OptimizationConfig()
    vae_cfg = ShapeVAEConfig()
    H = W = 512
    cam = GuidanceCamera(height=H, width=W, fov_deg=45.0)
    base = G.GuidedSampler(
        dit=None, vae=ShapeVAE(vae_cfg), camera=cam, config=cfg,
        max_verts=32768, max_faces=65536, vae_chunk=8192,
        inloop_coarse_factor=2, inloop_cell_cap=10240)
    vae = base.vae

    latents = jax.random.normal(jax.random.key(0),
                                (1, vae_cfg.num_latents, vae_cfg.embed_dim))
    print("# init vae params (eval_shape)...", file=sys.stderr, flush=True)
    vae_params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))
    noise = jax.random.normal(jax.random.key(4), latents.shape)

    mano = synthetic_mano()
    rng = np.random.default_rng(0)
    mverts = np.asarray(mano.v_template)
    mverts = (mverts - mverts.mean(0)) * 4.0 + np.array([0, 0, -0.6], np.float32)
    targets = G.GuidanceTargets(
        mano_verts_moge=jnp.asarray(mverts),
        mano_faces=mano.faces,
        j_regressor=mano.j_regressor,
        hamer_2d_kps=jnp.asarray(rng.uniform(100, 400, (21, 2)).astype(np.float32)),
        moge_normal=jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32)),
        moge_disp=jnp.asarray(rng.uniform(0, 1, (H, W)).astype(np.float32)),
        hand_mask=jnp.zeros((H, W), bool).at[150:350, 150:350].set(True),
        obj_mask=jnp.zeros((H, W), bool).at[200:420, 200:420].set(True),
        t_h2m=jnp.eye(4).at[2, 3].set(-0.6),
    )
    sched = make_schedule(sigmas=np.linspace(0, 1, cfg.num_inference_steps))

    def measure_obj(tag, remat):
        def pair(n_steps):
            c = dataclasses.replace(
                cfg, optimization_steps_hand=n_steps,
                optimization_steps_scale=n_steps,
                optimization_steps_joint=n_steps)
            return dataclasses.replace(base, config=c, vae_remat=remat)

        s1, s5 = pair(1), pair(5)

        def obj_phase(s):
            return jax.jit(lambda o, n, lat, vp, tg: s._obj_phase(
                o, n, lat, vp, tg, sched, 10))

        t1 = _timeit(obj_phase(s1), G.init_pose(), noise, latents, vae_params,
                     targets)
        t5 = _timeit(obj_phase(s5), G.init_pose(), noise, latents, vae_params,
                     targets)
        obj = max((t5 - t1) / 4, 0.0)
        print(f"# remat={tag}: obj {obj*1e3:.1f} ms/iter", flush=True)
        return obj

    results = {m: measure_obj(m, m) for m in ("tail", "full", "none")}
    # repeat the default for an in-session drift floor
    results["tail2"] = measure_obj("tail2", "tail")
    best = min(("tail", "full", "none"), key=lambda m: results[m])
    print(f"# best: remat={best} "
          f"({1e3*(results['tail'] - results[best]):+.1f} ms/iter vs tail; "
          f"drift floor {1e3*abs(results['tail2']-results['tail']):.1f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
