"""TPU experiment: same-session A/B of the round-4 capacity changes.

VERDICT r4 weak #3: obj/joint iteration drift across BENCH_r04 captures
(obj 318->353, joint 391->421 ms) was attributed to tunnel variance, but the
two r4 config changes (in-loop cell cap 8192->10240, raster faces_per_tile
16384->24576) were never isolated within one tunnel session. This measures
the obj/joint per-iteration marginal (two scan lengths, slope = marginal —
the bench.py pattern) for:

    A  cap=8192,  fpt=24576   (r4 cap change reverted)
    B  cap=10240, fpt=24576   (current defaults)
    C  cap=10240, fpt=16384   (r4 raster-capacity change reverted; NOTE
                               16384 barely covers the bench mesh's true
                               per-tile max 16216 — A/B timing only)

in ONE process so tunnel drift cancels. B-A is the cell-cap cost (expected
~23 ms/1024 cells/iter from the r3 slope measured at cf=2 — i.e. ~0 here
because the cap only pads the REFINE gather, not the coarse pass);
B-C is the raster-capacity cost (expected ~5 ms from the r4 raster_grad
standalone A/B).

Run on TPU: python tools/exp_ab_caps.py      (~15 min incl. compiles)
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


def _timeit(fn, *args, iters=2):
    _sync(fn(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters


def main() -> None:
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    cfg = OptimizationConfig()
    vae_cfg = ShapeVAEConfig()
    H = W = 512
    cam = GuidanceCamera(height=H, width=W, fov_deg=45.0)
    base = G.GuidedSampler(
        dit=None, vae=ShapeVAE(vae_cfg), camera=cam, config=cfg,
        max_verts=32768, max_faces=65536, vae_chunk=8192,
        inloop_coarse_factor=2, vae_remat="tail")
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

    def measure(tag, cap, fpt):
        def pair(n_steps):
            c = dataclasses.replace(
                cfg, optimization_steps_hand=n_steps,
                optimization_steps_scale=n_steps,
                optimization_steps_joint=n_steps)
            return dataclasses.replace(base, config=c, inloop_cell_cap=cap,
                                       raster_faces_per_tile=fpt)

        s1, s5 = pair(1), pair(5)

        def obj_phase(s):
            return jax.jit(lambda o, n, lat, vp, tg: s._obj_phase(
                o, n, lat, vp, tg, sched, 10))

        t1 = _timeit(obj_phase(s1), G.init_pose(), noise, latents, vae_params,
                     targets)
        t5 = _timeit(obj_phase(s5), G.init_pose(), noise, latents, vae_params,
                     targets)
        obj = max((t5 - t1) / 4, 0.0)

        def joint_phase(s):
            return jax.jit(lambda h, o, n, lat, vp, tg: s._joint_phase(
                h, o, n, lat, vp, tg, sched, 12, near_end=False))

        t1 = _timeit(joint_phase(s1), G.init_pose(), G.init_pose(), noise,
                     latents, vae_params, targets)
        t5 = _timeit(joint_phase(s5), G.init_pose(), G.init_pose(), noise,
                     latents, vae_params, targets)
        joint = max((t5 - t1) / 4, 0.0)
        print(f"# {tag} (cap={cap}, fpt={fpt}): obj {obj*1e3:.1f} ms, "
              f"joint {joint*1e3:.1f} ms", flush=True)
        return obj, joint

    a = measure("A", 8192, 24576)
    b = measure("B", 10240, 24576)
    c = measure("C", 10240, 16384)
    # second B pass: in-session drift floor for interpreting the deltas
    b2 = measure("B2", 10240, 24576)
    print(f"# cell-cap 8192->10240 cost  (B-A): obj {1e3*(b[0]-a[0]):+.1f}, "
          f"joint {1e3*(b[1]-a[1]):+.1f} ms/iter", flush=True)
    print(f"# raster fpt 16384->24576 cost (B-C): obj {1e3*(b[0]-c[0]):+.1f}, "
          f"joint {1e3*(b[1]-c[1]):+.1f} ms/iter", flush=True)
    print(f"# in-session drift (B2-B): obj {1e3*(b2[0]-b[0]):+.1f}, "
          f"joint {1e3*(b2[1]-b[1]):+.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
