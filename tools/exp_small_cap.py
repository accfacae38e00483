"""TPU experiment: two-tier refine capacity (lax.cond small branch) A/B (r5).

The in-loop hier decode pads its refine query set to 9*cell_cap = 92,160
points for static shapes, while the bench mesh needs far fewer; the
small_cell_cap lax.cond (models/hunyuan.vae_query_logits_hier_grid) takes a
9*6144 = 55,296-point branch whenever the selected cells + deduped points
fit — exact everywhere. This measures the obj/joint per-iteration marginal
with the branch ON (6144) vs OFF (None) in ONE session, min-of-5 timing,
plus a repeat of ON for the drift floor.

Expected from the exp_ab_caps slope (~15 ms/iter per 1024 cells of
padding): ~-60 ms/iter when the small branch is taken every iteration.

Run on TPU: python tools/exp_small_cap.py      (~30 min incl. compiles)
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
    """Min-of-N: robust to the tunnel's additive noise spikes."""
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
        inloop_coarse_factor=2, inloop_cell_cap=10240, vae_remat="none")
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

    def measure(tag, small):
        def pair(n_steps):
            c = dataclasses.replace(
                cfg, optimization_steps_hand=n_steps,
                optimization_steps_scale=n_steps,
                optimization_steps_joint=n_steps)
            return dataclasses.replace(base, config=c, inloop_small_cap=small)

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
        print(f"# {tag} (small_cap={small}): obj {obj*1e3:.1f} ms, "
              f"joint {joint*1e3:.1f} ms", flush=True)
        return obj, joint

    off = measure("OFF", None)
    on = measure("ON", 6144)
    on2 = measure("ON2", 6144)
    print(f"# small-branch win (ON-OFF): obj {1e3*(on[0]-off[0]):+.1f}, "
          f"joint {1e3*(on[1]-off[1]):+.1f} ms/iter", flush=True)
    print(f"# in-session drift (ON2-ON): obj {1e3*(on2[0]-on[0]):+.1f}, "
          f"joint {1e3*(on2[1]-on[1]):+.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
