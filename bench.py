"""Benchmark: estimated guidance-stage seconds per image on the local device.

Measures the real computational skeleton of the FOHO guidance pipeline at
production shapes (full-size DiT/VAE, 512^2 renders, 65^3 SDF grids) with
randomly initialized weights — weights change FLOP content not at all — and
composes the reference's step counts (guid_config.py: 20 denoise steps, 200
hand + 100 obj + 9x50 joint optimization iterations) into one end-to-end
estimate.

Prints ONE JSON line:
  {"metric": "guidance_sec_per_image_est", "value": S, "unit": "s/image",
   "vs_baseline": 60 / S}
vs_baseline is relative to the 60 s/image north-star (BASELINE.md); > 1 means
faster than target.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timeit(fn, *args, iters=3, warmup=1):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        # block each call: over the remote-TPU tunnel, pipelined dispatches
        # can report ready before the device work lands (observed 0.1 ms for
        # a 300 ms DiT step when only the last output was awaited)
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main() -> None:
    import jax

    from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    import jax.numpy as jnp
    import numpy as np

    from followmyhold_tpu.configs.guidance import OptimizationConfig
    from followmyhold_tpu.diffusion.guidance import (
        GuidanceTargets,
        GuidedSampler,
        init_pose,
    )
    from followmyhold_tpu.diffusion.scheduler import make_schedule
    from followmyhold_tpu.models.hunyuan import (
        DiTConfig,
        HunyuanDiT,
        ShapeVAE,
        ShapeVAEConfig,
    )
    from followmyhold_tpu.models.mano import synthetic_mano
    from followmyhold_tpu.ops.camera import GuidanceCamera

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cfg = OptimizationConfig()  # reference step counts

    # full-size compute skeleton
    dit_cfg = DiTConfig()                  # 2048 hidden, 8+16 blocks
    vae_cfg = ShapeVAEConfig()             # 3072x64 latents, width 1024 x16
    H = W = 512
    num_latents = vae_cfg.num_latents
    cond_tokens, cond_dim = 1370, dit_cfg.context_dim

    dit = HunyuanDiT(dit_cfg)
    vae = ShapeVAE(vae_cfg)
    cam = GuidanceCamera(height=H, width=W, fov_deg=45.0)
    sampler = GuidedSampler(dit=dit, vae=vae, camera=cam, config=cfg,
                            max_verts=24576, max_faces=49152, vae_chunk=8192,
                            raster_faces_per_tile=4096)

    from followmyhold_tpu.utils.params import fast_init

    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, num_latents, vae_cfg.embed_dim))
    cond_cat = jax.random.normal(jax.random.key(1), (2, cond_tokens, cond_dim),
                                 jnp.bfloat16)
    print("# init dit params (eval_shape)...", file=sys.stderr)
    dit_params = fast_init(dit.init, latents, jnp.zeros(1), cond_cat[:1])
    print("# init vae params (eval_shape)...", file=sys.stderr)
    vae_params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))

    sched = make_schedule(sigmas=np.linspace(0, 1, cfg.num_inference_steps))

    # --- DiT CFG denoise step (cond passed as an argument: closed-over
    # device arrays become embedded constants and exhaust HBM) ---
    @jax.jit
    def dit_step(params, lat, cond):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        eps = dit.apply(params, lat_in, jnp.full((2,), 0.5), cond)
        eps_c, eps_u = jnp.split(eps, 2, axis=0)
        return eps_u + 5.0 * (eps_c - eps_u)

    t_dit = _timeit(dit_step, dit_params, latents, cond_cat, iters=10)
    print(f"# dit cfg step: {t_dit*1e3:.1f} ms", file=sys.stderr)

    # free the DiT tree before the optimization-phase measurements: the obj/
    # joint phases only need the VAE, and 16 GB HBM is tight
    del dit_params, cond_cat
    import gc

    gc.collect()

    # --- guidance targets at production resolution ---
    mano = synthetic_mano()
    rng = np.random.default_rng(0)
    mverts = np.asarray(mano.v_template)
    mverts = (mverts - mverts.mean(0)) * 4.0 + np.array([0, 0, -0.6], np.float32)
    targets = GuidanceTargets(
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

    # --- per-iteration costs of each optimization phase (single iters) ---
    import dataclasses

    one_iter_cfg = dataclasses.replace(
        cfg, optimization_steps_hand=1, optimization_steps_scale=1,
        optimization_steps_joint=1)
    s1 = dataclasses.replace(sampler, config=one_iter_cfg)

    hand_phase = jax.jit(s1._hand_phase)
    t_hand = _timeit(hand_phase, init_pose(), targets)
    print(f"# hand-opt iter: {t_hand*1e3:.1f} ms", file=sys.stderr)

    noise = jax.random.normal(jax.random.key(4), (1, num_latents, vae_cfg.embed_dim))

    obj_phase = jax.jit(lambda o, n, lat, vp, tg: s1._obj_phase(
        o, n, lat, vp, tg, sched, 10))
    t_obj = _timeit(obj_phase, init_pose(), noise, latents, vae_params, targets,
                    iters=2)
    print(f"# obj-opt iter: {t_obj*1e3:.1f} ms", file=sys.stderr)

    joint_phase = jax.jit(lambda h, o, n, lat, vp, tg: s1._joint_phase(
        h, o, n, lat, vp, tg, sched, 12, near_end=False))
    t_joint = _timeit(joint_phase, init_pose(), init_pose(), noise, latents,
                      vae_params, targets, iters=2)
    print(f"# joint-opt iter: {t_joint*1e3:.1f} ms", file=sys.stderr)

    n_joint_steps = cfg.num_inference_steps - (cfg.handopt_start_step + 2)
    est = (
        cfg.num_inference_steps * t_dit
        + cfg.optimization_steps_hand * t_hand
        + cfg.optimization_steps_scale * t_obj
        + n_joint_steps * cfg.optimization_steps_joint * t_joint
    )
    print(
        f"# est = 20*{t_dit:.3f} + 200*{t_hand:.3f} + 100*{t_obj:.3f} "
        f"+ {n_joint_steps}*50*{t_joint:.3f}",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "guidance_sec_per_image_est",
        "value": round(float(est), 3),
        "unit": "s/image",
        "vs_baseline": round(60.0 / float(est), 3),
    }))


if __name__ == "__main__":
    # one retry: the remote-compile tunnel occasionally drops a compile
    # ("Broken pipe"); the persistent cache makes the retry cheap
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"# bench attempt 1 failed ({e}); retrying", file=sys.stderr)
        main()
