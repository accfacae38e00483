"""Benchmark: estimated guidance-stage seconds per image on the local device.

Measures the real computational skeleton of the FOHO guidance pipeline at
production shapes (full-size DiT/VAE, 512^2 renders, 65^3 SDF grids) with
randomly initialized weights — weights change FLOP content not at all — and
composes the reference's step counts (guid_config.py: 20 denoise steps, 200
hand + 100 obj + 9x50 joint optimization iterations) into one end-to-end
estimate.

Robustness (round-1 postmortem):
- every measurement syncs via a device->host transfer: over the remote-TPU
  tunnel, block_until_ready() returned before device work landed (a 300 ms
  DiT step "measured" 0.1 ms);
- every section is individually fallible; a failed section records null and
  the JSON line is ALWAYS printed (round 1 recorded only a traceback);
- the JSON payload is re-emitted after EVERY completed section with
  "partial": true (round-4 postmortem: a driver timeout left the official
  capture numberless because the line printed only at the very end) — the
  last stdout line always parses;
- FOHO_BENCH_BUDGET=<seconds> skips sections once elapsed exceeds it;
- FOHO_BENCH_ONLY=dit,hand,obj,joint,breakdown selects sections.

stderr carries the per-component breakdown (VAE decode fwd/grad, marching
tets grad, rasterizer fwd/grad) used to target kernel work.

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
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

RESULTS: dict = {}
_START = time.time()


def _budget_blown() -> bool:
    """FOHO_BENCH_BUDGET=<seconds>: once elapsed exceeds it, remaining
    sections are skipped so the (incrementally emitted) JSON line still
    lands before a driver-side timeout kills the process."""
    budget = os.environ.get("FOHO_BENCH_BUDGET", "")
    if not budget:
        return False
    return (time.time() - _START) > float(budget)


def _sync(out):
    """Force completion: D2H copy of one (small) output leaf. The remote
    runtime can only serve the copy after the producing executable finishes,
    unlike block_until_ready which has been observed to return early."""
    import jax
    import numpy as np

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


def _section(name):
    only = os.environ.get("FOHO_BENCH_ONLY", "")
    return (not only) or (name in only.split(","))


def _run_section(name, fn):
    if not _section(name):
        return
    if _budget_blown():
        print(f"# section {name} SKIPPED: FOHO_BENCH_BUDGET "
              f"({os.environ['FOHO_BENCH_BUDGET']}s) exceeded at "
              f"{time.time()-_START:.0f}s", file=sys.stderr)
        return
    try:
        t0 = time.time()
        fn()
        print(f"# section {name} done in {time.time()-t0:.0f}s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — record and continue
        print(f"# section {name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
    # timeout-proofing (VERDICT r4 #1: the official r4 capture was rc=124
    # with parsed=null because the JSON printed only at the very end): emit
    # the payload after EVERY section so a driver timeout mid-run still
    # leaves a parseable last line with the completed components.
    emit(intermediate=True)


def main() -> None:
    if _budget_blown():  # budget already exhausted: skip even the setup
        print("# FOHO_BENCH_BUDGET exhausted before setup; emitting empty "
              "payload", file=sys.stderr)
        return
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
        vae_query_logits,
    )
    from followmyhold_tpu.models.mano import synthetic_mano
    from followmyhold_tpu.ops.camera import GuidanceCamera
    from followmyhold_tpu.utils.params import fast_init

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
                            max_verts=32768, max_faces=65536, vae_chunk=8192,
                            # production capacity (the old explicit 8192 here
                            # silently dropped faces: the bench mesh's true
                            # per-tile max is 16216 — commit 5e34c22)
                            raster_faces_per_tile=int(
                                os.environ.get("FOHO_RASTER_FPT_BENCH",
                                               "24576")),
                            inloop_coarse_factor=int(
                                os.environ.get("FOHO_INLOOP_CF", "2")),
                            inloop_cell_cap=int(
                                os.environ.get("FOHO_INLOOP_CAP", "10240")),
                            # two-tier refine capacity knob; 0 (default)
                            # disables the lax.cond small branch — measured
                            # net-negative over the tunnel (exp_small_cap)
                            inloop_small_cap=(int(
                                os.environ.get("FOHO_INLOOP_SMALL", "0"))
                                or None),
                            vae_remat=os.environ.get("FOHO_VAE_REMAT", "none"))

    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, num_latents, vae_cfg.embed_dim))
    print("# init vae params (eval_shape)...", file=sys.stderr)
    vae_params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))

    sched = make_schedule(sigmas=np.linspace(0, 1, cfg.num_inference_steps))

    # ------------------------------------------------------------------ #
    # DiT CFG step
    # ------------------------------------------------------------------ #
    def bench_dit():
        cond_cat = jax.random.normal(jax.random.key(1),
                                     (2, cond_tokens, cond_dim), jnp.bfloat16)
        print("# init dit params (eval_shape)...", file=sys.stderr)
        dit_params = fast_init(dit.init, latents, jnp.zeros(1), cond_cat[:1])

        @jax.jit
        def dit_step(params, lat, cond):
            lat_in = jnp.concatenate([lat, lat], axis=0)
            eps = dit.apply(params, lat_in, jnp.full((2,), 0.5), cond)
            eps_c, eps_u = jnp.split(eps, 2, axis=0)
            return eps_u + 5.0 * (eps_c - eps_u)

        RESULTS["dit"] = _timeit(dit_step, dit_params, latents, cond_cat, iters=5)
        print(f"# dit cfg step: {RESULTS['dit']*1e3:.1f} ms", file=sys.stderr)

        # scanned steady-state step: the 30-step HOI stage is ONE lax.scan
        # jit (diffusion/pipeline.denoise_latents), so it pays no per-step
        # dispatch/sync — account it at the scanned rate (measured ~245 vs
        # ~305 ms dispatched, tools/exp_dit_bk.py). The guidance loop's 20
        # steps DO dispatch per step (phases interleave) and stay at `dit`.
        @jax.jit
        def dit_scan4(params, lat, cond):
            def body(carry, _):
                lat_in = jnp.concatenate([carry, carry], axis=0)
                eps = dit.apply(params, lat_in, jnp.full((2,), 0.5), cond)
                eps_c, eps_u = jnp.split(eps, 2, axis=0)
                guided = eps_u + 5.0 * (eps_c - eps_u)
                # thread the carry through the measured op so XLA cannot
                # hoist the loop-invariant forward out of the scan
                return carry + guided.astype(carry.dtype) * 1e-30, None

            out, _ = jax.lax.scan(body, lat, None, length=4)
            return out

        RESULTS["dit_scanned"] = _timeit(dit_scan4, dit_params, latents,
                                         cond_cat, iters=2) / 4
        print(f"# dit cfg step (scanned): {RESULTS['dit_scanned']*1e3:.1f} ms",
              file=sys.stderr)
        # free before the optimization phases: 16 GB HBM is tight
        del dit_params
        import gc

        gc.collect()

    _run_section("dit", bench_dit)

    # ------------------------------------------------------------------ #
    # guidance targets at production resolution
    # ------------------------------------------------------------------ #
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
    noise = jax.random.normal(jax.random.key(4), (1, num_latents, vae_cfg.embed_dim))

    # ------------------------------------------------------------------ #
    # component breakdown (CLAUDE.md r2 priority #2): where does the 2.1 s
    # obj/joint iteration go — VAE decode grad vs marching-tets grad vs raster
    # ------------------------------------------------------------------ #
    def bench_breakdown():
        from followmyhold_tpu.ops.grid import generate_dense_grid_points
        from followmyhold_tpu.ops.rasterizer import render_normal_and_disparity
        from followmyhold_tpu.ops.surface import marching_tets, vertex_normals

        res = cfg.octree_resolution
        xyz, _, _ = generate_dense_grid_points([-1.1] * 3, [1.1] * 3, res)
        xyz = jnp.asarray(xyz)

        @jax.jit
        def vae_fwd(vp, lat):
            return vae_query_logits(vae, vp, lat, xyz[None], sampler.vae_chunk)

        RESULTS["vae_fwd"] = _timeit(vae_fwd, vae_params, latents, iters=3)
        print(f"# vae 65^3 decode fwd: {RESULTS['vae_fwd']*1e3:.1f} ms",
              file=sys.stderr)

        @jax.jit
        def vae_grad(vp, lat):
            return jax.grad(lambda l: jnp.sum(
                vae_query_logits(vae, vp, l, xyz[None], sampler.vae_chunk)))(lat)

        RESULTS["vae_grad"] = _timeit(vae_grad, vae_params, latents, iters=3)
        print(f"# vae 65^3 decode grad: {RESULTS['vae_grad']*1e3:.1f} ms",
              file=sys.stderr)

        # an object-scale SDF (sphere) for surface/raster components
        n = res + 1
        g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        sdf_np = (np.sqrt(X**2 + Y**2 + Z**2) - 0.8).reshape(-1)
        sdf0 = jnp.asarray(sdf_np)
        lo = jnp.asarray([-1.1] * 3)
        hi = jnp.asarray([1.1] * 3)

        # in-graph (scan-amortized x8) costs: a single dispatched call pays
        # ~25 ms of tunnel dispatch+sync that the real optimizer loops never
        # see — scan inside ONE jit measures what an iteration actually pays.
        def _mt(s):
            return marching_tets(s, lo, hi, res, max_verts=sampler.max_verts,
                                 max_faces=sampler.max_faces)

        def _consume(m):
            tri = m.verts[m.faces]
            return (jnp.sum(tri * m.face_mask[:, None, None])
                    + jnp.sum(m.verts * m.vert_mask[:, None]))

        @jax.jit
        def mt_fwd8(s):
            def step(c, _):
                return c + _consume(_mt(c)) * 1e-12, ()
            return jax.lax.scan(step, s, None, length=8)[0]

        RESULTS["mtets_fwd"] = _timeit(mt_fwd8, sdf0, iters=3) / 8
        print(f"# marching tets fwd: {RESULTS['mtets_fwd']*1e3:.1f} ms",
              file=sys.stderr)

        @jax.jit
        def mt_grad8(s):
            def step(c, _):
                return c + jax.grad(lambda x: _consume(_mt(x)))(c) * 1e-12, ()
            return jax.lax.scan(step, s, None, length=8)[0]

        RESULTS["mtets_grad"] = _timeit(mt_grad8, sdf0, iters=3) / 8
        print(f"# marching tets fwd+grad: {RESULTS['mtets_grad']*1e3:.1f} ms",
              file=sys.stderr)

        mesh0 = jax.jit(_mt)(sdf0)
        nfaces = int(np.asarray(mesh0.face_mask).sum())
        print(f"# bench mesh: {int(np.asarray(mesh0.vert_mask).sum())} verts, "
              f"{nfaces} faces", file=sys.stderr)
        shift = jnp.asarray([0.0, 0.0, -2.5])

        def raster_loss(verts):
            vmesh = mesh0._replace(verts=verts + shift)
            vn = vertex_normals(vmesh)
            n01, disp01, out = render_normal_and_disparity(
                cam, vmesh.verts, vmesh.faces, vn, vmesh.face_mask,
                faces_per_tile=sampler.raster_faces_per_tile)
            return jnp.sum(n01) + jnp.sum(disp01) + jnp.sum(out.alpha)

        @jax.jit
        def raster_fwd8(verts):
            def step(c, _):
                return c + raster_loss(c) * 1e-12 * jnp.ones(3), ()
            return jax.lax.scan(step, verts, None, length=8)[0]

        RESULTS["raster_fwd"] = _timeit(raster_fwd8, mesh0.verts, iters=3) / 8
        print(f"# raster 512^2 fwd: {RESULTS['raster_fwd']*1e3:.1f} ms",
              file=sys.stderr)

        @jax.jit
        def raster_grad8(verts):
            def step(c, _):
                return c + jax.grad(raster_loss)(c) * 1e-12, ()
            return jax.lax.scan(step, verts, None, length=8)[0]

        RESULTS["raster_grad"] = _timeit(raster_grad8, mesh0.verts, iters=3) / 8
        print(f"# raster 512^2 fwd+grad: {RESULTS['raster_grad']*1e3:.1f} ms",
              file=sys.stderr)

    _run_section("breakdown", bench_breakdown)

    # ------------------------------------------------------------------ #
    # per-iteration costs of each optimization phase
    # ------------------------------------------------------------------ #
    import dataclasses

    # Each phase is timed at TWO scan lengths; the slope is the true
    # per-iteration cost and the intercept the per-invocation fixed cost
    # (phase setup + dispatch/sync over the tunnel). Production invokes
    # hand/obj once and joint 9x, so multiplying a 1-iter call (fixed
    # included) by the 200/100/450 totals overstated guidance by ~10%.
    def _phase_pair(n_steps):
        c = dataclasses.replace(
            cfg, optimization_steps_hand=n_steps,
            optimization_steps_scale=n_steps, optimization_steps_joint=n_steps)
        return dataclasses.replace(sampler, config=c)

    s1 = _phase_pair(1)
    s5 = _phase_pair(5)

    def _marginal(name, t1, t5, k=5):
        m = max((t5 - t1) / (k - 1), 0.0)
        RESULTS[name] = m
        RESULTS[name + "_fixed"] = max(t1 - m, 0.0)
        print(f"# {name}-opt iter: {m*1e3:.1f} ms "
              f"(+{RESULTS[name + '_fixed']*1e3:.0f} ms/invocation fixed)",
              file=sys.stderr)

    def bench_hand():
        t1 = _timeit(jax.jit(s1._hand_phase), init_pose(), targets)
        t5 = _timeit(jax.jit(s5._hand_phase), init_pose(), targets)
        _marginal("hand", t1, t5)

    _run_section("hand", bench_hand)

    def bench_obj():
        def phase(s):
            return jax.jit(lambda o, n, lat, vp, tg: s._obj_phase(
                o, n, lat, vp, tg, sched, 10))
        t1 = _timeit(phase(s1), init_pose(), noise, latents, vae_params,
                     targets, iters=2)
        t5 = _timeit(phase(s5), init_pose(), noise, latents, vae_params,
                     targets, iters=2)
        _marginal("obj", t1, t5)

    _run_section("obj", bench_obj)

    def bench_joint():
        def phase(s):
            return jax.jit(lambda h, o, n, lat, vp, tg: s._joint_phase(
                h, o, n, lat, vp, tg, sched, 12, near_end=False))
        t1 = _timeit(phase(s1), init_pose(), init_pose(), noise, latents,
                     vae_params, targets, iters=2)
        t5 = _timeit(phase(s5), init_pose(), init_pose(), noise, latents,
                     vae_params, targets, iters=2)
        _marginal("joint", t1, t5)

    _run_section("joint", bench_joint)

    def bench_joint2():
        """Batched (vmap x2) joint phase on ONE chip: if the per-image
        marginal cost stays near the serial joint iter, the dp projection
        (est/N) is about batching efficiency, not a leap of faith."""
        def phase(s):
            # mirror _jitted_batch_phases: vmapped lax.cond executes both
            # branches, so the batched path disables the two-tier refine cap
            s = dataclasses.replace(s, inloop_small_cap=None)
            f = lambda h, o, n, lat, vp, tg: s._joint_phase(  # noqa: E731
                h, o, n, lat, vp, tg, sched, 12, near_end=False)
            return jax.jit(jax.vmap(f, in_axes=(0, 0, 0, 0, None, 0)))

        def stack(x, reps=2):
            return jax.tree_util.tree_map(
                lambda v: jnp.stack([v] * reps), x)

        t1 = _timeit(phase(s1), stack(init_pose()), stack(init_pose()),
                     stack(noise), stack(latents), vae_params,
                     stack(targets), iters=2)
        t5 = _timeit(phase(s5), stack(init_pose()), stack(init_pose()),
                     stack(noise), stack(latents), vae_params,
                     stack(targets), iters=2)
        m = max((t5 - t1) / 4, 0.0) / 2
        RESULTS["joint2_per_image"] = m
        print(f"# joint-opt iter, vmap batch=2, per image: {m*1e3:.1f} ms",
              file=sys.stderr)

    _run_section("joint2", bench_joint2)

    # ------------------------------------------------------------------ #
    # final 385^3 export: hierarchical decode + host extraction + postprocess
    # (VERDICT r2 #4: this was ~38 s/image dense and previously unbenched)
    # ------------------------------------------------------------------ #
    def bench_export():
        from followmyhold_tpu.geometry.postprocess import (
            reduce_faces,
            remove_degenerate_faces,
            remove_floaters,
        )
        from followmyhold_tpu.models.hunyuan import hierarchical_export_logits
        from followmyhold_tpu.ops.surface import marching_tets_host

        res = cfg.final_octree_resolution

        def decode():
            # includes the D2H transfer + host compose (the real cost);
            # honors FOHO_EXPORT_F16 (halved value transfer, gated)
            return hierarchical_export_logits(vae, vae_params, latents, 1.1,
                                              res, chunk=sampler.vae_chunk)

        # note: random weights give a noise field, so the surface-cell cap
        # saturates — the measured cost is the cap-limited (= worst-case
        # real-shape) fine pass, which is what production pays
        RESULTS["export_decode"] = _timeit(decode, iters=1, warmup=1)
        print(f"# export {res}^3 hierarchical decode: "
              f"{RESULTS['export_decode']:.2f} s", file=sys.stderr)

        # host extraction timed on an analytic shape (a real trained field is
        # a watertight surface; the random-weight noise field would give an
        # absurd vert count and misrepresent the cost)
        n = res + 1
        g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        sdf = (np.sqrt(X**2 + Y**2 + Z**2) - 0.8).reshape(-1)
        t0 = time.time()
        hv, hf = marching_tets_host(sdf, [-1.1] * 3, [1.1] * 3, res)
        if len(hf):
            v, f = remove_floaters(hv, hf)
            v, f = remove_degenerate_faces(v, f)
            v, f = reduce_faces(v, f)
        RESULTS["export_extract"] = time.time() - t0
        print(f"# export host extract+postprocess ({len(hv)} verts): "
              f"{RESULTS['export_extract']:.2f} s", file=sys.stderr)

    _run_section("export", bench_export)


def emit(intermediate: bool = False) -> None:
    verbose = not intermediate
    cfg_steps = dict(n_dit=20, n_hand=200, n_obj=100, n_joint=9 * 50)
    t_dit = RESULTS.get("dit")
    t_hand = RESULTS.get("hand")
    t_obj = RESULTS.get("obj")
    t_joint = RESULTS.get("joint")

    # fall back to component sums / neighbors for missing phases so a partial
    # bench still yields a (conservative) estimate
    if t_joint is None and t_obj is not None:
        t_joint = t_obj * 1.1
    if t_obj is None and t_joint is not None:
        t_obj = t_joint
    missing = [k for k, v in (("dit", t_dit), ("hand", t_hand),
                              ("obj", t_obj), ("joint", t_joint)) if v is None]
    if missing and verbose:
        print(f"# missing sections {missing}; estimate is partial",
              file=sys.stderr)

    # per-invocation fixed costs: hand and obj phases run once, joint 9x
    # (guidance.py run(): i == start / start+1 / start+2..19)
    fixed = (RESULTS.get("hand_fixed", 0.0) + RESULTS.get("obj_fixed", 0.0)
             + 9 * RESULTS.get("joint_fixed", 0.0))
    guidance = (
        cfg_steps["n_dit"] * (t_dit or 0.0)
        + cfg_steps["n_hand"] * (t_hand or 0.0)
        + cfg_steps["n_obj"] * (t_obj or 0.0)
        + cfg_steps["n_joint"] * (t_joint or 0.0)
        + fixed
    )
    # full per-image cost (VERDICT r2 #4): guidance loop + its final 385^3
    # export, plus the Hunyuan HOI-mesh stage (30 CFG steps, geometry/
    # hunyuan.py:70,89-95, + the same 384^3 export). Preprocess/MoGe/HaMeR
    # forwards are <1 s/image combined and excluded like the reference's own
    # accounting.
    export = RESULTS.get("export_decode", 0.0) + RESULTS.get("export_extract", 0.0)
    # the HOI stage's 30 CFG steps run as ONE lax.scan jit
    # (diffusion/pipeline.denoise_latents), so they pay no per-step
    # dispatch/sync — account them at the measured scanned rate; the
    # guidance loop's 20 steps DO dispatch per step and stay at `dit`
    t_dit_scan = RESULTS.get("dit_scanned", t_dit)
    hunyuan_stage = 30 * (t_dit_scan or 0.0) + export
    est = guidance + export + hunyuan_stage
    if verbose:
        print(
            f"# guidance = 20*{(t_dit or 0):.3f} + 200*{(t_hand or 0):.3f} "
            f"+ 100*{(t_obj or 0):.3f} + 450*{(t_joint or 0):.3f} "
            f"+ fixed {fixed:.1f} = {guidance:.1f} s",
            file=sys.stderr,
        )
        print(f"# export = {export:.1f} s; hunyuan_stage = 30*dit_scanned "
              f"+ export = {hunyuan_stage:.1f} s; total = {est:.1f} s/image",
              file=sys.stderr)
        if est > 0 and est != float("inf"):
            # the dp=8 number divides by 8 assuming ideal scaling AND that 8
            # concurrent host extracts overlap device work — on this 1-core
            # host they would serialize; on a real v5e-8 host (many cores)
            # the run_batch_images export pool overlaps them (VERDICT r4
            # weak #7 note).
            print(f"# dp=8 projection (batched guidance, v5e-8; host extract "
                  f"threaded across images — guidance/run.py run_batch_images "
                  f"export pool): {est / 8:.1f} s/image", file=sys.stderr)
    if est <= 0:
        est = float("inf")
    payload = {
        "metric": "sec_per_image_est",
        "value": round(float(est), 3) if est != float("inf") else None,
        "unit": "s/image",
        "vs_baseline": round(60.0 / float(est), 3) if est > 0 and est != float("inf") else 0.0,
        "partial": bool(missing) or intermediate,
        "components_ms": {k: round(v * 1e3, 1) for k, v in RESULTS.items()},
        "breakdown_s": {"guidance": round(guidance, 2),
                        "export": round(export, 2),
                        "hunyuan_stage": round(hunyuan_stage, 2)},
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — emit whatever we measured
        print(f"# bench aborted: {type(e).__name__}: {e}", file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
    emit()
