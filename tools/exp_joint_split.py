"""Joint-phase per-iteration cost split (round 4).

The joint iteration (~420 ms, x450 per image = 2/3 of the single-chip
total) was never split into its parts; the standalone component numbers
cannot be summed to it because the in-loop mesh, capacities, and fusion
differ. This times each piece of GuidedSampler's joint loss_fn
(diffusion/guidance.py:501-568) at EXACT production shapes — same mesh
caps, same hier-decode knobs, same 512^2 render — each as value_and_grad
wrt the leaves the real loop differentiates, scanned x8 inside one jit
(per-dispatch tunnel RPC is ~3-25 ms; never time single calls).

Pieces:
  hand   : _transform_hand + _hand_render_losses grad wrt hand pose
  decode : step_final -> hier decode -> marching tets, grad wrt noise
  nn     : hand->obj attraction (nn_sqdist 778 x 32768), grad wrt hand verts
  hoi    : join meshes + vertex normals + 512^2 render + the 3 render
           losses + edge/reg losses, grad wrt object verts
  joint  : the full measured iteration for cross-checking the sum

Run: python tools/exp_joint_split.py       (TPU; ~5 min incl. compiles)
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

from followmyhold_tpu.configs.guidance import OptimizationConfig
from followmyhold_tpu.diffusion import guidance as G
from followmyhold_tpu.diffusion.scheduler import make_schedule, step_final
from followmyhold_tpu.models.hunyuan import ShapeVAE, ShapeVAEConfig
from followmyhold_tpu.models.mano import synthetic_mano
from followmyhold_tpu.ops.camera import GuidanceCamera
from followmyhold_tpu.ops.knn import nn_sqdist
from followmyhold_tpu.ops.losses import (
    attraction_loss,
    binary_cross_entropy,
    masked_l1,
    mesh_edge_loss,
    normal_alignment_loss,
    verts_reg_loss,
)
from followmyhold_tpu.ops.rasterizer import render_normal_and_disparity
from followmyhold_tpu.ops.surface import mesh_edges, vertex_normals
from followmyhold_tpu.utils.params import fast_init


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def _timeit(fn, *args, iters=3):
    _sync(fn(*args))  # compile
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters


def _scan(body, length=8):
    """Wrap a carry->carry body in an x<length> lax.scan jit."""

    @jax.jit
    def run(c, *rest):
        def step(carry, _):
            return body(carry, *rest), ()

        return jax.lax.scan(step, c, None, length=length)[0]

    return run


def _mesh_cache_path() -> str:
    return os.environ.get("FOHO_JS_MESH", "/tmp/js_mesh0.npz")


def _dump_mesh_cpu() -> None:
    """--dump_mesh mode: decode the fixed production-shape mesh on CPU and
    save it, so the TPU process can skip the decode compile for the nn/hoi
    parts when the tunnel compiler is dying on the decode graph (3x broken
    pipe on 2026-08-20). Params come from the same fast_init seed, and
    threefry is platform-independent, so the mesh matches the TPU one."""
    jax.config.update("jax_platforms", "cpu")
    cfg = OptimizationConfig()
    vae_cfg = ShapeVAEConfig()
    sampler_kw = dict(
        max_verts=32768, max_faces=65536, vae_chunk=8192,
        inloop_coarse_factor=int(os.environ.get("FOHO_INLOOP_CF", "2")),
        inloop_cell_cap=int(os.environ.get("FOHO_INLOOP_CAP", "10240")))
    vae = ShapeVAE(vae_cfg)
    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, vae_cfg.num_latents, vae_cfg.embed_dim))
    vae_params = fast_init(vae.init, latents, jnp.zeros((1, 8, 3)))
    noise = jax.random.normal(jax.random.key(4), latents.shape)
    sched = make_schedule(sigmas=np.linspace(0, 1, cfg.num_inference_steps))
    cam = GuidanceCamera(height=512, width=512, fov_deg=45.0)
    s = G.GuidedSampler(dit=None, vae=vae, camera=cam, config=cfg, **sampler_kw)
    xyz, bbox, res = s._grid()
    mesh, _, _ = G._decode_object(
        vae, vae_params, sched, 10, noise, latents, xyz, bbox, res,
        s.max_verts, s.max_faces, s.vae_chunk, s.inloop_coarse_factor,
        s.inloop_cell_cap, "none")
    np.savez(_mesh_cache_path(), verts=np.asarray(mesh.verts),
             faces=np.asarray(mesh.faces),
             vert_mask=np.asarray(mesh.vert_mask),
             face_mask=np.asarray(mesh.face_mask))
    print(f"# dumped mesh to {_mesh_cache_path()}", file=sys.stderr)


def main() -> None:
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cfg = OptimizationConfig()
    vae_cfg = ShapeVAEConfig()
    H = W = 512
    cam = GuidanceCamera(height=H, width=W, fov_deg=45.0)
    sampler = G.GuidedSampler(
        dit=None, vae=ShapeVAE(vae_cfg), camera=cam, config=cfg,
        max_verts=32768, max_faces=65536, vae_chunk=8192,
        inloop_coarse_factor=int(os.environ.get("FOHO_INLOOP_CF", "2")),
        inloop_cell_cap=int(os.environ.get("FOHO_INLOOP_CAP", "10240")),
        vae_remat=os.environ.get("FOHO_VAE_REMAT", "none"))
    vae = sampler.vae

    key = jax.random.key(0)
    latents = jax.random.normal(key, (1, vae_cfg.num_latents, vae_cfg.embed_dim))
    print("# init vae params (eval_shape)...", file=sys.stderr)
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
    hoi_mask = targets.hand_mask | targets.obj_mask
    sched = make_schedule(sigmas=np.linspace(0, 1, cfg.num_inference_steps))
    xyz, bbox, res = sampler._grid()
    step_i = 10
    hand0, obj0 = G.init_pose(), G.init_pose()

    # ---- hand part: pose -> LBS-free rigid transform -> hand-only render
    def hand_body(p, _noise):
        def loss(p):
            hv = G._transform_hand(targets, p)
            hl, _ = G._hand_render_losses(hv, targets, cam,
                                          sampler._hand_raster_kw(),
                                          with_sil=False)
            return (1e-4 * hl["kps2d"] + 10.0 * hl["normal"]
                    + 10.0 * hl["disp"] + 1e-2 * jnp.mean(p.trans ** 2))

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a + b * 1e-12, p, g)

    t = _timeit(_scan(hand_body), hand0, noise) / 8
    print(f"# hand part (transform+render grad): {t*1e3:.1f} ms", file=sys.stderr)

    # fixed production-shape mesh for the render/nn parts. The standalone
    # decode jit reproducibly kills the remote compile helper (4x broken
    # pipe 2026-08-20, ~30 min each), so load a CPU-decoded copy from the
    # --dump_mesh cache instead of compiling the decode graph here.
    cache = _mesh_cache_path()
    if not os.path.exists(cache):
        import subprocess

        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--dump_mesh"], check=True)
    z = np.load(cache)
    from followmyhold_tpu.ops.surface import PaddedMesh

    mesh0 = PaddedMesh(verts=jnp.asarray(z["verts"]),
                       faces=jnp.asarray(z["faces"]),
                       vert_mask=jnp.asarray(z["vert_mask"]),
                       face_mask=jnp.asarray(z["face_mask"]))
    tmesh0 = jax.jit(lambda m: G._transform_object(m, targets, obj0))(mesh0)
    print(f"# in-loop mesh: {int(np.asarray(mesh0.vert_mask).sum())} verts, "
          f"{int(np.asarray(mesh0.face_mask).sum())} faces", file=sys.stderr)
    hand_verts0 = jax.jit(lambda: G._transform_hand(targets, hand0))()

    # ---- nn part: hand->obj attraction, grads through hand verts
    def nn_body(hv, overts):
        def loss(hv):
            d2, _ = nn_sqdist(hv, jax.lax.stop_gradient(overts),
                              tmesh0.vert_mask)
            d2 = jnp.minimum(d2, 1e6)
            return 10.0 * attraction_loss(d2, margin=0.01)

        return hv + jax.grad(loss)(hv) * 1e-12

    t = _timeit(_scan(nn_body), hand_verts0, tmesh0.verts) / 8
    print(f"# nn part (778x32768 attraction grad): {t*1e3:.1f} ms",
          file=sys.stderr)

    # ---- hoi render part: join + normals + 512^2 render + render losses
    def hoi_body(overts, hv):
        def loss(overts):
            tm = tmesh0._replace(verts=overts)
            hoi = G._join_meshes(hv, targets.mano_faces,
                                 jnp.ones(hv.shape[0]),
                                 jnp.ones(targets.mano_faces.shape[0]), tm)
            vn = vertex_normals(hoi)
            n01, disp01, out = render_normal_and_disparity(
                cam, hoi.verts, hoi.faces, vn, hoi.face_mask,
                fov_deg=targets.fov_deg, **sampler._raster_kw())
            edges, emask = mesh_edges(tm.faces, tm.face_mask)
            return (10.0 * normal_alignment_loss(n01, targets.moge_normal,
                                                 hoi_mask)
                    + 10.0 * masked_l1(disp01, targets.moge_disp)
                    + 10.0 * binary_cross_entropy(out.alpha, hoi_mask)
                    + 1e-3 * verts_reg_loss(tm.verts, tm.vert_mask)
                    + 1.0 * mesh_edge_loss(tm.verts, edges, emask))

        return overts + jax.grad(loss)(overts) * 1e-12

    t = _timeit(_scan(hoi_body), tmesh0.verts, hand_verts0) / 8
    print(f"# hoi render part (join+render+losses grad): {t*1e3:.1f} ms",
          file=sys.stderr)

    # ---- obj render part: the _obj_phase loss minus the decode (fixed mesh,
    # grad wrt object verts). bench obj_iter minus THIS is the decode cost by
    # subtraction — the direct decode-grad compile keeps killing the tunnel
    # helper, so this difference is the robust way to get the decode number.
    def objrender_body(overts, _hv):
        def loss(overts):
            tm = tmesh0._replace(verts=overts)
            vn = vertex_normals(tm)
            n01, disp01, out = render_normal_and_disparity(
                cam, tm.verts, tm.faces, vn, tm.face_mask,
                fov_deg=targets.fov_deg, **sampler._raster_kw())
            edges, emask = mesh_edges(tm.faces, tm.face_mask)
            return (10.0 * normal_alignment_loss(n01, targets.moge_normal,
                                                 targets.obj_mask)
                    + 10.0 * masked_l1(disp01, targets.moge_disp,
                                       targets.obj_mask)
                    + 100.0 * binary_cross_entropy(out.alpha, targets.obj_mask)
                    + 1e-3 * verts_reg_loss(tm.verts, tm.vert_mask)
                    + 1.0 * mesh_edge_loss(tm.verts, edges, emask))

        return overts + jax.grad(loss)(overts) * 1e-12

    t = _timeit(_scan(objrender_body), tmesh0.verts, hand_verts0) / 8
    print(f"# obj render part (obj-only render+losses grad): {t*1e3:.1f} ms",
          file=sys.stderr)

    # ---- decode part LAST: step_final -> hier decode -> marching tets.
    # The x8 grad scan of this graph reproducibly killed the remote-TPU
    # compile helper ("Broken pipe", 3/3 attempts 2026-08-20) while the
    # same body inside the x5 bench phases compiles fine — retry at
    # decreasing scan lengths so a helper death doesn't lose the number.
    def decode_body(nz, lat):
        def loss(nz):
            mesh, sdf, _ = G._decode_object(
                vae, vae_params, sched, step_i, nz, lat, xyz, bbox, res,
                sampler.max_verts, sampler.max_faces, sampler.vae_chunk,
                sampler.inloop_coarse_factor, sampler.inloop_cell_cap,
                sampler.vae_remat)
            tri = mesh.verts[mesh.faces]
            return (jnp.sum(tri * mesh.face_mask[:, None, None])
                    + jnp.sum(mesh.verts * mesh.vert_mask[:, None]))

        return nz + jax.grad(loss)(nz) * 1e-12

    for length in (int(os.environ.get("FOHO_JS_LEN", "4")), 2, 1):
        try:
            t = _timeit(_scan(decode_body, length), noise, latents) / length
            print(f"# decode part (hier decode+mtets grad, x{length} scan): "
                  f"{t*1e3:.1f} ms", file=sys.stderr)
            break
        except Exception as e:  # noqa: BLE001 — helper death; shrink graph
            print(f"# decode part x{length} FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    if "--dump_mesh" in sys.argv:
        _dump_mesh_cpu()
    else:
        main()
