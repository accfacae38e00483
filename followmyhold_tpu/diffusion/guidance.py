"""Guidance-in-the-loop flow-matching sampler — the FOHO core algorithm.

TPU-native re-design of Hunyuan3DDiTFlowMatchingPipeline_main.__call__
(third_party_patches/hy3dgen/shapegen/pipelines.py:1041-1679): 20 reversed-
sigma Euler steps with three optimization phases injected inside the loop,

  step 9  (handopt_start):  PHASE 1 — 200 Adam steps on hand scale/trans/quat
          losses: 1e-2 kps2D-MSE + normal + 10 disparity + silhouette-BCE
          + 1e-2 trans reg                                  (:1295-1358)
  step 10:                  PHASE 1.5 — 100 AdamW steps on obj scale/trans/
          quat + noise_pred: step_final -> VAE grid decode -> surface ->
          render; 1 edge + 10 normal + 10 disp + 100 sil-BCE + 1e-3 verts
          + 1e-2 trans reg                                   (:1361-1453)
  steps 11..19:             PHASE 2 — 50 AdamW steps jointly on all seven:
          + 10 knn-attraction (margin 1cm, squared dists) + intersection
          + HOI-scene normal/disp/sil + 1e-3 * hand losses   (:1455-1601)

followed by the scheduler advancing with the OPTIMIZED noise prediction
(:1612). CFG decays as scale*(1 - i/N) after guidance starts (:1283-1291).

Everything is static-shaped: each phase's optimizer loop is a lax.scan whose
body differentiates losses through scheduler.step_final -> ShapeVAE grid
queries -> marching-tets surface extraction -> the tiled rasterizer. Empty
meshes / NaN losses degrade to masked zero-contributions instead of Python
`continue` (pipelines.py:1395-1397, 1442-1444).

Intersection loss (:1551-1564): the reference builds 65^3 SDFs of BOTH meshes
with Kaolin. The count it computes is gradient-free, so we compute it the
cheap TPU way: object occupancy by trilinear lookup of the already-decoded
object SDF grid (inverse-transformed sample points), hand occupancy by
winding number against the 1538-face hand mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from followmyhold_tpu.configs.guidance import OptimizationConfig
from followmyhold_tpu.diffusion.scheduler import FlowMatchSchedule, make_schedule, step, step_final
from followmyhold_tpu.models.hunyuan import (
    HunyuanDiT,
    ShapeVAE,
    vae_query_logits,
    vae_query_logits_hier_grid,
)
from followmyhold_tpu.models.mano import mano_vert_to_3dkps
from followmyhold_tpu.ops.camera import GuidanceCamera
from followmyhold_tpu.ops.grid import generate_dense_grid_points, generate_grid_jax
from followmyhold_tpu.ops.knn import nn_sqdist
from followmyhold_tpu.ops.losses import (
    attraction_loss,
    binary_cross_entropy,
    masked_l1,
    mesh_edge_loss,
    mse,
    normal_alignment_loss,
    verts_reg_loss,
)
from followmyhold_tpu.ops.rasterizer import render_normal_and_disparity
from followmyhold_tpu.ops.sdf import winding_number
from followmyhold_tpu.ops.surface import (
    PaddedMesh,
    marching_tets,
    mesh_edges,
    vertex_normals,
)
from followmyhold_tpu.ops.transforms import (
    rt_from_quat_trans,
    transform_around_center_w_scale,
    transform_points,
)


class GuidanceTargets(NamedTuple):
    """Per-image inputs, all precomputed on host (moge/scene space)."""

    mano_verts_moge: jnp.ndarray   # [778,3] aligned MANO verts in moge space
    mano_faces: jnp.ndarray        # [Fh,3]
    j_regressor: jnp.ndarray       # [16,778]
    hamer_2d_kps: jnp.ndarray      # [21,2] image space
    moge_normal: jnp.ndarray       # [H,W,3] target normal map (masked, 0-1)
    moge_disp: jnp.ndarray         # [H,W] target disparity (masked, 0-1)
    hand_mask: jnp.ndarray         # [H,W] bool
    obj_mask: jnp.ndarray          # [H,W] bool
    t_h2m: jnp.ndarray             # [4,4] hunyuan -> moge transform
    # traced per-image horizontal fov (MoGe fov.json). Intrinsics are
    # per-image (reference guidance/run.py:84-90), so batched runs must not
    # bake image 0's fov into the static camera; None -> camera.fov_deg.
    fov_deg: Optional[jnp.ndarray] = None


class PoseParams(NamedTuple):
    scale: jnp.ndarray  # [1]
    trans: jnp.ndarray  # [3]
    quat: jnp.ndarray   # [4] wxyz


class GuidanceResult(NamedTuple):
    latents: jnp.ndarray
    noise_pred: jnp.ndarray
    hand: PoseParams
    obj: PoseParams
    # per-phase loss curves: {"hand": [200], "obj": [100], "joint_11": [50], ...}
    losses: Optional[dict] = None


def init_pose() -> PoseParams:
    return PoseParams(
        scale=jnp.ones(1), trans=jnp.zeros(3),
        quat=jnp.asarray([1.0, 0.0, 0.0, 0.0]),
    )


def _transform_hand(targets: GuidanceTargets, p: PoseParams) -> jnp.ndarray:
    rt = rt_from_quat_trans(p.quat, p.trans)
    return transform_around_center_w_scale(targets.mano_verts_moge, rt, p.scale[0])


_SNAPSHOT_STRIDE = 8   # 512^2 -> 64^2 in-loop render snapshots (cheap D2H)

# scan-collected scalar diagnostics riding the render-aux dict (skipped by
# the snapshot-grid dumps, checked against their capacities post-phase)
_DIAG_CHANNELS = ("hier_cells", "raster_bins", "raster_cap")


def _render_snapshot(n01, disp01):
    """Downsampled copies of the current renders, collected as scan outputs
    so every optimizer iteration is inspectable post-hoc (the reference
    writes render grids every 10 iters inside the loops,
    pipelines.py:1331-1333,1446-1450)."""
    s = _SNAPSHOT_STRIDE
    return {"normal": n01[::s, ::s], "disp": disp01[::s, ::s]}


def _hand_render_losses(verts, targets, camera, raster_kw, with_sil):
    faces = targets.mano_faces
    fmask = jnp.ones(faces.shape[0])
    mesh = PaddedMesh(verts=verts, faces=faces,
                      vert_mask=jnp.ones(verts.shape[0]), face_mask=fmask)
    vn = vertex_normals(mesh)
    n01, disp01, out = render_normal_and_disparity(
        camera, verts, faces, vn, fmask, fov_deg=targets.fov_deg, **raster_kw)

    kps3d = mano_vert_to_3dkps(verts, targets.j_regressor)
    kps2d = camera.project(kps3d, fov_deg=targets.fov_deg)[:, :2]

    losses = {
        "kps2d": mse(kps2d, targets.hamer_2d_kps),
        "normal": normal_alignment_loss(n01, targets.moge_normal, targets.hand_mask),
        "disp": masked_l1(disp01, targets.moge_disp, targets.hand_mask),
        "trans_reg": jnp.mean(jnp.square(jnp.zeros(()))),  # filled by caller
    }
    if with_sil:
        losses["sil"] = binary_cross_entropy(out.alpha, targets.hand_mask)
    return losses, (n01, disp01, out)


def _decode_object(
    vae: ShapeVAE, vae_params, sched: FlowMatchSchedule, step_i,
    noise_pred, latents, xyz, bbox, octree_res, max_verts, max_faces, chunk,
    hier_cf: int = 0, hier_cap: int = 10240, remat: str = "full",
    hier_small_cap: Optional[int] = None,
):
    """step_final -> SDF grid -> padded mesh (hunyuan space), plus the grid.

    hier_cf > 1 switches the dense 65^3 decode to the two-level
    coarse+refine decode (vae_query_logits_hier_grid): value- and
    gradient-exact wherever marching tets emits geometry, ~1.9x fewer geo
    queries per iteration. hier_cf in (0, 1) is the dense decode (cf=1
    has an empty refine set — coarse IS the fine lattice)."""
    x1 = step_final(sched, step_i, noise_pred, latents)
    if hier_cf > 1:
        logits, n_sel = vae_query_logits_hier_grid(
            vae, vae_params, x1, bbox[0], bbox[1], octree_res, chunk,
            coarse_factor=hier_cf, cell_cap=hier_cap, remat=remat,
            small_cell_cap=hier_small_cap)
        logits = logits[0]
    else:
        logits = vae_query_logits(vae, vae_params, x1, xyz[None], chunk,
                                  remat=remat)[0]
        n_sel = jnp.zeros((), jnp.int32)
    sdf = -logits  # FOHO sign convention (pipelines.py:312)
    mesh = marching_tets(sdf, bbox[0], bbox[1], octree_res,
                         max_verts=max_verts, max_faces=max_faces)
    # n_sel > cell_cap means the two-level decode silently kept interpolated
    # background in the missed cells — callers surface it per iteration
    return mesh, sdf, n_sel


def _transform_object(mesh: PaddedMesh, targets: GuidanceTargets,
                      p: PoseParams) -> PaddedMesh:
    v = transform_points(mesh.verts, targets.t_h2m)      # hunyuan -> moge
    rt = rt_from_quat_trans(p.quat, p.trans)
    v = transform_around_center_w_scale(v, rt, p.scale[0], mesh.vert_mask)
    return mesh._replace(verts=v)


def _join_meshes(a_verts, a_faces, a_vmask, a_fmask, b: PaddedMesh) -> PaddedMesh:
    verts = jnp.concatenate([a_verts, b.verts])
    faces = jnp.concatenate([a_faces, b.faces + a_verts.shape[0]])
    return PaddedMesh(
        verts=verts, faces=faces,
        vert_mask=jnp.concatenate([a_vmask, b.vert_mask]),
        face_mask=jnp.concatenate([a_fmask, b.face_mask]),
    )


def _intersection_count(hand_verts, hand_faces, obj_hun: PaddedMesh,
                        obj_verts_posed, obj_sdf_grid, xyz_bbox, octree_res,
                        targets: GuidanceTargets, obj_pose: PoseParams,
                        sample_res: int = 32) -> jnp.ndarray:
    """HO-NeRF intersection count / 1000 (pipelines.py:231-239), gradient-free
    by construction in the reference too. Shared grid spans the joint bbox
    (utilz/kaolin_sdf_ops.py:131-160).

    obj_hun is the PRE-pose hunyuan-space mesh; obj_verts_posed the posed
    moge-space verts. The pose inverse must pivot on the bbox center of the
    pre-pose moge verts — the same center _transform_object used — not on the
    posed verts' center.
    """
    big = jnp.asarray(jnp.finfo(jnp.float32).max)
    hv_lo = hand_verts.min(axis=0)
    hv_hi = hand_verts.max(axis=0)
    om = obj_hun.vert_mask[:, None].astype(bool)
    ov_lo = jnp.where(om, obj_verts_posed, big).min(axis=0)
    ov_hi = jnp.where(om, obj_verts_posed, -big).max(axis=0)
    lo = jnp.minimum(hv_lo, ov_lo)
    hi = jnp.maximum(hv_hi, ov_hi)
    pts = generate_grid_jax(lo, hi, sample_res)          # [P,3] moge space

    # hand occupancy: winding number against the (small) hand mesh
    wn = winding_number(pts, hand_verts, hand_faces)
    inside_hand = wn > 0.5

    # object occupancy: invert similarity transform, trilinear-sample the
    # already-decoded hunyuan-space SDF grid
    rt = rt_from_quat_trans(obj_pose.quat, obj_pose.trans)
    moge_v = transform_points(obj_hun.verts, targets.t_h2m)  # pre-pose moge
    center = jnp.where(om, moge_v, big).min(axis=0)
    center = (center + jnp.where(om, moge_v, -big).max(axis=0)) / 2.0
    # p = s*R(q - c) + c + t  =>  q = R^T((p - c - t)/s) + c
    q = (pts - center - obj_pose.trans) / jnp.maximum(obj_pose.scale[0], 1e-6)
    q = q @ rt[:3, :3] + center
    # moge -> hunyuan
    inv = jnp.linalg.inv(targets.t_h2m)
    q = transform_points(q, inv)

    n = octree_res + 1
    lo_h, hi_h = xyz_bbox
    u = (q - lo_h) / (hi_h - lo_h) * octree_res
    u = jnp.clip(u, 0.0, octree_res - 1e-4)
    grid = obj_sdf_grid.reshape(n, n, n)
    i0 = jnp.floor(u).astype(jnp.int32)
    f = u - i0
    def g(dx, dy, dz):
        return grid[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]
    sdf_obj = (
        g(0, 0, 0) * (1 - f[:, 0]) * (1 - f[:, 1]) * (1 - f[:, 2])
        + g(1, 0, 0) * f[:, 0] * (1 - f[:, 1]) * (1 - f[:, 2])
        + g(0, 1, 0) * (1 - f[:, 0]) * f[:, 1] * (1 - f[:, 2])
        + g(0, 0, 1) * (1 - f[:, 0]) * (1 - f[:, 1]) * f[:, 2]
        + g(1, 1, 0) * f[:, 0] * f[:, 1] * (1 - f[:, 2])
        + g(1, 0, 1) * f[:, 0] * (1 - f[:, 1]) * f[:, 2]
        + g(0, 1, 1) * (1 - f[:, 0]) * f[:, 1] * f[:, 2]
        + g(1, 1, 1) * f[:, 0] * f[:, 1] * f[:, 2]
    )
    inside_obj = sdf_obj < 0
    return jnp.sum(inside_hand & inside_obj).astype(jnp.float32) / 1000.0


@dataclasses.dataclass(frozen=True)
class GuidedSampler:
    """Bundles models + static config; the run() method drives 20 steps."""

    dit: HunyuanDiT
    vae: ShapeVAE
    camera: GuidanceCamera
    config: OptimizationConfig = OptimizationConfig()
    box_v: float = 1.10
    # sized for box-filling objects at 65^3: an r=0.8 sphere in the 1.1 box
    # emits 30.5k verts / 61k faces (measured); the old 24576/49152 caps
    # TRUNCATED such meshes every iteration (systematic hole in the surface
    # the losses then optimized against). r=1.0 worst case is 48k/96k —
    # capacity warnings still fire there.
    max_verts: int = 32768
    max_faces: int = 65536
    vae_chunk: int = 8192
    # per-128px-tile bin capacity: overflow DROPS faces silently (wrong
    # pixels AND wrong gradients in the densest tiles). MEASURED true max on
    # the 61k-face bench mesh at 128x128 tiles: 16216 faces in one tile —
    # the old 8192 default dropped faces on the bench mesh itself (npix
    # 65460 vs 65523 true). The kernel loops to the TRUE per-tile count, so
    # capacity beyond it is ~free — same-session min-of-5 A/B (exp_ab_caps,
    # 2026-08-20, drift floor <2 ms): fpt 24576 is actually 5-7 ms/iter
    # FASTER than 16384 in the obj/joint phases; 24576 gives 1.5x headroom
    # over the measured worst case.
    # Overflow is now observable: RasterOut.bin_max rides the render-aux
    # channel and warns like the hier-decode cell overflow.
    raster_faces_per_tile: int = 24576
    # hand-only renders draw the 1538-face MANO mesh; capacity >= total
    # face count can never overflow (a tile holds at most every face)
    hand_faces_per_tile: int = 2048
    final_octree_resolution: Optional[int] = None  # None -> config value
    # in-loop two-level decode (0 = dense). Default ON: measured on v5e
    # (2026-08-19, dense same-session baseline obj 447/joint 510 ms) the
    # refine-point-DEDUPED decode at cap 8192 + remat='tail' gives obj
    # 318.6 / joint 391.2 ms; value- and gradient-exact vs dense where
    # marching tets emits geometry (tests/test_hierarchical_decode.py).
    # Cap sizing: the CPU capacity sweep at coarse 33^3, pf=0.5 selects
    # sphere r0.8 = 5176, wavy = 5004, ripple = 6092, box = 8128,
    # box-filling sphere = 8800 cells — 10240 covers the measured worst
    # case with margin (8192 truncated box-filling spheres EVERY iteration).
    # Measured cost of the margin (same-session min-of-5 A/B, exp_ab_caps
    # 2026-08-20, drift floor <2 ms): cap 8192 -> 10240 costs obj +30.2 /
    # joint +23.1 ms/iter (~15 ms per +1024 cells: each +1024 cells pads
    # the deduped refine set by 9*1024 queries ~= 1.1 chunks) — ~13 s/image
    # for capacity that never silently truncates a boxy object.
    inloop_coarse_factor: int = 2
    inloop_cell_cap: int = 10240
    # two-tier refine capacity (models/hunyuan.vae_query_logits_hier_grid
    # small_cell_cap): a lax.cond takes a 9*small_cap-point refine branch
    # whenever the selected cells + deduped points fit it — exact everywhere
    # (tested both branches + vmap). MEASURED NET-NEGATIVE on v5e
    # (exp_small_cap, min-of-5, 2026-08-20): wrapping the decode in cond
    # costs obj +21 / joint +27 ms/iter even when the BIG branch executes —
    # grad-of-cond unions both branches' residuals, so each iteration also
    # writes the untaken branch's residual buffers — and the bench field
    # selects 6264-6267 cells ON TPU (bf16 matmuls pick ~12% more
    # near-threshold cells than the CPU estimate of 5582), so a 6144 small
    # cap is never taken and 8192 would at best break even against the
    # ~15 ms/1024-cell padding slope. Default OFF; kept as a knob with its
    # tests for attached-TPU deployments where the trade may differ.
    inloop_small_cap: Optional[int] = None
    # geo-query remat granularity: 'full' | 'tail' | 'none' (see
    # vae_query_logits docstring). Same-session min-of-5 A/B on the hier
    # decode (exp_decode_remat, 2026-08-20, drift floor <1 ms):
    # obj tail 347.6 / full 386.5 / none 336.2 ms/iter; joint tail 423.4 /
    # none 403.2 — 'none' wins once the two-level decode shrank the query
    # set to ~128k (saving residuals beats every recompute flavor). Keep
    # 'tail'/'full' for memory-constrained deployments (batched vmap runs
    # multiply activation HBM by the batch size).
    vae_remat: str = "none"
    # checkpoint scheduler_config shift: the reference applies it to the
    # linspace(0,1) sigmas inside set_timesteps (schedulers.py:199-202) —
    # a checkpoint shipping shift != 1 changes every guided step
    scheduler_shift: float = 1.0

    # ------------------------------------------------------------------ #

    def _schedule(self, n: int) -> FlowMatchSchedule:
        return make_schedule(sigmas=np.linspace(0, 1, n),
                             shift=self.scheduler_shift)

    def _grid(self):
        res = self.config.octree_resolution
        xyz, _, _ = generate_dense_grid_points([-self.box_v] * 3,
                                               [self.box_v] * 3, res)
        bbox = (jnp.asarray([-self.box_v] * 3), jnp.asarray([self.box_v] * 3))
        return xyz, bbox, res

    def _raster_kw(self):
        return dict(faces_per_tile=self.raster_faces_per_tile)

    def _warn_capacity(self, tag, renders):
        """Post-phase check of the scan-collected capacity indicators
        (worst over iterations, and over the batch in the batched path)."""
        if renders is None:
            return
        if "hier_cells" in renders:
            worst = int(np.asarray(renders["hier_cells"]).max())
            if worst > self.inloop_cell_cap:
                # hier_cells is max(n_cells, scaled point count), so the
                # printed figure may be either capacity — both are fixed
                # by raising inloop_cell_cap (point cap = 9*cell cap)
                print(f"WARNING: in-loop hier decode capacity overflow "
                      f"(cells or refine points) at {tag}: "
                      f"{worst}/{self.inloop_cell_cap} — missed points "
                      f"kept interpolated values; raise inloop_cell_cap")
        if "raster_bins" in renders:
            worst = int(np.asarray(renders["raster_bins"]).max())
            # compare against the capacity the kernel ACTUALLY used (can be
            # below raster_faces_per_tile under FOHO_RASTER_TILE/FPT scaling
            # — ADVICE r4); the capacity rides its own aux channel
            cap = (int(np.asarray(renders["raster_cap"]).min())
                   if "raster_cap" in renders else self.raster_faces_per_tile)
            if worst > cap:
                print(f"WARNING: rasterizer bin overflow at {tag}: "
                      f"{worst}/{cap} faces in the "
                      f"densest tile — overflow faces were DROPPED (wrong "
                      f"pixels and gradients there); raise "
                      f"raster_faces_per_tile")

    def _hand_raster_kw(self):
        return dict(faces_per_tile=min(self.hand_faces_per_tile,
                                       self.raster_faces_per_tile))

    # phase 1: hand only ------------------------------------------------ #

    def _hand_phase(self, hand: PoseParams, targets: GuidanceTargets) -> PoseParams:
        cfg = self.config
        lrs = cfg.phase1_hand_lrs
        tx = optax.multi_transform(
            {
                "scale": optax.adam(lrs.scale, eps=1e-4),
                "trans": optax.adam(lrs.trans, eps=1e-4),
                "quat": optax.adam(lrs.rot, eps=1e-4),
            },
            PoseParams(scale="scale", trans="trans", quat="quat"),
        )

        def loss_fn(p: PoseParams):
            verts = _transform_hand(targets, p)
            losses, (n01, disp01, _) = _hand_render_losses(
                verts, targets, self.camera, self._hand_raster_kw(), with_sil=True)
            total = (
                1e-2 * losses["kps2d"]
                + 1.0 * losses["normal"]
                + 10.0 * losses["disp"]
                + 1.0 * losses["sil"]
                + 1e-2 * jnp.mean(p.trans ** 2)
            )
            return jnp.where(jnp.isfinite(total), total, 0.0), \
                _render_snapshot(n01, disp01)

        opt_state = tx.init(hand)

        def body(carry, _):
            p, s = carry
            (loss, rend), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), (loss, rend)

        (hand, _), (losses, renders) = jax.lax.scan(
            body, (hand, opt_state), None, length=cfg.optimization_steps_hand)
        return hand, losses, renders

    # phase 1.5: object transform + noise ------------------------------- #

    def _obj_phase(
        self, obj: PoseParams, noise_pred, latents, vae_params,
        targets: GuidanceTargets, sched: FlowMatchSchedule, step_i,
    ):
        cfg = self.config
        lrs = cfg.obj_2half_lrs
        tx = optax.multi_transform(
            {
                "scale": optax.adamw(lrs.scale, eps=1e-4, weight_decay=0.01),
                "trans": optax.adamw(lrs.trans, eps=1e-4, weight_decay=0.01),
                "quat": optax.adamw(lrs.rot, eps=1e-4, weight_decay=0.01),
                "noise": optax.adamw(cfg.noise_obj_lr1, eps=1e-4, weight_decay=0.01),
            },
            {"pose": PoseParams(scale="scale", trans="trans", quat="quat"),
             "noise": "noise"},
        )
        xyz, bbox, res = self._grid()

        def loss_fn(p):
            mesh, _, n_sel = _decode_object(
                self.vae, vae_params, sched, step_i, p["noise"], latents,
                xyz, bbox, res, self.max_verts, self.max_faces, self.vae_chunk,
                self.inloop_coarse_factor, self.inloop_cell_cap, self.vae_remat,
                self.inloop_small_cap)
            tmesh = _transform_object(mesh, targets, p["pose"])
            vn = vertex_normals(tmesh)
            n01, disp01, out = render_normal_and_disparity(
                self.camera, tmesh.verts, tmesh.faces, vn, tmesh.face_mask,
                fov_deg=targets.fov_deg, **self._raster_kw())
            edges, emask = mesh_edges(tmesh.faces, tmesh.face_mask)
            total = (
                1.0 * mesh_edge_loss(tmesh.verts, edges, emask)
                + 10.0 * normal_alignment_loss(n01, targets.moge_normal, targets.obj_mask)
                + 10.0 * masked_l1(disp01, targets.moge_disp, targets.obj_mask)
                + 100.0 * binary_cross_entropy(out.alpha, targets.obj_mask)
                + 1e-3 * verts_reg_loss(tmesh.verts, tmesh.vert_mask)
                + 1e-2 * jnp.mean(p["pose"].trans ** 2)
            )
            aux = dict(_render_snapshot(n01, disp01), hier_cells=n_sel,
                       raster_bins=out.bin_max, raster_cap=out.bin_capacity)
            return jnp.where(jnp.isfinite(total), total, 0.0), aux

        params = {"pose": obj, "noise": noise_pred}
        opt_state = tx.init(params)

        def body(carry, _):
            p, s = carry
            (loss, rend), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), (loss, rend)

        (params, _), (losses, renders) = jax.lax.scan(
            body, (params, opt_state), None, length=cfg.optimization_steps_scale)
        return params["pose"], params["noise"], losses, renders

    # phase 2: joint ----------------------------------------------------- #

    def _joint_phase(
        self, hand: PoseParams, obj: PoseParams, noise_pred, latents,
        vae_params, targets: GuidanceTargets, sched: FlowMatchSchedule,
        step_i, near_end: bool,
    ):
        cfg = self.config
        h_lrs, o_lrs = cfg.phase2_hand_lrs, cfg.obj_lrs
        tx = optax.multi_transform(
            {
                "h_scale": optax.adamw(h_lrs.scale, eps=1e-4, weight_decay=0.01),
                "h_trans": optax.adamw(h_lrs.trans, eps=1e-4, weight_decay=0.01),
                "h_quat": optax.adamw(h_lrs.rot, eps=1e-4, weight_decay=0.01),
                "o_scale": optax.adamw(o_lrs.scale, eps=1e-4, weight_decay=0.01),
                "o_trans": optax.adamw(o_lrs.trans, eps=1e-4, weight_decay=0.01),
                "o_quat": optax.adamw(o_lrs.rot, eps=1e-4, weight_decay=0.01),
                "noise": optax.adamw(cfg.noise_obj_lr2, eps=1e-4, weight_decay=0.01),
            },
            {
                "hand": PoseParams(scale="h_scale", trans="h_trans", quat="h_quat"),
                "obj": PoseParams(scale="o_scale", trans="o_trans", quat="o_quat"),
                "noise": "noise",
            },
        )
        xyz, bbox, res = self._grid()
        hoi_mask = targets.hand_mask | targets.obj_mask

        def loss_fn(p):
            hand_verts = _transform_hand(targets, p["hand"])
            h_losses, _ = _hand_render_losses(
                hand_verts, targets, self.camera, self._hand_raster_kw(),
                with_sil=False)
            hand_loss = (
                1e-4 * h_losses["kps2d"]
                + 10.0 * h_losses["normal"]
                + 10.0 * h_losses["disp"]
                + 1e-2 * jnp.mean(p["hand"].trans ** 2)
            )

            mesh, sdf, n_sel = _decode_object(
                self.vae, vae_params, sched, step_i, p["noise"], latents,
                xyz, bbox, res, self.max_verts, self.max_faces, self.vae_chunk,
                self.inloop_coarse_factor, self.inloop_cell_cap, self.vae_remat,
                self.inloop_small_cap)
            tmesh = _transform_object(mesh, targets, p["obj"])

            # attraction: squared NN distances hand->obj, clamp(d - 1cm)
            # (pipelines.py:1529-1541; gradients flow through the HAND verts)
            d2, _ = nn_sqdist(hand_verts, jax.lax.stop_gradient(tmesh.verts),
                              tmesh.vert_mask)
            # empty object mesh -> masked NN distances are huge sentinels;
            # clamp and zero the term (reference skips via `continue`)
            has_obj = tmesh.vert_mask.sum() > 0
            d2 = jnp.where(has_obj, jnp.minimum(d2, 1e6), 0.0)
            distance_loss = attraction_loss(d2, margin=0.01)

            # intersection (gradient-free count, parity with :1551-1564).
            # near_end is STATIC and gates the weight to 1e-9 when False
            # (below), making the term numerically irrelevant (count/1000 *
            # 1e-9 ~ 3e-8 of a ~1e2 loss) in 6 of 9 joint invocations — so
            # the 32^3-point winding number is only computed near the end.
            if cfg.use_intersection_loss and near_end:
                inter = _intersection_count(
                    jax.lax.stop_gradient(hand_verts), targets.mano_faces,
                    jax.tree_util.tree_map(jax.lax.stop_gradient, mesh),
                    jax.lax.stop_gradient(tmesh.verts),
                    jax.lax.stop_gradient(sdf), bbox, res, targets,
                    jax.tree_util.tree_map(jax.lax.stop_gradient, p["obj"]))
            else:
                inter = jnp.asarray(0.0)
            w_inter = jnp.where(
                (d2.mean() < 0.001) & near_end, 1e-5, 1e-9)

            hoi = _join_meshes(hand_verts, targets.mano_faces,
                               jnp.ones(hand_verts.shape[0]),
                               jnp.ones(targets.mano_faces.shape[0]), tmesh)
            vn = vertex_normals(hoi)
            n01, disp01, out = render_normal_and_disparity(
                self.camera, hoi.verts, hoi.faces, vn, hoi.face_mask,
                fov_deg=targets.fov_deg, **self._raster_kw())

            edges, emask = mesh_edges(tmesh.faces, tmesh.face_mask)
            total = (
                w_inter * inter
                + 10.0 * distance_loss
                + 10.0 * normal_alignment_loss(n01, targets.moge_normal, hoi_mask)
                + 10.0 * masked_l1(disp01, targets.moge_disp)
                + 10.0 * binary_cross_entropy(out.alpha, hoi_mask)
                + 1e-3 * verts_reg_loss(tmesh.verts, tmesh.vert_mask)
                + 1.0 * mesh_edge_loss(tmesh.verts, edges, emask)
                + 1e-3 * jnp.mean(p["obj"].trans ** 2)
                + 1e-3 * hand_loss
            )
            aux = dict(_render_snapshot(n01, disp01), hier_cells=n_sel,
                       raster_bins=out.bin_max, raster_cap=out.bin_capacity)
            return jnp.where(jnp.isfinite(total), total, 0.0), aux

        params = {"hand": hand, "obj": obj, "noise": noise_pred}
        opt_state = tx.init(params)

        def body(carry, _):
            p, s = carry
            (loss, rend), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), (loss, rend)

        (params, _), (losses, renders) = jax.lax.scan(
            body, (params, opt_state), None, length=cfg.optimization_steps_joint)
        return params["hand"], params["obj"], params["noise"], losses, renders

    # main loop ----------------------------------------------------------- #

    def run(
        self,
        dit_params,
        vae_params,
        cond_main: jnp.ndarray,     # [1,M,C]
        uncond_main: jnp.ndarray,   # [1,M,C]
        targets: GuidanceTargets,
        key: jax.Array,
        latent_shape: Tuple[int, int],
        debug=None,                 # Optional[DebugDir]: in-loop loss/mesh dumps
    ) -> GuidanceResult:
        cfg = self.config
        n = cfg.num_inference_steps
        sched = self._schedule(n)
        latents = jax.random.normal(key, (1, *latent_shape), jnp.float32)
        hand, obj = init_pose(), init_pose()
        cond_cat = jnp.concatenate([cond_main, uncond_main], axis=0)

        hand_phase, obj_phase, joint_phase, advance, dit_step = _jitted_phases(self)

        def log_phase(tag, losses, renders=None):
            loss_log[tag] = losses
            if debug is not None and debug.enabled:
                # per-10-iter loss lines + render snapshots from INSIDE the
                # opt scans (reference pipelines.py:1331-1333,1446-1450)
                arr = np.asarray(losses)
                for it in range(0, len(arr), 10):
                    debug.log_loss(f"{tag} iter {it}: loss {arr[it]:.6f}")
                if len(arr):
                    debug.log_loss(f"{tag} final: loss {arr[-1]:.6f}")
                if renders is not None:
                    for name, stack in renders.items():
                        if name in _DIAG_CHANNELS:
                            continue      # scalar diag channel, not a render
                        s = np.asarray(stack)
                        sel = np.arange(0, len(s), 10)
                        debug.dump_array(f"{tag}_{name}_grid.npy", s[sel])
            self._warn_capacity(tag, renders)

        loss_log: dict = {}
        noise_pred = jnp.zeros_like(latents)
        for i in range(n):
            # CFG decay after guidance starts (pipelines.py:1283-1291)
            if i >= cfg.guidance_start_step + 1:
                g = cfg.obj_guidance_scale * (1 - i / n)
            else:
                g = cfg.obj_guidance_scale
            noise_pred = dit_step(dit_params, cond_cat, latents,
                                  sched.timesteps[i] / sched.num_train_timesteps,
                                  g)

            if i == cfg.handopt_start_step:
                hand, hl, hrend = hand_phase(hand, targets)
                log_phase("hand", hl, hrend)
            elif i == cfg.handopt_start_step + 1:
                obj, noise_pred, ol, orend = obj_phase(
                    obj, noise_pred, latents, vae_params, targets, sched, i)
                log_phase("obj", ol, orend)
            elif i >= cfg.handopt_start_step + 2:
                hand, obj, noise_pred, jl, jrend = joint_phase(
                    hand, obj, noise_pred, latents, vae_params, targets, sched,
                    i, near_end=bool(i >= n - 3))
                log_phase(f"joint_{i}", jl, jrend)
                if debug is not None and debug.enabled:
                    self._debug_render_dump(debug, f"step{i:02d}", hand, obj,
                                            noise_pred, latents, vae_params,
                                            targets, sched, i)

            # step-14 intermediate mesh dump (reference pipelines.py:1664-1675)
            if debug is not None and debug.enabled and i == min(14, n - 2):
                self._debug_mesh_dump(debug, f"step{i:02d}", vae_params,
                                      noise_pred, latents, sched, i)

            latents = advance(sched, i, noise_pred, latents)

        return GuidanceResult(latents=latents, noise_pred=noise_pred,
                              hand=hand, obj=obj, losses=loss_log)

    def run_batch(
        self,
        dit_params,
        vae_params,
        cond_main: jnp.ndarray,     # [B,1,M,C]
        uncond_main: jnp.ndarray,   # [B,1,M,C]
        targets: GuidanceTargets,   # leaves stacked along a leading batch dim
        keys: jax.Array,            # [B] PRNG keys
        latent_shape: Tuple[int, int],
        mesh=None,                  # jax.sharding.Mesh with a "dp" axis
        debugs=None,                # Optional[list[DebugDir]], one per image
    ) -> GuidanceResult:
        """Data-parallel batched run: every phase is vmapped over the image
        batch; with a mesh, the batch dim is sharded over dp (replacing the
        reference's SLURM arrays, SURVEY §2d). Weights stay replicated
        (per-image graphs are independent — no collectives needed).
        debugs gives the batched path the same per-image observability as
        the serial path (loss lines + in-loop render snapshot grids)."""
        cfg = self.config
        n = cfg.num_inference_steps
        B = cond_main.shape[0]
        sched = self._schedule(n)
        latents = jax.vmap(
            lambda k: jax.random.normal(k, (1, *latent_shape), jnp.float32)
        )(keys)
        hand = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (B, *x.shape)), init_pose())
        obj = hand
        cond_cat = jnp.concatenate([cond_main, uncond_main], axis=1)  # [B,2,M,C]

        hand_phase, obj_phase, joint_phase, advance, dit_step = _jitted_batch_phases(self)

        shard = None
        if mesh is not None and "dp" in mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("dp"))
            put = lambda tree: jax.tree_util.tree_map(  # noqa: E731
                lambda x: jax.device_put(x, shard), tree)
            latents, hand, obj, cond_cat, targets = map(
                put, (latents, hand, obj, cond_cat, targets))

        def log_phase(tag, losses, renders):
            loss_log[tag] = losses
            self._warn_capacity(f"{tag} (batched)", renders)
            if not debugs:
                return
            arr = np.asarray(losses)                    # [B, iters]
            for b, dbg in enumerate(debugs):
                if dbg is None or not dbg.enabled:
                    continue
                for it in range(0, arr.shape[1], 10):
                    dbg.log_loss(f"{tag} iter {it}: loss {arr[b, it]:.6f}")
                dbg.log_loss(f"{tag} final: loss {arr[b, -1]:.6f}")
                for name, stack in renders.items():
                    if name in _DIAG_CHANNELS:
                        continue          # scalar diag channel, not a render
                    s = np.asarray(stack[b])
                    dbg.dump_array(f"{tag}_{name}_grid.npy",
                                   s[np.arange(0, len(s), 10)])

        loss_log: dict = {}
        noise_pred = jnp.zeros_like(latents)
        for i in range(n):
            if i >= cfg.guidance_start_step + 1:
                g = cfg.obj_guidance_scale * (1 - i / n)
            else:
                g = cfg.obj_guidance_scale
            noise_pred = dit_step(dit_params, cond_cat, latents,
                                  sched.timesteps[i] / sched.num_train_timesteps,
                                  g)
            if i == cfg.handopt_start_step:
                hand, hl, hrend = hand_phase(hand, targets)
                log_phase("hand", hl, hrend)
            elif i == cfg.handopt_start_step + 1:
                obj, noise_pred, ol, orend = obj_phase(
                    obj, noise_pred, latents, vae_params, targets, sched, i)
                log_phase("obj", ol, orend)
            elif i >= cfg.handopt_start_step + 2:
                hand, obj, noise_pred, jl, jrend = joint_phase(
                    hand, obj, noise_pred, latents, vae_params, targets, sched,
                    i, bool(i >= n - 3))
                log_phase(f"joint_{i}", jl, jrend)
            latents = advance(sched, i, noise_pred, latents)

        return GuidanceResult(latents=latents, noise_pred=noise_pred,
                              hand=hand, obj=obj, losses=loss_log)

    def _debug_mesh_dump(self, debug, tag, vae_params, noise_pred, latents,
                         sched, step_i):
        """Decode the current x1 estimate at in-loop resolution and dump it."""
        xyz, bbox, res = self._grid()
        mesh, _, _ = _decode_object(
            self.vae, vae_params, sched, step_i, noise_pred, latents,
            xyz, bbox, res, self.max_verts, self.max_faces, self.vae_chunk,
            self.inloop_coarse_factor, self.inloop_cell_cap, self.vae_remat)
        nv, nf = int(mesh.num_verts), int(mesh.num_faces)
        if nf > 0:
            debug.dump_mesh(f"{tag}_obj.ply", np.asarray(mesh.verts)[:nv],
                            np.asarray(mesh.faces)[:nf])

    def _debug_render_dump(self, debug, tag, hand, obj, noise_pred, latents,
                           vae_params, targets, sched, step_i):
        """Post-phase render dump (the reference writes periodic render grids
        from inside the opt loops, pipelines.py:1446-1450): normal + disparity
        of the current HOI scene, as .npy maps."""
        hand_verts = _transform_hand(targets, hand)
        xyz, bbox, res = self._grid()
        mesh, _, _ = _decode_object(
            self.vae, vae_params, sched, step_i, noise_pred, latents,
            xyz, bbox, res, self.max_verts, self.max_faces, self.vae_chunk,
            self.inloop_coarse_factor, self.inloop_cell_cap, self.vae_remat)
        tmesh = _transform_object(mesh, targets, obj)
        hoi = _join_meshes(hand_verts, targets.mano_faces,
                           jnp.ones(hand_verts.shape[0]),
                           jnp.ones(targets.mano_faces.shape[0]), tmesh)
        vn = vertex_normals(hoi)
        n01, disp01, _ = render_normal_and_disparity(
            self.camera, hoi.verts, hoi.faces, vn, hoi.face_mask,
            fov_deg=targets.fov_deg, **self._raster_kw())
        debug.dump_array(f"{tag}_normal.npy", n01)
        debug.dump_array(f"{tag}_disp.npy", disp01)

    def export_meshes(
        self, vae_params, result: GuidanceResult, targets: GuidanceTargets,
        octree_resolution: Optional[int] = None,
        max_verts: Optional[int] = None, max_faces: Optional[int] = None,
        device_res_limit: int = 256,
    ) -> Tuple[PaddedMesh, jnp.ndarray]:
        """Final decode (reference does 384^3 at pipelines.py:1624-1641) and
        the transformed meshes in moge space.

        Up to device_res_limit the surface is extracted on device (static
        capacities); above it, the SDF is still decoded on device in chunks
        but the one-off extraction runs on host with exact shapes
        (ops/surface.marching_tets_host) — the 385^3 edge tables would not
        fit static buffers.
        """
        res = octree_resolution or self.config.octree_resolution
        if res <= device_res_limit:
            xyz, _, _ = generate_dense_grid_points([-self.box_v] * 3,
                                                   [self.box_v] * 3, res)
            logits = vae_query_logits(self.vae, vae_params, result.latents,
                                      xyz[None], self.vae_chunk)[0]
            sdf = -logits
            mv = max_verts or self.max_verts
            mf = max_faces or self.max_faces
            mesh = marching_tets(
                sdf, jnp.asarray([-self.box_v] * 3), jnp.asarray([self.box_v] * 3),
                res, max_verts=mv, max_faces=mf)
            from followmyhold_tpu.diffusion.pipeline import check_surface_capacity

            check_surface_capacity(sdf, res, mv, mf)
        else:
            import numpy as np

            from followmyhold_tpu.models.hunyuan import hierarchical_export_logits
            from followmyhold_tpu.ops.surface import marching_tets_host

            # sparse two-level decode: the dense 385^3 decode is ~38 s/image
            sdf = -hierarchical_export_logits(self.vae, vae_params,
                                              result.latents, self.box_v,
                                              res, chunk=self.vae_chunk)
            hv, hf = marching_tets_host(np.asarray(sdf), [-self.box_v] * 3,
                                        [self.box_v] * 3, res)
            cap_v = max(len(hv), 1)
            cap_f = max(len(hf), 1)
            verts = jnp.asarray(hv if len(hv) else np.zeros((1, 3), np.float32))
            faces = jnp.asarray(hf if len(hf) else np.zeros((1, 3), np.int32))
            mesh = PaddedMesh(verts=verts, faces=faces,
                              vert_mask=jnp.ones(cap_v), face_mask=jnp.ones(cap_f))
        obj_mesh = _transform_object(mesh, targets, result.obj)
        hand_verts = _transform_hand(targets, result.hand)
        return obj_mesh, hand_verts


@functools.lru_cache(maxsize=4)
def _jitted_phases(sampler: "GuidedSampler"):
    """Per-sampler jitted phase functions (cached so multi-image runs reuse
    traces; GuidedSampler is a frozen, hashable dataclass). All big arrays
    (params, cond, targets, schedule) are ARGUMENTS, never closures — closed-
    over device arrays become embedded constants (host roundtrip + HBM copy).
    """
    hand_phase = jax.jit(sampler._hand_phase)
    obj_phase = jax.jit(sampler._obj_phase)
    joint_phase = jax.jit(sampler._joint_phase, static_argnames=("near_end",))

    @jax.jit
    def advance(sched, i, eps, lat):
        return step(sched, i, eps, lat)[0]

    @jax.jit
    def dit_step(dp, cond, lat, t, g_scale):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        tt = jnp.full((2,), t, lat.dtype)
        eps = sampler.dit.apply(dp, lat_in, tt, cond)
        eps_c, eps_u = jnp.split(eps, 2, axis=0)
        return eps_u + g_scale * (eps_c - eps_u)

    return hand_phase, obj_phase, joint_phase, advance, dit_step


@functools.lru_cache(maxsize=4)
def _jitted_batch_phases(sampler: "GuidedSampler"):
    """Batched (vmapped-over-images) variants of the jitted phases. Weights
    and the schedule broadcast (in_axes None); everything per-image maps.

    The two-tier refine capacity is disabled here: vmapped lax.cond lowers
    to both-branches-execute (a select), which would make every image pay
    small + big refine instead of one of them."""
    sampler = dataclasses.replace(sampler, inloop_small_cap=None)
    hand_phase = jax.jit(jax.vmap(sampler._hand_phase))
    obj_phase = jax.jit(jax.vmap(
        sampler._obj_phase, in_axes=(0, 0, 0, None, 0, None, None)),
        static_argnums=())
    # near_end is a STATIC flag (it gates the intersection-count subgraph
    # out of 6 of 9 joint invocations), so it must stay a Python bool
    # through jit/vmap rather than ride in_axes=None as a tracer.
    @functools.partial(jax.jit, static_argnames=("near_end",))
    def _joint(h, o, n, lat, vp, tg, sched, i, near_end):
        return jax.vmap(
            lambda hb, ob, nb, latb, tgb: sampler._joint_phase(
                hb, ob, nb, latb, vp, tgb, sched, i, near_end)
        )(h, o, n, lat, tg)

    @jax.jit
    def advance(sched, i, eps, lat):
        return jax.vmap(lambda e, l: step(sched, i, e, l)[0])(eps, lat)

    @jax.jit
    def dit_step(dp, cond, lat, t, g_scale):
        def one(cond_i, lat_i):
            lat_in = jnp.concatenate([lat_i, lat_i], axis=0)
            tt = jnp.full((2,), t, lat_i.dtype)
            eps = sampler.dit.apply(dp, lat_in, tt, cond_i)
            eps_c, eps_u = jnp.split(eps, 2, axis=0)
            return eps_u + g_scale * (eps_c - eps_u)

        return jax.vmap(one)(cond, lat)

    return hand_phase, obj_phase, _joint, advance, dit_step
