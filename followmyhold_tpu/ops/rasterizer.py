"""Tiled differentiable rasterizer (Pallas TPU kernel + XLA fallback;
TPU-native PyTorch3D replacement).

Replaces the reference's MeshRenderer stacks (guidance/run.py:95-116):
- PhongNormalShader  (pipelines.py:74-92): interpolated vertex normals,
- SoftSilhouetteShader: order-independent soft coverage,
- zbuf-based disparity (render_normal_and_disparity, pipelines.py:272-289).

Two implementations behind one interface:

1. **Pallas path (TPU).** Faces are binned to 128x128 pixel tiles; each tile's
   TRUE face count rides a scalar-prefetch argument, and the kernel loops only
   over `ceil(count/C)` chunks — unlike the XLA path, which must evaluate the
   full static capacity (faces_per_tile) for every tile. The kernel emits the
   winning face slot + its barycentrics (w1, w2) and the multiplicative
   visibility product; depth/normal interpolation (and their gradients) then
   happen in XLA via gathers on the winner ids, so the custom VJP kernel only
   backpropagates the barycentric and coverage terms (recomputed per chunk
   with jax.vjp inside the kernel — no [F, pixels] buffer ever exists).

2. **XLA path (CPU tests / small images).** The r1 design: tile/face overlap
   binning into static-capacity lists, vmap over tiles x lax.scan over face
   chunks, rematerialized.

Both windings are rasterized (PyTorch3D cull_backfaces=False default).
Silhouette sigma is in PIXELS; sigma_px -> 0 recovers the reference's
near-hard blending (sigma=1e-8, run.py:92). Coverage is clamped to
1 - 1e-3 so the visibility-product gradient prod/(1-cov) stays finite.
"""

from __future__ import annotations

import functools
import math as _math
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from followmyhold_tpu.ops.camera import GuidanceCamera

try:  # pallas is available on TPU builds of jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_COV_CAP = 1.0 - 1e-3   # max per-face coverage: keeps d(prod)/d(cov) finite
_PCHUNK = 128           # faces per streamed geometry block


def _pallas_tile_shape() -> tuple[int, int]:
    """Pixel tile (rows, cols) for the Pallas path, env-overridable.

    Each face iteration does a [th, tw] tile of VPU math, so shrinking the
    tile cuts per-face vector work — but the v5e sweep
    (tools/exp_raster_tile.py) shows every smaller shape LOSES on forward:
    the O(T*F) binning overlap matrix, the [T, K] geometry gather (and its
    backward scatter), and tile-straddling faces all grow with the tile
    count T and swamp the saving. Honest numbers (per-config capacity set
    ABOVE the true per-tile max, so no config silently drops faces — the
    original sweep let 128x128 overflow its 8192 cap and undercount work):
    61k-face bench mesh, 512^2, v5e:
        128x128 K=16384: fwd  88.4 / grad 237.1 ms   (true max 16216)
        128x128 K=24576: fwd  89.3 / grad 236.9 ms   (capacity is free
                          beyond the true count: the kernel loops to it)
        32x128  K=8192:  fwd 121.0 / grad 236.3 ms   (true max 6635)
        16x128  K=8192:  fwd 192.9 / grad 321.2 ms
    128x128 wins forward, backward is tile-insensitive; stay at 128x128.
    The knob remains for profiling and for other image sizes. Mosaic
    constrains tw to multiples of 128 (lane dim) and th to multiples of 8.
    """
    s = os.environ.get("FOHO_RASTER_TILE", "128x128")
    th, tw = (int(v) for v in s.lower().split("x"))
    if th % 8 or tw % 128 or th < 8 or tw < 128:
        raise ValueError(f"FOHO_RASTER_TILE={s}: need rows%8==0, cols%128==0")
    return th, tw


def _scale_faces_per_tile(faces_per_tile: int, th: int, tw: int) -> int:
    """Per-tile face capacity for a (th, tw) tile, from the 128x128 budget.

    Per-tile face count scales with the padded tile area
    (th + h)(tw + h) for typical face bbox h; h=16 px plus a 1.5x safety
    factor covers the measured bench meshes, capped at the caller's budget
    so the default 128x128 path is unchanged."""
    env = os.environ.get("FOHO_RASTER_FPT")
    if env:                       # profiling: exact capacity, no scaling
        return int(env)
    if th >= 128 and tw >= 128 and th * tw >= 128 * 128:
        return faces_per_tile
    scale = ((th + 16) * (tw + 16)) / float((128 + 16) * (128 + 16))
    k = int(_math.ceil(faces_per_tile * scale * 1.5))
    k = max(1024, ((k + _PCHUNK - 1) // _PCHUNK) * _PCHUNK)
    return min(k, faces_per_tile)


class RasterOut(NamedTuple):
    zbuf: jnp.ndarray     # [H,W] camera-space depth, -1 where no face (pytorch3d zbuf convention)
    normal: jnp.ndarray   # [H,W,3] interpolated vertex normals (unnormalized), 0 where empty
    alpha: jnp.ndarray    # [H,W] soft silhouette in [0,1]
    face_id: jnp.ndarray  # [H,W] int32 winning face, -1 where empty
    # true (pre-clamp) max faces overlapping one tile: if this exceeds
    # bin_capacity, faces were silently dropped in the densest tiles (wrong
    # pixels AND wrong gradients there). Callers in the guidance loop
    # surface it through the same aux-warning channel as the hier-decode
    # cell overflow.
    bin_max: jnp.ndarray = None  # int32 scalar
    # the per-tile face capacity the kernel ACTUALLY used — after
    # FOHO_RASTER_TILE/FPT scaling (_scale_faces_per_tile) and chunk
    # rounding, which can differ from the caller's faces_per_tile budget
    # (ADVICE r4: comparing bin_max against the unscaled budget let
    # overflow under a smaller effective K go unwarned)
    bin_capacity: jnp.ndarray = None  # int32 scalar


def _face_screen(camera: GuidanceCamera, verts: jnp.ndarray, faces: jnp.ndarray,
                 fov_deg=None):
    uvz = camera.project(verts, fov_deg=fov_deg)   # [V,3]
    tri = uvz[faces]                               # [F,3,3]
    return tri


def _on_tpu() -> bool:
    try:
        d = jax.devices()[0]
        return d.platform == "tpu" or "tpu" in d.device_kind.lower()
    except Exception:  # pragma: no cover
        return False


def _bin_faces(tri, valid, H, W, tile_h, tile_w, faces_per_tile, sigma_px):
    """Tile/face overlap -> per-tile face lists + true counts."""
    F = tri.shape[0]
    ty, tx = H // tile_h, W // tile_w
    n_tiles = ty * tx
    pad = sigma_px * 3.0 + 1.0
    fmin = tri[..., :2].min(axis=1) - pad          # [F,2]
    fmax = tri[..., :2].max(axis=1) + pad

    tile_ids = jnp.arange(n_tiles)
    tile_y0 = (tile_ids // tx) * tile_h
    tile_x0 = (tile_ids % tx) * tile_w
    overlap = (
        (fmin[None, :, 0] <= (tile_x0[:, None] + tile_w - 1))
        & (fmax[None, :, 0] >= tile_x0[:, None])
        & (fmin[None, :, 1] <= (tile_y0[:, None] + tile_h - 1))
        & (fmax[None, :, 1] >= tile_y0[:, None])
        & valid[None, :]
    )                                              # [T,F]

    def tile_list(row):
        (ids,) = jnp.nonzero(row, size=faces_per_tile, fill_value=F)
        return ids

    tile_faces = jax.vmap(tile_list)(overlap)       # [T, K]
    true_counts = overlap.sum(axis=1)
    counts = jnp.minimum(true_counts, faces_per_tile).astype(jnp.int32)
    bin_max = true_counts.max().astype(jnp.int32)
    return tile_faces, counts, tile_y0, tile_x0, ty, tx, bin_max


def _untile(x, ty, tx, tile_h, tile_w, H, W):
    c = x.shape[3:]
    return x.reshape(ty, tx, tile_h, tile_w, *c).transpose(
        0, 2, 1, 3, *range(4, 4 + len(c))
    ).reshape(H, W, *c)


# =========================================================================== #
# Pallas path
# =========================================================================== #

def _seg_dist(ax, ay, bx, by, uu, vv):
    """Unsigned pixel distance to the segment (a, b); per-face [C] endpoints
    against [t,t] pixels -> [C,t,t]."""
    abx = bx - ax
    aby = by - ay
    len2 = jnp.maximum(abx * abx + aby * aby, 1e-12)
    apx = uu[None] - ax[:, None, None]
    apy = vv[None] - ay[:, None, None]
    tpar = jnp.clip((apx * abx[:, None, None] + apy * aby[:, None, None])
                    / len2[:, None, None], 0.0, 1.0)
    dx = apx - tpar * abx[:, None, None]
    dy = apy - tpar * aby[:, None, None]
    return jnp.sqrt(dx * dx + dy * dy + 1e-12)


def _chunk_geometry(g, uu, vv, inv_sigma):
    """Per-chunk face math shared by fwd and bwd kernels.

    g: [9, C] screen coords (x0,y0,z0, x1,y1,z1, x2,y2,z2).
    Returns w0, w1, w2 [C,t,t] signed barycentrics (w_k = e_k / area, positive
    inside for either winding), zpix, cov, degen mask.

    Coverage uses the TRUE distance to the triangle boundary (min over the
    three edge SEGMENTS, sign from the inside test) — edge-LINE distance
    creates phantom coverage beyond vertices, which made alpha depend on tile
    size.
    """
    x0, y0, z0 = g[0], g[1], g[2]
    x1, y1, z1 = g[3], g[4], g[5]
    x2, y2, z2 = g[6], g[7], g[8]

    def edge(ax, ay, bx, by):
        ex = bx - ax
        ey = by - ay
        return (ex[:, None, None] * (vv[None] - ay[:, None, None])
                - ey[:, None, None] * (uu[None] - ax[:, None, None]))

    e0 = edge(x1, y1, x2, y2)   # opposite vertex 0
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)   # [C] signed
    degen = jnp.abs(area) < 1e-12
    inv_area = 1.0 / jnp.where(degen, 1.0, area)
    w0 = e0 * inv_area[:, None, None]
    w1 = e1 * inv_area[:, None, None]
    w2 = e2 * inv_area[:, None, None]
    zpix = (w0 * z0[:, None, None] + w1 * z1[:, None, None]
            + w2 * z2[:, None, None])

    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    dmin = jnp.minimum(
        jnp.minimum(_seg_dist(x1, y1, x2, y2, uu, vv),
                    _seg_dist(x2, y2, x0, y0, uu, vv)),
        _seg_dist(x0, y0, x1, y1, uu, vv))
    d_signed = jnp.where(inside, dmin, -dmin)
    cov = jnp.clip(d_signed * (0.25 * inv_sigma) + 0.5, 0.0, _COV_CAP)
    return w0, w1, w2, zpix, cov, degen


def _face_geometry(gs, uu, vv, inv_sigma):
    """Single-face screen-space math against the [t,t] pixel tile.

    gs: 9 scalars (x0,y0,z0,x1,y1,z1,x2,y2,z2). Returns w0,w1,w2 [t,t]
    barycentrics (w_k = e_k/area), zpix [t,t], cov [t,t], degen scalar.
    Mosaic-friendly: scalar-broadcast VPU ops only, no tiny-vector reshapes.
    """
    x0, y0, z0, x1, y1, z1, x2, y2, z2 = gs

    def edge(ax, ay, bx, by):
        return (bx - ax) * (vv - ay) - (by - ay) * (uu - ax)

    def seg_dist(ax, ay, bx, by):
        abx = bx - ax
        aby = by - ay
        len2 = jnp.maximum(abx * abx + aby * aby, 1e-12)
        apx = uu - ax
        apy = vv - ay
        tpar = jnp.clip((apx * abx + apy * aby) / len2, 0.0, 1.0)
        dx = apx - tpar * abx
        dy = apy - tpar * aby
        return jnp.sqrt(dx * dx + dy * dy + 1e-12)

    e0 = edge(x1, y1, x2, y2)
    e1 = edge(x2, y2, x0, y0)
    e2 = edge(x0, y0, x1, y1)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    degen = jnp.abs(area) < 1e-12
    inv_area = 1.0 / jnp.where(degen, 1.0, area)
    w0 = e0 * inv_area
    w1 = e1 * inv_area
    w2 = e2 * inv_area
    zpix = w0 * z0 + w1 * z1 + w2 * z2

    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    dmin = jnp.minimum(jnp.minimum(seg_dist(x1, y1, x2, y2),
                                   seg_dist(x2, y2, x0, y0)),
                       seg_dist(x0, y0, x1, y1))
    d_signed = jnp.where(inside, dmin, -dmin)
    cov = jnp.clip(d_signed * (0.25 * inv_sigma) + 0.5, 0.0, _COV_CAP)
    return w0, w1, w2, zpix, cov, degen


def _raster_fwd_kernel(counts_ref, geom_ref, w1_ref, w2_ref, slot_ref, vis_ref,
                       zbest_ref, *, th: int, tw: int, K: int, C: int,
                       tx: int, inv_sigma: float, znear: float, zfar: float):
    """Grid (T, K//C): chunk cc of tile p. The [9, C] geometry chunk is
    streamed into SMEM by the BlockSpec index map; the face loop runs to the
    tile's TRUE count (scalar prefetch), reading per-face scalars from SMEM
    and doing [th,tw] vector math — inactive chunks cost nothing. Per-tile
    state lives in the output blocks, whose index is constant in cc, so they
    stay resident in VMEM across a tile's chunk steps."""
    p = pl.program_id(0)
    cc = pl.program_id(1)
    count = counts_ref[p]
    y0 = ((p // tx) * th).astype(jnp.float32)
    x0 = ((p % tx) * tw).astype(jnp.float32)
    uu = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    vv = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)

    big = jnp.float32(3.0e38)

    @pl.when(cc == 0)
    def _init():
        zbest_ref[0] = jnp.full((th, tw), big, jnp.float32)
        slot_ref[0] = jnp.full((th, tw), -1, jnp.int32)
        w1_ref[0] = jnp.zeros((th, tw), jnp.float32)
        w2_ref[0] = jnp.zeros((th, tw), jnp.float32)
        vis_ref[0] = jnp.ones((th, tw), jnp.float32)

    @pl.when(cc * C < count)
    def _active():
        n_faces = jnp.minimum(count - cc * C, C)

        def body(f, state):
            best_z, best_s, best_w1, best_w2, vis = state
            gs = [geom_ref[0, j, f] for j in range(9)]
            w0, w1, w2, zpix, cov, degen = _face_geometry(gs, uu, vv, inv_sigma)
            ok = jnp.logical_not(degen)
            hit = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok
                   & (zpix > znear) & (zpix < zfar))
            take = hit & (zpix < best_z)
            slot = cc * C + f
            best_z = jnp.where(take, zpix, best_z)
            best_s = jnp.where(take, slot, best_s)
            best_w1 = jnp.where(take, w1, best_w1)
            best_w2 = jnp.where(take, w2, best_w2)
            vis = vis * (1.0 - jnp.where(ok, cov, 0.0))
            return best_z, best_s, best_w1, best_w2, vis

        state = (zbest_ref[0], slot_ref[0], w1_ref[0], w2_ref[0], vis_ref[0])
        best_z, best_s, best_w1, best_w2, vis = jax.lax.fori_loop(
            0, n_faces, body, state)
        zbest_ref[0] = best_z
        slot_ref[0] = best_s
        w1_ref[0] = best_w1
        w2_ref[0] = best_w2
        vis_ref[0] = vis


# perf-diagnosis switch (trace-time static): 'all' | 'winner' (zero the
# coverage/edge-distance grads) | 'cov' (zero the winner barycentric grads).
# Only bench/experiments set this; results are WRONG unless 'all'.
#
# Floor analysis (v5e, 61k-face bench mesh, 2026-08-19): fwd 83.5 ms,
# fwd+grad all 214.6 / winner-only 197.9 / cov-only 211.0 ms. Of the 131 ms
# backward, the coverage chain (3 segment distances + sqrt + its 12
# reductions) folds away for only ~17 ms and the winner/edge chain for ~4 ms
# — ~110 ms is the shared per-face iteration itself (geometry already
# streams through SMEM; the [t,t] edge/area/barycentric recompute runs per
# face for BOTH branches). The kernel is elementwise-bound per face*pixel,
# like the forward (ratio 1.37 ~= op-count ratio); reduction fusion or
# branch pruning cannot move it materially.
#
# Tile-shape sweep (tools/exp_raster_tile.py, v5e, same mesh, 2026-08-19):
# smaller tiles LOSE — fwd/grad ms: 128x128 77.7/205.0, 32x128 117.5/220.0,
# 16x128 182/292, 8x128 329/455, 8x512 135.8/295, 16x256 149.9/258. The
# per-face [t,t] vector-work saving is swamped by the O(T*F) binning
# overlap matrix, the [T,K] geometry gather/scatter, and tile-straddling
# faces — all of which grow with the tile count T (fitted ~14.5 ns per
# (tile, face) overlap entry + ~83 ns per (tile, slot) gathered). 128x128
# is the measured optimum for 512^2 renders; the kernel floor stands.
_BWD_PARTS = os.environ.get("FOHO_RASTER_BWD_PARTS", "all")


def _raster_bwd_kernel(counts_ref, geom_ref, slot_ref, vis_ref, gw1_ref,
                       gw2_ref, gvis_ref, dgeom_ref, *, th: int, tw: int,
                       K: int, C: int, tx: int, inv_sigma: float):
    p = pl.program_id(0)
    cc = pl.program_id(1)
    count = counts_ref[p]
    y0 = ((p // tx) * th).astype(jnp.float32)
    x0 = ((p % tx) * tw).astype(jnp.float32)
    uu = x0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    vv = y0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)

    dgeom_ref[0] = jnp.zeros((9, C), jnp.float32)

    @pl.when(cc * C < count)
    def _active():
        n_faces = jnp.minimum(count - cc * C, C)
        slot_grid = slot_ref[0]
        vis = vis_ref[0]
        gvis = gvis_ref[0]
        gw1 = gw1_ref[0]
        gw2 = gw2_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        def body(f, acc):
            # HAND-DERIVED backward (jax.vjp per face re-ran the full
            # forward plus an auto bwd — ~2.6x the fwd kernel; the closed
            # forms below share the recomputed primal pieces and cost ~1.4x):
            #   w_k = e_k / area          -> edge + area product rules
            #   cov = clip(c*d_signed+.5) -> envelope theorem on the segment
            #   distances (t* minimizes d, so d(t*) terms vanish; clipped t*
            #   is constant) gives dd/da = (t-1) v/d, dd/db = -t v/d.
            x0, y0, _z0, x1, y1, _z1, x2, y2, _z2 = (
                geom_ref[0, j, f] for j in range(9))

            def edge(ax, ay, bx, by):
                return (bx - ax) * (vv - ay) - (by - ay) * (uu - ax)

            e0 = edge(x1, y1, x2, y2)
            e1 = edge(x2, y2, x0, y0)
            e2 = edge(x0, y0, x1, y1)
            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            degen = jnp.abs(area) < 1e-12
            inv_area = 1.0 / jnp.where(degen, 1.0, area)
            w0 = e0 * inv_area
            w1 = e1 * inv_area
            w2 = e2 * inv_area
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

            def seg(ax, ay, bx, by):
                abx = bx - ax
                aby = by - ay
                len2 = jnp.maximum(abx * abx + aby * aby, 1e-12)
                apx = uu - ax
                apy = vv - ay
                t = jnp.clip((apx * abx + apy * aby) / len2, 0.0, 1.0)
                sx = apx - t * abx
                sy = apy - t * aby
                d = jnp.sqrt(sx * sx + sy * sy + 1e-12)
                return d, sx, sy, t

            d12, sx12, sy12, t12 = seg(x1, y1, x2, y2)
            d20, sx20, sy20, t20 = seg(x2, y2, x0, y0)
            d01, sx01, sy01, t01 = seg(x0, y0, x1, y1)
            inner = jnp.minimum(d12, d20)
            dmin = jnp.minimum(inner, d01)
            csig = 0.25 * inv_sigma
            raw = jnp.where(inside, dmin, -dmin) * csig + 0.5
            cov = jnp.clip(raw, 0.0, _COV_CAP)
            cov = jnp.where(degen, 0.0, cov)

            winner = (slot_grid == cc * C + f).astype(jnp.float32)
            gw1c = gw1 * winner
            gw2c = gw2 * winner
            # d vis / d cov_f = -prod_{g!=f}(1-cov_g) = -vis / (1-cov_f)
            gcov = gvis * (-vis / (1.0 - cov))
            gcov = jnp.where(degen | (raw <= 0.0) | (raw >= _COV_CAP),
                             0.0, gcov)
            # diagnosis switch: zero one half so constant folding drops its
            # reductions; results are WRONG unless 'all'
            if _BWD_PARTS == "cov":
                gw1c = jnp.zeros_like(gw1c)
                gw2c = jnp.zeros_like(gw2c)
            elif _BWD_PARTS == "winner":
                gcov = jnp.zeros_like(gcov)
            gd = gcov * csig
            gdmin = jnp.where(inside, gd, -gd)
            g_inner = jnp.where(inner <= d01, gdmin, 0.0)
            g_d01 = gdmin - g_inner
            g_d12 = jnp.where(d12 <= d20, g_inner, 0.0)
            g_d20 = g_inner - g_d12

            def seg_grads(g, d, sx, sy, t):
                gn = g / d
                return (jnp.sum(gn * sx * (t - 1.0)),   # d/d ax
                        jnp.sum(gn * sy * (t - 1.0)),   # d/d ay
                        jnp.sum(-gn * sx * t),          # d/d bx
                        jnp.sum(-gn * sy * t))          # d/d by

            # seg endpoints: d12 a=(x1,y1) b=(x2,y2); d20 a=(x2,y2) b=(x0,y0);
            # d01 a=(x0,y0) b=(x1,y1)
            a12x, a12y, b12x, b12y = seg_grads(g_d12, d12, sx12, sy12, t12)
            a20x, a20y, b20x, b20y = seg_grads(g_d20, d20, sx20, sy20, t20)
            a01x, a01y, b01x, b01y = seg_grads(g_d01, d01, sx01, sy01, t01)

            de1 = gw1c * inv_area
            de2 = gw2c * inv_area
            garea = -jnp.sum(gw1c * w1 + gw2c * w2) * inv_area

            # edge e(a,b): de/da = (by - vv, uu - bx); de/db = (vv - ay, ax - uu)
            gx0 = (jnp.sum(de1 * (vv - y2)) + jnp.sum(de2 * (y1 - vv))
                   + garea * (y1 - y2) + a01x + b20x)
            gy0 = (jnp.sum(de1 * (x2 - uu)) + jnp.sum(de2 * (uu - x1))
                   + garea * (x2 - x1) + a01y + b20y)
            gx1 = (jnp.sum(de2 * (vv - y0)) + garea * (y2 - y0) + a12x + b01x)
            gy1 = (jnp.sum(de2 * (x0 - uu)) + garea * (x0 - x2) + a12y + b01y)
            gx2 = (jnp.sum(de1 * (y0 - vv)) + garea * (y0 - y1) + a20x + b12x)
            gy2 = (jnp.sum(de1 * (uu - x0)) + garea * (x1 - x0) + a20y + b12y)

            zero = jnp.float32(0.0)
            dgs = (gx0, gy0, zero, gx1, gy1, zero, gx2, gy2, zero)
            # scatter the 9 scalar grads into lane f via a one-hot mask
            onehot = (lane == f).astype(jnp.float32)
            return tuple(acc[j] + dgs[j] * onehot for j in range(9))

        acc0 = tuple(jnp.zeros((1, C), jnp.float32) for _ in range(9))
        acc = jax.lax.fori_loop(0, n_faces, body, acc0)
        dgeom_ref[0] = jnp.concatenate(acc, axis=0)


@functools.lru_cache(maxsize=16)
def _raster_tiles_pallas(th: int, tw: int, K: int, tx: int, T: int,
                         inv_sigma: float, znear: float, zfar: float):
    """Factory: custom-vjp tile rasterizer closed over the static meta.

    Grid (T, K // C): the geometry is streamed chunk-by-chunk through
    BlockSpec index maps (last grid dim fastest, so a tile's chunks are
    consecutive and the per-tile output blocks stay resident in VMEM)."""
    C = _PCHUNK
    NC = K // C

    tile_specs = [pl.BlockSpec((1, th, tw), lambda p, cc, c: (p, 0, 0),
                               memory_space=pltpu.VMEM) for _ in range(6)]

    fwd_call = pl.pallas_call(
        partial(_raster_fwd_kernel, th=th, tw=tw, K=K, C=C, tx=tx,
                inv_sigma=inv_sigma, znear=znear, zfar=zfar),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T, NC),
            in_specs=[
                pl.BlockSpec((1, 9, C), lambda p, cc, c: (p, 0, cc),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(
                tile_specs[0], tile_specs[1], tile_specs[2], tile_specs[3],
                tile_specs[4],
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, th, tw), jnp.float32),   # w1
            jax.ShapeDtypeStruct((T, th, tw), jnp.float32),   # w2
            jax.ShapeDtypeStruct((T, th, tw), jnp.int32),     # slot
            jax.ShapeDtypeStruct((T, th, tw), jnp.float32),   # vis
            jax.ShapeDtypeStruct((T, th, tw), jnp.float32),   # zbest (scratch out)
        ),
    )

    bwd_call = pl.pallas_call(
        partial(_raster_bwd_kernel, th=th, tw=tw, K=K, C=C, tx=tx,
                inv_sigma=inv_sigma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T, NC),
            in_specs=[
                pl.BlockSpec((1, 9, C), lambda p, cc, c: (p, 0, cc),
                             memory_space=pltpu.SMEM),
                tile_specs[0], tile_specs[1], tile_specs[2], tile_specs[3],
                tile_specs[4],
            ],
            out_specs=pl.BlockSpec((1, 9, C), lambda p, cc, c: (p, 0, cc),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((T, 9, K), jnp.float32),
    )

    @jax.custom_vjp
    def raster_tiles(geom, counts):
        w1, w2, slot, vis, _zbest = fwd_call(counts, geom)
        return w1, w2, slot, vis

    def raster_tiles_fwd(geom, counts):
        out = raster_tiles(geom, counts)
        w1, w2, slot, vis = out
        return out, (geom, counts, slot, vis)

    def raster_tiles_bwd(res, g):
        geom, counts, slot, vis = res
        gw1, gw2, _gslot, gvis = g
        dgeom = bwd_call(counts, geom, slot, vis, gw1, gw2, gvis)
        import numpy as np

        zero_counts = np.zeros(counts.shape, dtype=jax.dtypes.float0)
        return dgeom, zero_counts

    raster_tiles.defvjp(raster_tiles_fwd, raster_tiles_bwd)
    return raster_tiles


def _rasterize_pallas(camera, tri, tri_n, valid, sigma_px, faces_per_tile):
    H, W = camera.height, camera.width
    th, tw = _pallas_tile_shape()
    F = tri.shape[0]
    fpt = _scale_faces_per_tile(faces_per_tile, th, tw)
    K = max(_PCHUNK, ((fpt + _PCHUNK - 1) // _PCHUNK) * _PCHUNK)

    tile_faces, counts, _, _, ty, tx, bin_max = _bin_faces(
        tri, valid, H, W, th, tw, K, sigma_px)
    T = ty * tx

    # sentinel face F -> zero geometry
    tri_p = jnp.concatenate([tri, jnp.zeros((1, 3, 3), tri.dtype)])
    tri_np_ = jnp.concatenate([tri_n, jnp.zeros((1, 3, 3), tri_n.dtype)])

    geom = tri_p.reshape(F + 1, 9)[tile_faces]          # [T,K,9]
    geom = geom.transpose(0, 2, 1).astype(jnp.float32)  # [T,9,K]

    raster_tiles = _raster_tiles_pallas(
        th, tw, K, tx, T, 1.0 / max(sigma_px, 1e-6),
        float(camera.znear), float(camera.zfar))
    w1, w2, slot, vis = raster_tiles(geom, counts)

    mask = slot >= 0
    slot_c = jnp.maximum(slot, 0)
    fid = jnp.take_along_axis(tile_faces, slot_c.reshape(T, -1), axis=1)
    fid = fid.reshape(T, th, tw)
    fid = jnp.where(mask, fid, -1)

    fid_safe = jnp.where(mask, fid, F)     # sentinel -> zeros
    corner = tri_p[fid_safe]               # [T,t,t,3,3]
    nrm = tri_np_[fid_safe]                # [T,t,t,3,3]
    w0 = 1.0 - w1 - w2
    z = (w0 * corner[..., 0, 2] + w1 * corner[..., 1, 2]
         + w2 * corner[..., 2, 2])
    normal = (w0[..., None] * nrm[..., 0, :] + w1[..., None] * nrm[..., 1, :]
              + w2[..., None] * nrm[..., 2, :])
    zbuf = jnp.where(mask, z, -1.0)
    normal = jnp.where(mask[..., None], normal, 0.0)

    alpha_soft = 1.0 - vis
    hard = jax.lax.stop_gradient(mask.astype(alpha_soft.dtype))
    alpha = jnp.maximum(hard, alpha_soft)

    u = partial(_untile, ty=ty, tx=tx, tile_h=th, tile_w=tw, H=H, W=W)
    return RasterOut(zbuf=u(zbuf), normal=u(normal), face_id=u(fid),
                     alpha=u(alpha), bin_max=bin_max,
                     bin_capacity=jnp.asarray(K, jnp.int32))


# =========================================================================== #
# XLA path (r1 design; CPU tests + small images)
# =========================================================================== #

def _rasterize_xla(camera, tri, tri_n, valid, sigma_px, tile, faces_per_tile,
                   chunk):
    H, W = camera.height, camera.width
    chunk = _math.gcd(chunk, faces_per_tile)
    F = tri.shape[0]

    tile_faces, _, tile_y0, tile_x0, ty, tx, bin_max = _bin_faces(
        tri, valid, H, W, tile, tile, faces_per_tile, sigma_px)

    # sentinel face F: append a masked dummy entry
    tri_p = jnp.concatenate([tri, jnp.zeros((1, 3, 3), tri.dtype)])
    tri_np = jnp.concatenate([tri_n, jnp.zeros((1, 3, 3), tri_n.dtype)])
    valid_p = jnp.concatenate([valid, jnp.zeros((1,), bool)])

    # pixel coordinates inside one tile
    py, px = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")

    inv_sigma = 1.0 / max(sigma_px, 1e-6)
    big = jnp.asarray(3.0e38, jnp.float32)

    def render_tile(face_ids, y0, x0):
        u = px + x0.astype(jnp.float32)            # [t,t]
        v = py + y0.astype(jnp.float32)

        init = (
            jnp.full((tile, tile), big),           # best z
            jnp.zeros((tile, tile, 3)),            # best normal
            jnp.full((tile, tile), -1, jnp.int32),  # best face
            jnp.ones((tile, tile)),                # visibility product (1-cov)
        )

        face_ids_c = face_ids.reshape(-1, chunk)

        def body(state, ids):
            best_z, best_n, best_f, log_vis = state
            t = tri_p[ids]                          # [C,3,3]
            tn = tri_np[ids]
            ok = valid_p[ids]                       # [C]

            # same per-face geometry as the Pallas kernels (seg-dist coverage)
            g9 = t.reshape(t.shape[0], 9).T           # [9, C]
            w0, w1, w2, zpix, cov_raw, degenerate = _chunk_geometry(
                g9, u, v, inv_sigma)
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)

            usable = ok[:, None, None] & ~degenerate[:, None, None]
            hit = inside & usable & (zpix > camera.znear) & (zpix < camera.zfar)

            # depth test within the chunk, then against running best.
            # Winner selection via a zc==zmin mask + multiply-add instead of
            # argmin/take_along_axis: gathers over the chunk axis are slow on
            # the VPU, masked FMAs are its native diet.
            zc = jnp.where(hit, zpix, big)            # [C,t,t]
            zmin = jnp.min(zc, axis=0)                # [t,t]
            winner = (zc == zmin[None]).astype(zpix.dtype) * hit
            # break ties (identical z) by normalizing the winner weights
            wsum = jnp.maximum(jnp.sum(winner, axis=0), 1.0)
            winner = winner / wsum[None]

            npix = (
                w0[..., None] * tn[:, 0][:, None, None, :]
                + w1[..., None] * tn[:, 1][:, None, None, :]
                + w2[..., None] * tn[:, 2][:, None, None, :]
            )                                          # [C,t,t,3]
            nsel = jnp.sum(npix * winner[..., None], axis=0)
            fsel = jnp.sum(ids[:, None, None] * winner, axis=0).astype(jnp.int32)

            take = zmin < best_z
            best_n = jnp.where(take[..., None], nsel, best_n)
            best_f = jnp.where(take, fsel, best_f)
            best_z = jnp.where(take, zmin, best_z)

            # soft coverage for the silhouette: a linear smoothstep instead
            # of sigmoid, and a multiplicative visibility product instead of
            # log1p/exp — per-face-pixel transcendentals dominate VPU time at
            # faces_per_tile x tile^2 scale.
            cov = jnp.where(usable, cov_raw, 0.0)
            vis = log_vis * jnp.prod(1.0 - cov, axis=0)

            return (best_z, best_n, best_f, vis), None

        # remat the chunk body: the backward pass otherwise stores every
        # chunk's [C, tile, tile] edge/bary intermediates (O(F * pixels) HBM —
        # observed 120+ GB at production shapes); recomputing them is cheap
        body_ckpt = jax.checkpoint(body, policy=jax.checkpoint_policies.nothing_saveable)
        (best_z, best_n, best_f, vis), _ = jax.lax.scan(body_ckpt, init, face_ids_c)
        # Interior pixels of a closed mesh sit near shared edges where each
        # face's soft coverage is ~0.5; the hard hit-mask (no gradient)
        # saturates them to 1 while the soft product keeps boundary gradients.
        # Matches the reference's near-hard blending (sigma=1e-8, run.py:92).
        alpha_soft = 1.0 - vis
        hard = jax.lax.stop_gradient((best_f >= 0).astype(alpha_soft.dtype))
        alpha = jnp.maximum(hard, alpha_soft)
        zb = jnp.where(best_z >= big, -1.0, best_z)
        return zb, best_n, best_f, alpha

    zb, nrm, fid, alpha = jax.vmap(render_tile)(tile_faces, tile_y0, tile_x0)

    u = partial(_untile, ty=ty, tx=tx, tile_h=tile, tile_w=tile, H=H, W=W)
    return RasterOut(zbuf=u(zb), normal=u(nrm), face_id=u(fid), alpha=u(alpha),
                     bin_max=bin_max,
                     bin_capacity=jnp.asarray(faces_per_tile, jnp.int32))


# =========================================================================== #
# dispatch
# =========================================================================== #

@partial(jax.jit, static_argnames=("camera", "tile", "faces_per_tile", "chunk",
                                   "sigma_px", "force_xla"))
def rasterize(
    camera: GuidanceCamera,
    verts: jnp.ndarray,        # [V,3] world (GL convention)
    faces: jnp.ndarray,        # [F,3] int32
    vert_normals: jnp.ndarray,  # [V,3]
    face_mask: jnp.ndarray,    # [F]
    sigma_px: float = 0.7,
    tile: int = 64,
    faces_per_tile: int = 4096,
    chunk: int = 512,
    force_xla: bool = False,
    fov_deg=None,              # traced per-image fov override (batched dp)
) -> RasterOut:
    H, W = camera.height, camera.width
    assert H % tile == 0 and W % tile == 0

    tri = _face_screen(camera, verts, faces, fov_deg)  # [F,3,3] (u,v,z)
    tri_n = vert_normals[faces]                    # [F,3,3]
    valid = (face_mask > 0) & jnp.all(tri[..., 2] > camera.znear, axis=-1)

    use_pallas = (
        _HAS_PALLAS
        and not force_xla
        and not os.environ.get("FOHO_TPU_FORCE_XLA_RASTER")
        and _on_tpu()
    )
    if use_pallas:
        # parse the env tile shape only where it is used: a malformed
        # FOHO_RASTER_TILE must not break the XLA/CPU path (ADVICE r4)
        pth, ptw = _pallas_tile_shape()
        use_pallas = H % pth == 0 and W % ptw == 0
    if use_pallas:
        return _rasterize_pallas(camera, tri, tri_n, valid, sigma_px,
                                 faces_per_tile)
    return _rasterize_xla(camera, tri, tri_n, valid, sigma_px, tile,
                          faces_per_tile, chunk)


def render_normal_and_disparity(
    camera: GuidanceCamera,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vert_normals: jnp.ndarray,
    face_mask: jnp.ndarray,
    sigma_px: float = 0.7,
    faces_per_tile: int = 4096,
    fov_deg=None,
) -> tuple[jnp.ndarray, jnp.ndarray, RasterOut]:
    """Normal map in [0,1] + normalized disparity, reference semantics
    (pipelines.py:272-289): empty depth -> 10, disparity = 1/(z+1e-6),
    both maps min/max-normalized over the image; background normals 0.
    """
    out = rasterize(camera, verts, faces, vert_normals, face_mask,
                    sigma_px=sigma_px, faces_per_tile=faces_per_tile,
                    fov_deg=fov_deg)
    mask = out.face_id >= 0

    n = out.normal
    # normalize over foreground; background stays 0 (reference zeroes ~mask)
    fg = mask[..., None]
    nmin = jnp.min(jnp.where(fg, n, jnp.inf))
    nmax = jnp.max(jnp.where(fg, n, -jnp.inf))
    nmin = jnp.where(jnp.isfinite(nmin), nmin, 0.0)
    nmax = jnp.where(jnp.isfinite(nmax), nmax, 1.0)
    n01 = (n - nmin) / (nmax - nmin + 1e-6)
    n01 = jnp.where(fg, n01, 0.0)

    depth = jnp.where(out.zbuf < 0, 10.0, out.zbuf)
    disp = 1.0 / (depth + 1e-6)
    disp01 = (disp - disp.min()) / (disp.max() - disp.min() + 1e-6)

    return n01, disp01, out
