"""Tiled differentiable rasterizer (pure XLA; TPU-native PyTorch3D replacement).

Replaces the reference's MeshRenderer stacks (guidance/run.py:95-116):
- PhongNormalShader  (pipelines.py:74-92): interpolated vertex normals,
- SoftSilhouetteShader: order-independent soft coverage,
- zbuf-based disparity (render_normal_and_disparity, pipelines.py:272-289).

Design (coarse-to-fine, like PyTorch3D's CUDA rasterizer but expressed as XLA
gather/scan so it jits for TPU):

1. Project all faces to screen space; compute per-face screen bboxes.
2. BIN faces to image tiles: tile/face overlap matrix -> per-tile face lists
   of static capacity via jnp.nonzero(size=...).
3. Per tile (vmap) x face-chunk (scan): edge functions for every pixel in the
   tile, hard z-min depth test for depth/normals (gradients flow through the
   winning face's barycentrics), and a sigmoid(signed-edge-distance/sigma)
   soft coverage accumulated multiplicatively in log space for the silhouette
   (no faces_per_pixel=100 top-K buffer needed — the product form is
   order-independent and fuses into the scan).

Both windings are rasterized (PyTorch3D cull_backfaces=False default).
Silhouette sigma is in PIXELS; sigma_px -> 0 recovers the reference's
near-hard blending (sigma=1e-8, run.py:92).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from followmyhold_tpu.ops.camera import GuidanceCamera


class RasterOut(NamedTuple):
    zbuf: jnp.ndarray     # [H,W] camera-space depth, -1 where no face (pytorch3d zbuf convention)
    normal: jnp.ndarray   # [H,W,3] interpolated vertex normals (unnormalized), 0 where empty
    alpha: jnp.ndarray    # [H,W] soft silhouette in [0,1]
    face_id: jnp.ndarray  # [H,W] int32 winning face, -1 where empty


def _face_screen(camera: GuidanceCamera, verts: jnp.ndarray, faces: jnp.ndarray):
    uvz = camera.project(verts)                    # [V,3]
    tri = uvz[faces]                               # [F,3,3]
    return tri


@partial(jax.jit, static_argnames=("camera", "tile", "faces_per_tile", "chunk", "sigma_px"))
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
) -> RasterOut:
    H, W = camera.height, camera.width
    assert H % tile == 0 and W % tile == 0
    import math as _math

    chunk = _math.gcd(chunk, faces_per_tile)
    ty, tx = H // tile, W // tile
    n_tiles = ty * tx

    tri = _face_screen(camera, verts, faces)       # [F,3,3] (u,v,z)
    tri_n = vert_normals[faces]                    # [F,3,3]
    F = faces.shape[0]

    valid = (face_mask > 0) & jnp.all(tri[..., 2] > camera.znear, axis=-1)

    # --- 1. bin faces to tiles ---
    pad = sigma_px * 3.0 + 1.0
    fmin = tri[..., :2].min(axis=1) - pad          # [F,2]
    fmax = tri[..., :2].max(axis=1) + pad

    tile_ids = jnp.arange(n_tiles)
    tile_y0 = (tile_ids // tx) * tile
    tile_x0 = (tile_ids % tx) * tile
    overlap = (
        (fmin[None, :, 0] <= (tile_x0[:, None] + tile - 1))
        & (fmax[None, :, 0] >= tile_x0[:, None])
        & (fmin[None, :, 1] <= (tile_y0[:, None] + tile - 1))
        & (fmax[None, :, 1] >= tile_y0[:, None])
        & valid[None, :]
    )                                              # [T,F]

    def tile_list(row):
        (ids,) = jnp.nonzero(row, size=faces_per_tile, fill_value=F)
        return ids

    tile_faces = jax.vmap(tile_list)(overlap)       # [T, K]

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

            p0, p1, p2 = t[:, 0], t[:, 1], t[:, 2]  # [C,3]
            # edge functions at pixel centers: e_k = cross2(v_{k+1}-v_k, p-v_k)
            def edge(a, b):
                ex = b[:, 0] - a[:, 0]
                ey = b[:, 1] - a[:, 1]
                dxu = u[None] - a[:, 0, None, None]
                dyv = v[None] - a[:, 1, None, None]
                val = ex[:, None, None] * dyv - ey[:, None, None] * dxu  # [C,t,t]
                inv_len = jax.lax.rsqrt(jnp.maximum(ex * ex + ey * ey, 1e-12))
                return val, val * inv_len[:, None, None]

            e0, d0 = edge(p1, p2)   # opposite vertex 0
            e1, d1 = edge(p2, p0)   # opposite vertex 1
            e2, d2 = edge(p0, p1)   # opposite vertex 2

            area = (
                (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
                - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0])
            )                                         # [C] signed 2*area
            area_sign = jnp.sign(area)[:, None, None]
            degenerate = jnp.abs(area) < 1e-12

            # orient so "inside" is positive for either winding
            e0s, e1s, e2s = e0 * area_sign, e1 * area_sign, e2 * area_sign
            d_signed = jnp.minimum(jnp.minimum(d0 * area_sign, d1 * area_sign),
                                   d2 * area_sign)    # [C,t,t] >0 inside
            inside = (e0s >= 0) & (e1s >= 0) & (e2s >= 0)

            inv_area = 1.0 / jnp.where(degenerate, 1.0, jnp.abs(area))
            w0 = e0s * inv_area[:, None, None]
            w1 = e1s * inv_area[:, None, None]
            w2 = e2s * inv_area[:, None, None]

            z0, z1, z2 = t[:, 0, 2], t[:, 1, 2], t[:, 2, 2]
            zpix = (w0 * z0[:, None, None] + w1 * z1[:, None, None]
                    + w2 * z2[:, None, None])

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
            cov = jnp.clip(d_signed * (0.25 * inv_sigma) + 0.5, 0.0, 1.0)
            cov = jnp.where(usable, cov, 0.0)
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

    def untile(x):
        c = x.shape[3:]
        return x.reshape(ty, tx, tile, tile, *c).transpose(
            0, 2, 1, 3, *range(4, 4 + len(c))
        ).reshape(H, W, *c)

    return RasterOut(zbuf=untile(zb), normal=untile(nrm),
                     face_id=untile(fid), alpha=untile(alpha))


def render_normal_and_disparity(
    camera: GuidanceCamera,
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vert_normals: jnp.ndarray,
    face_mask: jnp.ndarray,
    sigma_px: float = 0.7,
    faces_per_tile: int = 4096,
) -> tuple[jnp.ndarray, jnp.ndarray, RasterOut]:
    """Normal map in [0,1] + normalized disparity, reference semantics
    (pipelines.py:272-289): empty depth -> 10, disparity = 1/(z+1e-6),
    both maps min/max-normalized over the image; background normals 0.
    """
    out = rasterize(camera, verts, faces, vert_normals, face_mask,
                    sigma_px=sigma_px, faces_per_tile=faces_per_tile)
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
