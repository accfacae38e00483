"""MoGe-2 monocular geometry model in Flax.

Reference: MoGe/moge/model/v2.py (MoGeModel), modules.py (DINOv2Encoder /
ConvStack / MLP), utils/geometry_torch.py (normalized_view_plane_uv,
recover_focal_shift).

Architecture (v2.py:128-179): DINOv2-L encoder -> 1x1 projections summed ->
5-level ConvStack neck where levels 1..4 start from normalized-UV maps ->
ConvStack heads (points / normal / mask) + MLP metric-scale head on the cls
token; outputs bilinearly resized to the input resolution.

TPU-native deviations:
- focal/shift recovery is a fully on-device vectorized bracketed search +
  golden-section refinement instead of scipy least_squares on host
  (geometry_numpy.py:79-112) — same objective, jittable, batchable.
- NHWC layout, bf16 matmuls / fp32 heads.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from followmyhold_tpu.models.vit import DINOV2_VIT_L, ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class MoGeConfig:
    encoder: ViTConfig = DINOV2_VIT_L
    intermediate_layers: Tuple[int, ...] = (5, 11, 17, 23)
    dim_proj: int = 512               # encoder 1x1 projection dim
    neck_dims: Tuple[int, ...] = (512, 256, 128, 64, 32)   # per level (stride 1..1/16)
    head_dims: Tuple[int, ...] = (512, 256, 128, 64, 32)
    num_res_blocks: int = 2
    # ConvStack knobs mirroring the reference (modules.py ConvStack/__init__);
    # the real values come from the checkpoint's config json at conversion.
    resampler: str = "pixel_shuffle"   # 'pixel_shuffle' | 'bilinear' | 'nearest'
    res_block_hidden_mult: int = 1     # dim_times_res_block_hidden
    scale_head_dims: Tuple[int, ...] = (1024, 512, 128, 1)
    use_normal_head: bool = True
    remap_output: str = "linear"       # 'linear' | 'sinh' | 'exp' | 'sinh_exp'
    num_tokens_range: Tuple[int, int] = (1200, 3600)
    dtype: jnp.dtype = jnp.bfloat16


class MoGeOutput(NamedTuple):
    points: jnp.ndarray          # [B,H,W,3] camera-space (OpenCV, z fwd)
    depth: jnp.ndarray           # [B,H,W]
    normal: Optional[jnp.ndarray]  # [B,H,W,3]
    mask: jnp.ndarray            # [B,H,W] bool
    intrinsics: jnp.ndarray      # [B,3,3] normalized
    metric_scale: jnp.ndarray    # [B]
    fov_x_deg: jnp.ndarray       # [B]
    fov_y_deg: jnp.ndarray       # [B]


def normalized_view_plane_uv(height: int, width: int,
                             aspect_ratio: Optional[float] = None) -> jnp.ndarray:
    """UV spanning +-(w,h)/diagonal (geometry_torch.py:40-52)."""
    if aspect_ratio is None:
        aspect_ratio = width / height
    span_x = aspect_ratio / (1 + aspect_ratio ** 2) ** 0.5
    span_y = 1 / (1 + aspect_ratio ** 2) ** 0.5
    u = jnp.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    v = jnp.linspace(-span_y * (height - 1) / height, span_y * (height - 1) / height, height)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)  # [H,W,2]


class ReplConv3(nn.Module):
    """3x3 conv, torch padding_mode='replicate' (modules.py convs)."""

    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class ResidualConvBlock(nn.Module):
    """Faithful port of modules.py ResidualConvBlock: GN(layer) -> act ->
    conv3(replicate) -> GN(group) -> act -> conv3(replicate), plus a 1x1 skip
    projection when in/out dims differ."""

    out_channels: int
    hidden_channels: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        if in_channels != self.out_channels:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip")(x.astype(self.dtype))
        else:
            skip = x
        # in_norm = 'layer_norm' -> GroupNorm(1); hidden_norm = 'group_norm'
        # -> GroupNorm(hidden // 32) (modules.py:47-58)
        h = nn.GroupNorm(num_groups=1, dtype=jnp.float32, name="in_norm")(x)
        h = nn.relu(h).astype(self.dtype)
        h = ReplConv3(self.hidden_channels, self.dtype, name="conv1")(h)
        h = nn.GroupNorm(num_groups=max(self.hidden_channels // 32, 1),
                         dtype=jnp.float32, name="hidden_norm")(h)
        h = nn.relu(h).astype(self.dtype)
        h = ReplConv3(self.out_channels, self.dtype, name="conv2")(h)
        return h + skip


def _pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle in NHWC: channel index c*r^2 + i*r + j ->
    spatial (h*r+i, w*r+j)."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)       # B, H, r, W, r, c
    return x.reshape(B, H * r, W * r, c)


class Resampler(nn.Module):
    """modules.py Resampler (x2 upsampling between ConvStack levels)."""

    out_channels: int
    kind: str               # 'pixel_shuffle' | 'bilinear' | 'nearest'
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "pixel_shuffle":
            h = ReplConv3(self.out_channels * 4, self.dtype, name="conv0")(x)
            h = _pixel_shuffle(h, 2)
            return ReplConv3(self.out_channels, self.dtype, name="conv1")(h)
        if self.kind in ("bilinear", "nearest"):
            B, H, W, C = x.shape
            h = jax.image.resize(x, (B, H * 2, W * 2, C), self.kind)
            return ReplConv3(self.out_channels, self.dtype, name="conv0")(h)
        raise ValueError(f"Unsupported resampler: {self.kind}")


class ConvStack(nn.Module):
    """Faithful port of modules.py ConvStack: per level, 1x1 input block is
    ADDED to the running features, res blocks run, a 1x1 output block emits
    the level output, then the resampler upsamples x2 for the next level.
    Returns the list of per-level outputs."""

    level_dims: Sequence[int]
    out_dim: Optional[int]
    num_res_blocks: int
    dtype: jnp.dtype
    resampler: str = "pixel_shuffle"
    hidden_mult: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[Optional[jnp.ndarray]]):
        outs = []
        x = None
        for lvl, dim in enumerate(self.level_dims):
            inp = inputs[lvl] if lvl < len(inputs) else None
            if inp is not None:
                inp = nn.Conv(dim, (1, 1), dtype=self.dtype, name=f"in{lvl}")(
                    inp.astype(self.dtype))
            if x is None:
                x = inp
            elif inp is not None:
                x = x + inp
            for b in range(self.num_res_blocks):
                x = ResidualConvBlock(dim, dim * self.hidden_mult, self.dtype,
                                      name=f"res{lvl}_{b}")(x)
            if self.out_dim is not None:
                outs.append(nn.Conv(self.out_dim, (1, 1), dtype=jnp.float32,
                                    name=f"out{lvl}")(x.astype(jnp.float32)))
            else:
                outs.append(x)
            if lvl < len(self.level_dims) - 1:
                x = Resampler(self.level_dims[lvl + 1], self.resampler,
                              self.dtype, name=f"up{lvl}")(x)
        return outs


def _remap_points(points: jnp.ndarray, kind: str) -> jnp.ndarray:
    """v2.py:112-126 _remap_points."""
    if kind == "linear":
        return points
    if kind == "sinh":
        return jnp.sinh(points)
    if kind == "exp":
        z = jnp.exp(points[..., 2:])
        return jnp.concatenate([points[..., :2] * z, z], axis=-1)
    if kind == "sinh_exp":
        return jnp.concatenate(
            [jnp.sinh(points[..., :2]), jnp.exp(points[..., 2:])], axis=-1)
    raise ValueError(f"Invalid remap output type: {kind}")


class MoGe(nn.Module):
    cfg: MoGeConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, num_tokens: int):
        """image: [B,H,W,3] in [0,1]. Returns dict of raw head outputs at
        input resolution (v2.py:128-179)."""
        c = self.cfg
        B, H, W, _ = image.shape
        aspect = W / H
        base_h = int((num_tokens / aspect) ** 0.5)
        base_w = int((num_tokens * aspect) ** 0.5)

        p = c.encoder.patch_size
        img14 = jax.image.resize(image, (B, base_h * p, base_w * p, 3), "bilinear")
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        img14 = (img14 - mean) / std

        inter, _, cls_token = ViT(c.encoder, name="backbone")(
            img14, out_layers=list(c.intermediate_layers))
        feat = None
        for i, tok in enumerate(inter):
            fmap = tok.reshape(B, base_h, base_w, -1)
            proj = nn.Conv(c.dim_proj, (1, 1), dtype=c.dtype, name=f"proj{i}")(
                fmap.astype(c.dtype))
            feat = proj if feat is None else feat + proj

        # 5 pyramid levels; level l runs at base * 2^l with UV concatenated
        levels = []
        for lvl in range(len(c.neck_dims)):
            h_l, w_l = base_h * 2 ** lvl, base_w * 2 ** lvl
            uv = normalized_view_plane_uv(h_l, w_l, aspect)
            uv = jnp.broadcast_to(uv[None], (B, h_l, w_l, 2)).astype(c.dtype)
            if lvl == 0:
                levels.append(jnp.concatenate([feat, uv], axis=-1))
            else:
                levels.append(uv)

        def stack(dims, out_dim, name):
            return ConvStack(dims, out_dim, c.num_res_blocks, c.dtype,
                             resampler=c.resampler,
                             hidden_mult=c.res_block_hidden_mult, name=name)

        neck_feats = stack(c.neck_dims, None, "neck")(levels)

        points = stack(c.head_dims, 3, "points_head")(neck_feats)[-1]
        mask = stack(c.head_dims, 1, "mask_head")(neck_feats)[-1]
        normal = None
        if c.use_normal_head:
            normal = stack(c.head_dims, 3, "normal_head")(neck_feats)[-1]

        # metric scale from cls token (MLP ... -> exp). The output layer
        # zero-inits so a fresh model predicts scale exp(0)=1 instead of a
        # random exponential blow-up; converted checkpoints overwrite it.
        h = cls_token.astype(jnp.float32)
        for i, d in enumerate(c.scale_head_dims[:-1]):
            h = nn.relu(nn.Dense(d, dtype=jnp.float32, name=f"scale{i}")(h))
        metric_scale = jnp.exp(
            nn.Dense(c.scale_head_dims[-1], dtype=jnp.float32,
                     kernel_init=nn.initializers.zeros, name="scale_out")(h)
        )[:, 0]

        def up(x):
            return jax.image.resize(
                x.astype(jnp.float32), (B, H, W, x.shape[-1]), "bilinear")

        points = _remap_points(up(points), c.remap_output)
        mask = jax.nn.sigmoid(up(mask)[..., 0])
        if normal is not None:
            normal = up(normal)
            normal = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
        return dict(points=points, mask=mask, normal=normal, metric_scale=metric_scale)


# ---------------------------------------------------------------------------
# focal / shift recovery (on-device replacement for geometry_numpy.py:79-112)
# ---------------------------------------------------------------------------

def _shift_cost(shift, uv, xy, z, w, focal=None):
    """Residual of min_f |f * xy/(z+shift) - uv|^2 (f in closed form unless
    given)."""
    denom = z + shift
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    proj = xy / denom[..., None]
    if focal is None:
        num = jnp.sum(w[..., None] * proj * uv)
        den = jnp.sum(w[..., None] * proj * proj)
        f = num / jnp.maximum(den, 1e-12)
    else:
        f = focal
    err = (f * proj - uv) * w[..., None]
    return jnp.sum(err * err), f


def solve_focal_shift(
    uv: jnp.ndarray,      # [N,2]
    points: jnp.ndarray,  # [N,3] affine point map samples
    mask: Optional[jnp.ndarray] = None,   # [N]
    focal: Optional[jnp.ndarray] = None,  # scalar, when fov is known
    num_candidates: int = 64,
    refine_iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid-bracketed + golden-section search for the optimal z shift.

    Returns (focal, shift), focal relative to half the image diagonal (the
    MoGe convention).
    """
    xy = points[..., :2]
    z = points[..., 2]
    w = jnp.ones_like(z) if mask is None else mask.astype(jnp.float32)

    # bracket: shift must keep z + shift > 0 for (weighted) points
    zmin = jnp.min(jnp.where(w > 0, z, jnp.inf))
    lo = -zmin + 1e-3
    hi = lo + 10.0

    ts = jnp.linspace(0.0, 1.0, num_candidates)
    cands = lo + (hi - lo) * ts ** 2.0  # denser near the lower bracket
    costs = jax.vmap(lambda s: _shift_cost(s, uv, xy, z, w, focal)[0])(cands)
    best = jnp.argmin(costs)
    a = cands[jnp.maximum(best - 1, 0)]
    b = cands[jnp.minimum(best + 1, num_candidates - 1)]

    gr = (math.sqrt(5.0) - 1) / 2

    def body(_, ab):
        a, b = ab
        c1 = b - gr * (b - a)
        c2 = a + gr * (b - a)
        f1, _ = _shift_cost(c1, uv, xy, z, w, focal)
        f2, _ = _shift_cost(c2, uv, xy, z, w, focal)
        return jnp.where(f1 < f2, a, c1), jnp.where(f1 < f2, c2, b)

    a, b = jax.lax.fori_loop(0, refine_iters, body, (a, b))
    shift = (a + b) / 2
    _, f = _shift_cost(shift, uv, xy, z, w, focal)
    return f, shift


def recover_focal_shift(
    points: jnp.ndarray,                 # [B,H,W,3]
    mask: Optional[jnp.ndarray] = None,  # [B,H,W]
    focal: Optional[jnp.ndarray] = None,  # [B]
    downsample: Tuple[int, int] = (64, 64),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (geometry_torch.py:115-169 semantics, fully on device)."""
    B, H, W, _ = points.shape
    uv = normalized_view_plane_uv(H, W)

    pts_lr = jax.image.resize(points, (B, *downsample, 3), "nearest").reshape(B, -1, 3)
    uv_lr = jax.image.resize(uv, (*downsample, 2), "nearest").reshape(-1, 2)
    if mask is not None:
        m_lr = jax.image.resize(mask.astype(jnp.float32), (B, *downsample),
                                "nearest").reshape(B, -1) > 0.5
    else:
        m_lr = jnp.ones((B, downsample[0] * downsample[1]), bool)

    def solve_one(p, m, f):
        return solve_focal_shift(uv_lr, p, m, f)

    if focal is None:
        fs, ss = jax.vmap(lambda p, m: solve_one(p, m, None))(pts_lr, m_lr)
    else:
        fs, ss = jax.vmap(solve_one)(pts_lr, m_lr, focal)
    return fs, ss


def moge_infer(
    model: MoGe,
    params,
    image: jnp.ndarray,           # [B,H,W,3] in [0,1]
    num_tokens: Optional[int] = None,
    resolution_level: int = 9,
    fov_x_deg: Optional[jnp.ndarray] = None,
) -> MoGeOutput:
    """Full infer contract (v2.py:181-290): forward, recover focal/shift,
    shift depth, force projection, apply metric scale, mask invalid."""
    c = model.cfg
    B, H, W, _ = image.shape
    aspect = W / H
    if num_tokens is None:
        lo, hi = c.num_tokens_range
        num_tokens = int(lo + (resolution_level / 9) * (hi - lo))

    out = model.apply(params, image, num_tokens)
    points, mask_p = out["points"], out["mask"]
    normal, metric_scale = out["normal"], out["metric_scale"]
    mask_binary = mask_p > 0.5

    if fov_x_deg is None:
        focal, shift = recover_focal_shift(points, mask_binary)
    else:
        f_known = aspect / (1 + aspect ** 2) ** 0.5 / jnp.tan(
            jnp.deg2rad(jnp.asarray(fov_x_deg, jnp.float32)) / 2)
        f_known = jnp.broadcast_to(f_known, (B,))
        focal, shift = recover_focal_shift(points, mask_binary, focal=f_known)
        focal = f_known

    fx = focal / 2 * (1 + aspect ** 2) ** 0.5 / aspect
    fy = focal / 2 * (1 + aspect ** 2) ** 0.5
    intrinsics = jnp.zeros((B, 3, 3), jnp.float32)
    intrinsics = intrinsics.at[:, 0, 0].set(fx).at[:, 1, 1].set(fy)
    intrinsics = intrinsics.at[:, 0, 2].set(0.5).at[:, 1, 2].set(0.5)
    intrinsics = intrinsics.at[:, 2, 2].set(1.0)

    depth = points[..., 2] + shift[:, None, None]
    mask_binary = mask_binary & (depth > 0)

    # force projection: recompute points from depth + intrinsics
    u = (jnp.arange(W) + 0.5) / W
    v = (jnp.arange(H) + 0.5) / H
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    x = (uu[None] - 0.5) / fx[:, None, None] * depth
    y = (vv[None] - 0.5) / fy[:, None, None] * depth
    points = jnp.stack([x, y, depth], axis=-1)

    points = points * metric_scale[:, None, None, None]
    depth = depth * metric_scale[:, None, None]

    fov_x = jnp.rad2deg(2 * jnp.arctan(0.5 / fx))
    fov_y = jnp.rad2deg(2 * jnp.arctan(0.5 / fy))
    return MoGeOutput(
        points=points, depth=depth, normal=normal, mask=mask_binary,
        intrinsics=intrinsics, metric_scale=metric_scale,
        fov_x_deg=fov_x, fov_y_deg=fov_y,
    )
