"""SAM-2 (hiera) image segmentation in Flax — box-prompted prediction.

Replaces the reference's SAM2ImagePredictor path
(third_party/LSAM/lang_sam/models/sam.py:11-95: sam2.1_hiera_large,
predictor.predict(box=..., multimask_output=False)). Only the image
prediction stack is modeled — Hiera trunk + FPN neck, prompt encoder, and
two-way-transformer mask decoder; the video memory modules in the checkpoint
are ignored by the converter.

Checkpoint layout follows facebookresearch/sam2 (sam2.1_hiera_l.yaml):
image_encoder.trunk.* (Hiera), image_encoder.neck.* (FpnNeck),
sam_prompt_encoder.*, sam_mask_decoder.*.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Sam2Config:
    # Hiera-L (sam2.1_hiera_l.yaml)
    image_size: int = 1024
    embed_dim: int = 144
    num_heads: int = 2                    # initial heads
    stages: Tuple[int, ...] = (2, 6, 36, 4)
    global_att_blocks: Tuple[int, ...] = (23, 33, 43)
    window_spec: Tuple[int, ...] = (8, 4, 16, 8)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    # neck
    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (1152, 576, 288, 144)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    scalp: int = 1
    # decoder
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_mask_tokens: int = 4              # 3 multimask + 1 single
    # single-mask output falls back to the best multimask token when the
    # token-0 mask is unstable (sam2.1 dynamic_multimask_via_stability)
    dynamic_multimask_via_stability: bool = True
    stability_delta: float = 0.05
    stability_thresh: float = 0.98
    dtype: jnp.dtype = jnp.float32


SAM2_LARGE = Sam2Config()
SAM2_TINY_TEST = Sam2Config(
    image_size=128, embed_dim=16, num_heads=1, stages=(1, 1, 1, 1),
    global_att_blocks=(2,), window_spec=(4, 2, 4, 2),
    backbone_channel_list=(128, 64, 32, 16), d_model=32, decoder_depth=1,
    decoder_heads=2, decoder_mlp_dim=64)


def _window_partition(x, w):
    B, H, W, C = x.shape
    pad_h = (w - H % w) % w
    pad_w = (w - W % w) % w
    x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    win = x.reshape(B, Hp // w, w, Wp // w, w, C)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, C)
    return win, (Hp, Wp)


def _window_unpartition(win, w, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = win.shape[0] // (Hp * Wp // w // w)
    x = win.reshape(B, Hp // w, Wp // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class HieraAttention(nn.Module):
    """Hiera MultiScaleAttention: packed qkv, optional q-pooling (maxpool 2x2
    on queries when the stage transitions)."""

    dim_out: int
    heads: int
    q_pool: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = x.shape
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.heads, -1)
        q, k, v = jnp.moveaxis(qkv, 2, 0)                 # [B, HW, h, d]
        if self.q_pool:
            q = q.reshape(B, H, W, self.heads, -1)
            q = nn.max_pool(q.reshape(B, H, W, -1), (2, 2), strides=(2, 2))
            H, W = H // 2, W // 2
            q = q.reshape(B, H * W, self.heads, -1)
        hd = q.shape[-1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class HieraBlock(nn.Module):
    dim: int
    dim_out: int
    heads: int
    window_size: int      # 0 = global attention
    q_stride: int         # 2 at stage transition, else 1
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = x.shape
        shortcut = x
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm1")(x).astype(self.dtype)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(h)
        if self.q_stride > 1:
            shortcut = nn.max_pool(shortcut, (self.q_stride, self.q_stride),
                                   strides=(self.q_stride, self.q_stride))

        w = self.window_size
        if w > 0:
            win, pad_hw = _window_partition(h, w)
            win = HieraAttention(self.dim_out, self.heads,
                                 self.q_stride > 1, self.dtype,
                                 name="attn")(win)
            wq = w // self.q_stride
            out_hw = (H // self.q_stride, W // self.q_stride)
            pad_out = (pad_hw[0] // self.q_stride, pad_hw[1] // self.q_stride)
            h = _window_unpartition(win, wq, pad_out, out_hw)
        else:
            h = HieraAttention(self.dim_out, self.heads, self.q_stride > 1,
                               self.dtype, name="attn")(h)
        x = shortcut + h

        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         name="norm2")(x).astype(self.dtype)
        h = nn.Dense(4 * self.dim_out, dtype=self.dtype, name="mlp1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim_out, dtype=self.dtype, name="mlp2")(h)
        return x + h


class Hiera(nn.Module):
    """Returns the 4 stage outputs (strides 4, 8, 16, 32), channels
    embed_dim * (1, 2, 4, 8)."""

    cfg: Sam2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = self.cfg
        B, H, W, _ = x.shape
        x = nn.Conv(c.embed_dim, (7, 7), strides=(4, 4),
                    padding=((3, 3), (3, 3)), dtype=c.dtype,
                    name="patch_embed")(x.astype(c.dtype))
        h, w = x.shape[1:3]

        # pos embed: interpolated background (7x7) + tiled window (8x8)
        bkg = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, *c.window_pos_embed_bkg_spatial_size, c.embed_dim),
                         jnp.float32)
        win = self.param("pos_embed_window", nn.initializers.normal(0.02),
                         (1, c.window_spec[0], c.window_spec[0], c.embed_dim),
                         jnp.float32)
        pos = jax.image.resize(bkg, (1, h, w, c.embed_dim), "bicubic")
        reps = (1, -(-h // c.window_spec[0]), -(-w // c.window_spec[0]), 1)
        wint = jnp.tile(win, reps)[:, :h, :w]
        x = x + (pos + wint).astype(c.dtype)

        stage_ends = np.cumsum(c.stages) - 1         # last block of each stage
        q_pool_blocks = set((np.cumsum(c.stages)[:-1]).tolist())
        outs = []
        dim = c.embed_dim
        heads = c.num_heads
        stage = 0
        total = int(np.sum(c.stages))
        for i in range(total):
            dim_out = dim
            q_stride = 1
            if i in q_pool_blocks:
                dim_out = dim * 2
                heads = heads * 2
                q_stride = 2
                stage += 1
            # the FIRST block of a stage windows with the PREVIOUS stage's
            # size (hieradet "lags by a block": partition happens pre-pool,
            # the window shrinks by q_stride after pooling)
            wstage = stage - 1 if q_stride > 1 else stage
            wsize = 0 if i in c.global_att_blocks else c.window_spec[wstage]
            x = HieraBlock(dim, dim_out, heads, wsize, q_stride, c.dtype,
                           name=f"block{i}")(x)
            dim = dim_out
            if i in set(stage_ends.tolist()):
                outs.append(x)
        return outs                                   # strides 4, 8, 16, 32


def _sine_pos_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """SAM2 PositionEmbeddingSine (normalize=True, scale 2pi) [h, w, dim]."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps) * scale
    half = dim // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)

    def enc(v):
        p = v[:, None] / dim_t
        return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                         axis=-1).reshape(v.shape[0], -1)

    pos_y = jnp.broadcast_to(enc(y)[:, None], (h, w, half))
    pos_x = jnp.broadcast_to(enc(x)[None], (h, w, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


class FpnNeck(nn.Module):
    """SAM2 FpnNeck: per-level 1x1 convs to d_model + top-down adds on
    fpn_top_down_levels (nearest upsampling)."""

    cfg: Sam2Config

    @nn.compact
    def __call__(self, trunk_outs):
        c = self.cfg
        # convs are indexed by backbone_channel_list order = HIGH->LOW stride?
        # sam2 FpnNeck convs[i] corresponds to backbone_channel_list[i]
        # (1152 first = stride-32); trunk_outs are stride 4..32 -> reverse.
        n = len(trunk_outs)
        feats = [None] * n
        prev = None
        for i in range(n - 1, -1, -1):            # from lowest res (stride 32)
            conv_idx = n - 1 - i
            lateral = nn.Conv(c.d_model, (1, 1), dtype=c.dtype,
                              name=f"conv{conv_idx}")(trunk_outs[i])
            if i in c.fpn_top_down_levels and prev is not None:
                B, H, W, D = lateral.shape
                up = jax.image.resize(prev, (B, H, W, D), "nearest")
                lateral = lateral + up
            prev = lateral
            feats[i] = lateral
        if c.scalp:
            feats = feats[:-1]                     # drop stride-32
        poss = [_sine_pos_2d(f.shape[1], f.shape[2], c.d_model) for f in feats]
        return feats, poss


# --------------------------------------------------------------------------- #
# prompt encoder + mask decoder
# --------------------------------------------------------------------------- #

class PromptEncoder(nn.Module):
    """Box prompts only (the pipeline path: predictor.predict(box=...))."""

    cfg: Sam2Config

    def pe_encode(self, coords01: jnp.ndarray, gauss: jnp.ndarray) -> jnp.ndarray:
        coords = 2.0 * coords01 - 1.0
        proj = coords @ gauss                       # [..., d/2]
        proj = 2 * math.pi * proj
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    @nn.compact
    def __call__(self, boxes01: jnp.ndarray):
        """boxes01: [B, 4] in [0,1] (x0,y0,x1,y1) -> sparse [B, 3, d]
        (corner1, corner2, not-a-point pad), dense no-mask [d]."""
        c = self.cfg
        gauss = self.param(
            "pe_gaussian", nn.initializers.normal(1.0),
            (2, c.d_model // 2), jnp.float32)
        corner1 = self.param("point_embed_2", nn.initializers.normal(1.0),
                             (c.d_model,), jnp.float32)
        corner2 = self.param("point_embed_3", nn.initializers.normal(1.0),
                             (c.d_model,), jnp.float32)
        # unused prompt types kept for checkpoint parity
        self.param("point_embed_0", nn.initializers.normal(1.0),
                   (c.d_model,), jnp.float32)
        self.param("point_embed_1", nn.initializers.normal(1.0),
                   (c.d_model,), jnp.float32)
        not_a_point = self.param("not_a_point_embed", nn.initializers.normal(1.0),
                                 (c.d_model,), jnp.float32)
        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (c.d_model,), jnp.float32)

        # SAM adds 0.5 px (center offset) in pixel space before normalizing;
        # boxes01 are already normalized by the caller including that shift.
        # The image-predictor path feeds boxes as corner POINTS with a padding
        # not-a-point token appended (SAM2ImagePredictor._predict box->points,
        # _embed_points pad=True): 3 sparse tokens, not 2.
        p1 = self.pe_encode(boxes01[:, :2], gauss) + corner1
        p2 = self.pe_encode(boxes01[:, 2:], gauss) + corner2
        pad = jnp.broadcast_to(not_a_point, p1.shape)
        sparse = jnp.stack([p1, p2, pad], axis=1)
        return sparse.astype(c.dtype), no_mask

    def dense_pe(self, h: int, w: int):
        gauss = self.get_variable("params", "pe_gaussian")
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        return self.pe_encode(jnp.stack([xx, yy], -1), gauss)   # [h, w, d]


class DecoderAttention(nn.Module):
    heads: int
    out_dim: int          # internal dim (possibly downsampled)
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, q, k, v):
        B, NQ, _ = q.shape
        hd = self.out_dim // self.heads

        def split(t):
            return t.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(self.out_dim, dtype=self.dtype, name="q_proj")(q))
        kh = split(nn.Dense(self.out_dim, dtype=self.dtype, name="k_proj")(k))
        vh = split(nn.Dense(self.out_dim, dtype=self.dtype, name="v_proj")(v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, NQ, self.out_dim)
        return nn.Dense(q.shape[-1], dtype=self.dtype, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    cfg: Sam2Config
    skip_first_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        d = c.d_model
        if self.skip_first_pe:
            # first layer: attention output REPLACES queries (no residual) —
            # sam2 TwoWayAttentionBlock.skip_first_layer_pe
            queries = DecoderAttention(c.decoder_heads, d, c.dtype,
                                       name="self_attn")(queries, queries,
                                                         queries)
        else:
            qp = queries + query_pe
            q = DecoderAttention(c.decoder_heads, d, c.dtype,
                                 name="self_attn")(qp, qp, queries)
            queries = queries + q
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm1")(
            queries).astype(c.dtype)

        qp = queries + query_pe
        kp = keys + key_pe
        attn = DecoderAttention(c.decoder_heads, d // 2, c.dtype,
                                name="cross_attn_token_to_image")(qp, kp, keys)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            queries + attn).astype(c.dtype)

        h = nn.Dense(c.decoder_mlp_dim, dtype=c.dtype, name="mlp1")(queries)
        h = nn.relu(h)
        h = nn.Dense(d, dtype=c.dtype, name="mlp2")(h)
        queries = nn.LayerNorm(dtype=jnp.float32, name="norm3")(
            queries + h).astype(c.dtype)

        qp = queries + query_pe
        attn = DecoderAttention(c.decoder_heads, d // 2, c.dtype,
                                name="cross_attn_image_to_token")(kp, qp, queries)
        keys = nn.LayerNorm(dtype=jnp.float32, name="norm4")(
            keys + attn).astype(c.dtype)
        return queries, keys


class MaskDecoder(nn.Module):
    cfg: Sam2Config

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse_prompt, dense_prompt,
                 feat_s0, feat_s1):
        """image_embed [B, h, w, d]; sparse [B, P, d]; dense [d];
        feat_s0/s1: high-res neck features (strides 4, 8). Returns mask
        logits [B, h*4, w*4, num_mask_tokens] and iou [B, num_mask_tokens]."""
        c = self.cfg
        d = c.d_model
        B, h, w, _ = image_embed.shape
        n_hyper = c.num_mask_tokens

        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, d), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_hyper, d), jnp.float32)
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0),
                               (1, d), jnp.float32)

        tokens = jnp.concatenate([obj_token, iou_token, mask_tokens], axis=0)
        tokens = jnp.broadcast_to(tokens[None], (B, *tokens.shape))
        tokens = jnp.concatenate([tokens, sparse_prompt], axis=1).astype(c.dtype)

        src = image_embed + dense_prompt
        src = src.reshape(B, h * w, d)
        pe = image_pe.reshape(1, h * w, d)
        pe = jnp.broadcast_to(pe, (B, h * w, d)).astype(c.dtype)

        q, k = tokens, src
        for i in range(c.decoder_depth):
            q, k = TwoWayBlock(c, skip_first_pe=(i == 0),
                               name=f"block{i}")(q, k, tokens, pe)
        # final token->image attention
        qp = q + tokens
        kp = k + pe
        attn = DecoderAttention(c.decoder_heads, d // 2, c.dtype,
                                name="final_attn_token_to_image")(qp, kp, k)
        q = nn.LayerNorm(dtype=jnp.float32, name="norm_final_attn")(
            q + attn).astype(c.dtype)

        iou_out = q[:, 1]
        mask_toks = q[:, 2:2 + n_hyper]

        # upscale image features x4, fusing high-res neck features (SAM2)
        src_sp = k.reshape(B, h, w, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2), dtype=c.dtype,
                              name="upscale1")(src_sp)
        s1 = nn.Conv(d // 4, (1, 1), dtype=c.dtype, name="conv_s1")(feat_s1)
        up = up + s1
        up = nn.LayerNorm(dtype=jnp.float32, name="upscale_norm")(up).astype(c.dtype)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2), dtype=c.dtype,
                              name="upscale2")(up)
        s0 = nn.Conv(d // 8, (1, 1), dtype=c.dtype, name="conv_s0")(feat_s0)
        up = nn.gelu(up + s0, approximate=False)       # [B, 4h, 4w, d/8]

        hypers = []
        for t in range(n_hyper):
            x = mask_toks[:, t]
            for li, dim in enumerate((d, d, d // 8)):
                x = nn.Dense(dim, dtype=jnp.float32,
                             name=f"hyper{t}_l{li}")(x)
                if li < 2:
                    x = nn.relu(x)
            hypers.append(x)
        hyper = jnp.stack(hypers, axis=1)              # [B, M, d/8]
        masks = jnp.einsum("bmd,bhwd->bhwm", hyper,
                           up.astype(jnp.float32))

        x = iou_out.astype(jnp.float32)
        for li, dim in enumerate((d, d, n_hyper)):
            x = nn.Dense(dim, dtype=jnp.float32, name=f"iou_l{li}")(x)
            if li < 2:
                x = nn.relu(x)
        # sam2.1 iou_prediction_use_sigmoid=true
        return masks, jax.nn.sigmoid(x)


class Sam2(nn.Module):
    """Full box-prompted image segmentation: image [B, H, W, 3] in [0,1]
    (ImageNet-normalized inside), boxes01 [B, 4] -> (mask logits upsampled to
    input res [B, H, W], iou scores [B])."""

    cfg: Sam2Config

    def setup(self):
        self.trunk = Hiera(self.cfg)
        self.neck = FpnNeck(self.cfg)
        self.prompt = PromptEncoder(self.cfg)
        self.decoder = MaskDecoder(self.cfg)
        # SAM2Base.no_mem_embed: added to the stride-16 embedding on the
        # image-predictor path (directly_add_no_mem_embed=true in sam2.1)
        self.no_mem_embed = self.param("no_mem_embed", nn.initializers.zeros,
                                       (1, 1, self.cfg.d_model), jnp.float32)

    def encode(self, image):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        x = (image - mean) / std
        feats, poss = self.neck(self.trunk(x))
        return feats, poss

    def __call__(self, image: jnp.ndarray, boxes01: jnp.ndarray):
        c = self.cfg
        feats, poss = self.encode(image)
        # feats: strides 4, 8, 16 -> s0, s1, image embedding
        feat_s0, feat_s1, image_embed = feats[0], feats[1], feats[2]
        image_embed = image_embed + self.no_mem_embed.reshape(1, 1, 1, -1).astype(c.dtype)
        sparse, no_mask = self.prompt(boxes01)
        dense = no_mask.astype(c.dtype)
        h, w = image_embed.shape[1:3]
        image_pe = self.prompt.dense_pe(h, w)
        masks, iou = self.decoder(image_embed, image_pe, sparse, dense,
                                  feat_s0, feat_s1)
        # single-mask output (multimask_output=False -> token 0), with the
        # sam2.1 stability fallback: if token 0's mask is unstable, use the
        # highest-iou multimask token instead (MaskDecoder._dynamic_multimask_
        # via_stability)
        B = image.shape[0]
        logits = masks[..., 0]
        iou0 = iou[:, 0]
        if c.dynamic_multimask_via_stability:
            flat0 = logits.reshape(B, -1)
            area_i = jnp.sum(flat0 > c.stability_delta, axis=-1).astype(jnp.float32)
            area_u = jnp.sum(flat0 > -c.stability_delta, axis=-1).astype(jnp.float32)
            stability = jnp.where(area_u > 0, area_i / jnp.maximum(area_u, 1.0), 1.0)
            stable = stability >= c.stability_thresh
            best = jnp.argmax(iou[:, 1:], axis=-1)                  # [B]
            mbest = jnp.take_along_axis(
                masks[..., 1:], best[:, None, None, None], axis=-1)[..., 0]
            ibest = jnp.take_along_axis(iou[:, 1:], best[:, None], axis=-1)[:, 0]
            logits = jnp.where(stable[:, None, None], logits, mbest)
            iou0 = jnp.where(stable, iou0, ibest)
        H, W = image.shape[1:3]
        logits = jax.image.resize(logits, (B, H, W), "bilinear")
        return logits, iou0


def segment_box(model: Sam2, params, image_rgb: np.ndarray,
                box_xyxy: np.ndarray) -> np.ndarray:
    """predictor.predict(box=..., multimask_output=False) contract: bool mask
    at the original image resolution."""
    from PIL import Image

    c = model.cfg
    H, W = image_rgb.shape[:2]
    img = Image.fromarray(image_rgb).resize((c.image_size, c.image_size))
    x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    box = np.asarray(box_xyxy, np.float32)
    scale = np.asarray([c.image_size / W, c.image_size / H] * 2, np.float32)
    box01 = (box * scale + 0.5) / c.image_size
    logits, _ = model.apply(params, x, jnp.asarray(box01[None]))
    mask = np.asarray(logits[0]) > 0.0
    mask_img = Image.fromarray(mask.astype(np.uint8) * 255).resize((W, H))
    return np.asarray(mask_img) > 127
