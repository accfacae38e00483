"""GroundingDINO (zero-shot text-prompted detector) in Flax.

Faithful port of the HF `GroundingDinoForObjectDetection` graph (transformers
models/grounding_dino/modeling_grounding_dino.py) so the
IDEA-Research/grounding-dino-base checkpoint converts losslessly — this is
the detector behind the reference's LangSAM segmentation front end
(third_party/LSAM/lang_sam/models/gdino.py:10-14, lang_sam.py:18-74).

Architecture: Swin-B multi-scale features + BERT text features, projected to
d_model=256, fused by a 6-layer encoder (bi-directional vision<->text
attention + text self-attention + multi-scale deformable vision attention),
two-stage query selection (top-900 proposals), and a 6-layer decoder with
iterative box refinement. Class logits are contrastive dot products against
the encoder text features.

TPU notes: deformable attention's grid_sample becomes vectorized bilinear
gathers per level (static shapes; levels loop is a 4-iteration Python loop),
everything jits; top-k query selection is XLA top_k. Batch padding masks are
dropped (we always run full-valid single images, as the pipeline does), which
makes valid_ratios exactly 1.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.bert import BERT_BASE, BERT_TINY_TEST, BertConfig, BertModel
from followmyhold_tpu.models.swin import SWIN_B, SWIN_TINY_TEST, SwinBackbone, SwinConfig


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    swin: SwinConfig = SWIN_B
    bert: BertConfig = BERT_BASE
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    max_text_len: int = 256
    layer_norm_eps: float = 1e-5
    position_embedding_temperature: float = 20.0
    image_size: int = 800            # driver-side square resize (TPU static shapes)
    dtype: jnp.dtype = jnp.float32   # detection heads are precision-sensitive


GDINO_BASE = GroundingDinoConfig()
GDINO_TINY = GroundingDinoConfig(
    swin=SWIN_TINY_TEST, bert=BERT_TINY_TEST, d_model=32, num_queries=12,
    encoder_layers=1, decoder_layers=1, encoder_heads=2, decoder_heads=2,
    encoder_ffn_dim=64, decoder_ffn_dim=64, num_feature_levels=3,
    encoder_n_points=2, decoder_n_points=2, max_text_len=16, image_size=64)


# --------------------------------------------------------------------------- #
# positional encodings
# --------------------------------------------------------------------------- #

def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int,
                       temperature: float = 10000.0,
                       exchange_xy: bool = True) -> jnp.ndarray:
    """[..., n] -> [..., n * num_pos_feats] (modeling_grounding_dino.py:1043)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    def sine(x):  # [..., 1] -> [..., num_pos_feats]
        sx = x * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])],
                         axis=-1).reshape(*sx.shape[:-1], -1)

    embs = [sine(pos[..., i:i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy:
        embs[0], embs[1] = embs[1], embs[0]
    return jnp.concatenate(embs, axis=-1)


def vision_sine_pos(h: int, w: int, d_model: int,
                    temperature: float) -> jnp.ndarray:
    """Full-valid-mask sine position map [h, w, d_model]
    (GroundingDinoSinePositionEmbedding with pixel_mask=1)."""
    half = d_model // 2
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps) * scale
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)

    def enc(v):  # [n] -> [n, half]
        p = v[:, None] / dim_t
        return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                         axis=-1).reshape(v.shape[0], -1)

    pos_y = jnp.broadcast_to(enc(y)[:, None], (h, w, half))
    pos_x = jnp.broadcast_to(enc(x)[None], (h, w, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


# --------------------------------------------------------------------------- #
# multi-scale deformable attention
# --------------------------------------------------------------------------- #

def _grid_sample_zeros(value: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray):
    """Bilinear sample with zero padding, align_corners=False.

    value [N, h, w, d]; gx/gy [N, S] in [-1, 1] -> [N, S, d]."""
    N, h, w, d = value.shape
    x = ((gx + 1.0) * w - 1.0) / 2.0
    y = ((gy + 1.0) * h - 1.0) / 2.0
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    flat = value.reshape(N, h * w, d)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yi_c * w + xi_c                        # [N, S]
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return g * inb[..., None]

    wx1 = x - x0
    wy1 = y - y0
    out = (gather(y0, x0) * ((1 - wx1) * (1 - wy1))[..., None]
           + gather(y0, x0 + 1) * (wx1 * (1 - wy1))[..., None]
           + gather(y0 + 1, x0) * ((1 - wx1) * wy1)[..., None]
           + gather(y0 + 1, x0 + 1) * (wx1 * wy1)[..., None])
    return out


def ms_deform_sample(value: jnp.ndarray, spatial_shapes: Sequence[Tuple[int, int]],
                     sampling_locations: jnp.ndarray,
                     attention_weights: jnp.ndarray) -> jnp.ndarray:
    """value [B, S, H, hd]; sampling_locations [B, Q, H, L, P, 2] in [0,1];
    attention_weights [B, Q, H, L, P] -> [B, Q, H*hd]."""
    B, S, H, hd = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    grids = 2 * sampling_locations - 1

    start = 0
    sampled = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, start:start + h * w]                      # [B, hw, H, hd]
        v = v.transpose(0, 2, 1, 3).reshape(B * H, h * w, hd).reshape(
            B * H, h, w, hd)
        g = grids[:, :, :, lvl].transpose(0, 2, 1, 3, 4)       # [B, H, Q, P, 2]
        g = g.reshape(B * H, Q * P, 2)
        s = _grid_sample_zeros(v, g[..., 0], g[..., 1])        # [BH, QP, hd]
        sampled.append(s.reshape(B, H, Q, P, hd))
        start += h * w

    stacked = jnp.stack(sampled, axis=3)                       # [B, H, Q, L, P, hd]
    wts = attention_weights.transpose(0, 2, 1, 3, 4)           # [B, H, Q, L, P]
    out = jnp.sum(stacked * wts[..., None], axis=(3, 4))       # [B, H, Q, hd]
    return out.transpose(0, 2, 1, 3).reshape(B, Q, H * hd)


class DeformableAttention(nn.Module):
    """GroundingDinoMultiscaleDeformableAttention (deformable-DETR style)."""

    cfg: GroundingDinoConfig
    heads: int
    n_points: int

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states, position_embeddings,
                 reference_points, spatial_shapes: Sequence[Tuple[int, int]]):
        c = self.cfg
        L = c.num_feature_levels
        if position_embeddings is not None:
            hidden_states = hidden_states + position_embeddings
        B, Q, _ = hidden_states.shape
        S = encoder_hidden_states.shape[1]
        hd = c.d_model // self.heads

        value = nn.Dense(c.d_model, dtype=c.dtype, name="value_proj")(
            encoder_hidden_states).reshape(B, S, self.heads, hd)
        offsets = nn.Dense(self.heads * L * self.n_points * 2, dtype=c.dtype,
                           name="sampling_offsets")(hidden_states)
        offsets = offsets.reshape(B, Q, self.heads, L, self.n_points, 2)
        attn = nn.Dense(self.heads * L * self.n_points, dtype=c.dtype,
                        name="attention_weights")(hidden_states)
        attn = jax.nn.softmax(
            attn.reshape(B, Q, self.heads, L * self.n_points).astype(jnp.float32),
            axis=-1).reshape(B, Q, self.heads, L, self.n_points).astype(c.dtype)

        ref_dim = reference_points.shape[-1]
        if ref_dim == 2:
            normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes],
                                     jnp.float32)                  # [L, 2]
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        else:  # 4: (cx, cy, w, h)
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / self.n_points
                   * reference_points[:, :, None, :, None, 2:] * 0.5)

        out = ms_deform_sample(value, spatial_shapes, loc, attn)
        return nn.Dense(c.d_model, dtype=c.dtype, name="output_proj")(out)


# --------------------------------------------------------------------------- #
# attention / fusion blocks
# --------------------------------------------------------------------------- #

class MultiheadAttention(nn.Module):
    """GroundingDinoMultiheadAttention (q/k/v separate, additive float mask)."""

    cfg: GroundingDinoConfig
    heads: int

    @nn.compact
    def __call__(self, queries, keys, values, attn_bias=None):
        c = self.cfg
        B, Q, _ = queries.shape
        hd = c.d_model // self.heads

        def split(t):
            return t.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c.d_model, dtype=c.dtype, name="query")(queries))
        k = split(nn.Dense(c.d_model, dtype=c.dtype, name="key")(keys))
        v = split(nn.Dense(c.d_model, dtype=c.dtype, name="value")(values))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if attn_bias is not None:
            logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(c.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, c.d_model)
        return nn.Dense(c.d_model, dtype=c.dtype, name="out_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """GroundingDinoBiMultiHeadAttention: joint image<->text cross-attention
    sharing one [vision, text] logit matrix (incl. the reference's global
    max-subtraction and +-50000 clamps)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_mask=None):
        c = self.cfg
        embed_dim = c.encoder_ffn_dim // 2
        heads = c.encoder_heads // 2
        hd = embed_dim // heads
        B, NV, _ = vision.shape
        NT = text.shape[1]

        def split(t):
            return t.reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)

        vq = split(nn.Dense(embed_dim, dtype=c.dtype, name="vision_proj")(vision)
                   * (hd ** -0.5))
        tk = split(nn.Dense(embed_dim, dtype=c.dtype, name="text_proj")(text))
        vv = split(nn.Dense(embed_dim, dtype=c.dtype,
                            name="values_vision_proj")(vision))
        tv = split(nn.Dense(embed_dim, dtype=c.dtype,
                            name="values_text_proj")(text))

        logits = jnp.einsum("bhvd,bhtd->bhvt", vq, tk,
                            preferred_element_type=jnp.float32)
        logits = logits - jax.lax.stop_gradient(logits.max())
        logits = jnp.clip(logits, -50000.0, 50000.0)

        t_logits = logits.transpose(0, 1, 3, 2)                # [B,h,NT,NV]
        t_logits = t_logits - jax.lax.stop_gradient(
            t_logits.max(axis=-1, keepdims=True))
        t_logits = jnp.clip(t_logits, -50000.0, 50000.0)
        text_attn = jax.nn.softmax(t_logits, axis=-1)

        if text_mask is not None:  # True = PADDING (masked)
            logits = jnp.where(text_mask[:, None, None, :], -jnp.inf, logits)
        vision_attn = jax.nn.softmax(logits, axis=-1)

        v_out = jnp.einsum("bhvt,bhtd->bhvd", vision_attn.astype(c.dtype), tv,
                           preferred_element_type=jnp.float32).astype(c.dtype)
        t_out = jnp.einsum("bhtv,bhvd->bhtd", text_attn.astype(c.dtype), vv,
                           preferred_element_type=jnp.float32).astype(c.dtype)
        v_out = v_out.transpose(0, 2, 1, 3).reshape(B, NV, embed_dim)
        t_out = t_out.transpose(0, 2, 1, 3).reshape(B, NT, embed_dim)
        dv = nn.Dense(c.d_model, dtype=c.dtype, name="out_vision_proj")(v_out)
        dt = nn.Dense(c.d_model, dtype=c.dtype, name="out_text_proj")(t_out)
        return dv, dt


class FusionLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_mask=None):
        c = self.cfg
        vn = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                          name="layer_norm_vision")(vision).astype(c.dtype)
        tn = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                          name="layer_norm_text")(text).astype(c.dtype)
        dv, dt = BiMultiHeadAttention(c, name="attn")(vn, tn, text_mask)
        vision_param = self.param("vision_param",
                                  nn.initializers.constant(1e-4),
                                  (c.d_model,), jnp.float32)
        text_param = self.param("text_param", nn.initializers.constant(1e-4),
                                (c.d_model,), jnp.float32)
        return (vn + vision_param * dv), (tn + text_param * dt)


class TextEnhancerLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, text, self_attn_bias, pos):
        c = self.cfg
        q = text + pos
        attn = MultiheadAttention(c, c.encoder_heads // 2, name="self_attn")(
            q, q, text, self_attn_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm_before")(text + attn).astype(c.dtype)
        h = nn.relu(nn.Dense(c.encoder_ffn_dim // 2, dtype=c.dtype, name="fc1")(x))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                            name="layer_norm_after")(x + h).astype(c.dtype)


class DeformableLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, pos, reference_points, spatial_shapes):
        c = self.cfg
        attn = DeformableAttention(c, c.encoder_heads, c.encoder_n_points,
                                   name="self_attn")(
            vision, vision, pos, reference_points, spatial_shapes)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="self_attn_layer_norm")(vision + attn).astype(c.dtype)
        h = nn.relu(nn.Dense(c.encoder_ffn_dim, dtype=c.dtype, name="fc1")(x))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                            name="final_layer_norm")(x + h).astype(c.dtype)


class EncoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, vision_pos, text, text_pos, text_self_bias,
                 text_pad_mask, reference_points, spatial_shapes):
        c = self.cfg
        vision, text = FusionLayer(c, name="fusion_layer")(
            vision, text, text_pad_mask)
        text = TextEnhancerLayer(c, name="text_enhancer_layer")(
            text, text_self_bias, text_pos)
        vision = DeformableLayer(c, name="deformable_layer")(
            vision, vision_pos, reference_points, spatial_shapes)
        return vision, text


class DecoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, hidden, query_pos, reference_points, spatial_shapes,
                 vision, text, text_bias):
        c = self.cfg
        q = hidden + query_pos
        attn = MultiheadAttention(c, c.decoder_heads, name="self_attn")(
            q, q, hidden)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              name="self_attn_layer_norm")(hidden + attn).astype(c.dtype)

        q = hidden + query_pos
        attn = MultiheadAttention(c, c.decoder_heads, name="encoder_attn_text")(
            q, text, text, text_bias)
        hidden = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32,
            name="encoder_attn_text_layer_norm")(hidden + attn).astype(c.dtype)

        attn = DeformableAttention(c, c.decoder_heads, c.decoder_n_points,
                                   name="encoder_attn")(
            hidden, vision, query_pos, reference_points, spatial_shapes)
        hidden = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                              name="encoder_attn_layer_norm")(hidden + attn).astype(c.dtype)

        h = nn.relu(nn.Dense(c.decoder_ffn_dim, dtype=c.dtype, name="fc1")(hidden))
        h = nn.Dense(c.d_model, dtype=c.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                            name="final_layer_norm")(hidden + h).astype(c.dtype)


class MLPPredictionHead(nn.Module):
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                                 name=f"layer{i}")(x))
        return nn.Dense(self.output_dim, dtype=jnp.float32,
                        name=f"layer{self.num_layers - 1}")(x)


def _logit(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def contrastive_logits(vision_hidden, text_hidden, text_token_mask,
                       max_text_len: int):
    """GroundingDinoContrastiveEmbedding: [B,Q,D]x[B,T,D] -> [B,Q,max_text_len],
    invalid text positions -inf."""
    out = jnp.einsum("bqd,btd->bqt", vision_hidden.astype(jnp.float32),
                     text_hidden.astype(jnp.float32))
    out = jnp.where(text_token_mask[:, None, :], out, -jnp.inf)
    pad = max_text_len - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-jnp.inf)
    return out[..., :max_text_len]


# --------------------------------------------------------------------------- #
# top-level model
# --------------------------------------------------------------------------- #

class GroundingDino(nn.Module):
    """Two-stage GroundingDINO; returns dict(logits, pred_boxes, ...)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,          # [B, H, W, 3] ImageNet-normalized
        input_ids: jnp.ndarray,             # [B, T] int32
        token_type_ids: jnp.ndarray,        # [B, T]
        text_self_attention_masks: jnp.ndarray,  # [B, T, T] bool (True=attend)
        position_ids: jnp.ndarray,          # [B, T]
        text_token_mask: jnp.ndarray,       # [B, T] bool (True=real token)
    ):
        c = self.cfg
        B = pixel_values.shape[0]

        # ---- text tower ----
        text_feat = BertModel(c.bert, name="text_backbone")(
            input_ids, text_self_attention_masks, token_type_ids, position_ids)
        text_feat = nn.Dense(c.d_model, dtype=c.dtype,
                             name="text_projection")(text_feat)
        T = text_feat.shape[1]
        text_pad_mask = ~text_token_mask                       # True = padding
        # additive bias from the pair mask for text self attention
        tb = text_self_attention_masks.astype(jnp.float32)
        text_self_bias = (1.0 - tb)[:, None] * jnp.finfo(jnp.float32).min
        text_pos = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32), c.d_model,
            exchange_xy=False).astype(c.dtype)

        # ---- vision tower ----
        feats = SwinBackbone(c.swin, name="backbone")(pixel_values)
        maps = []
        for lvl in range(c.num_feature_levels):
            if lvl < len(feats):
                src = feats[lvl]
            elif lvl == len(feats):
                src = feats[-1]
            else:
                src = maps[-1]
            x = nn.Conv(c.d_model, (1, 1) if lvl < len(feats) else (3, 3),
                        strides=(1, 1) if lvl < len(feats) else (2, 2),
                        padding="VALID" if lvl < len(feats) else ((1, 1), (1, 1)),
                        dtype=c.dtype, name=f"input_proj_{lvl}")(src)
            x = nn.GroupNorm(num_groups=min(32, c.d_model), dtype=jnp.float32,
                             name=f"input_proj_norm_{lvl}")(x).astype(c.dtype)
            maps.append(x)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (c.num_feature_levels, c.d_model), jnp.float32)
        spatial_shapes = [(m.shape[1], m.shape[2]) for m in maps]
        source_flat = jnp.concatenate(
            [m.reshape(B, -1, c.d_model) for m in maps], axis=1)
        pos_flat = jnp.concatenate([
            (vision_sine_pos(h, w, c.d_model, c.position_embedding_temperature)
             .reshape(1, -1, c.d_model) + level_embed[lvl][None, None])
            for lvl, (h, w) in enumerate(spatial_shapes)], axis=1)
        pos_flat = jnp.broadcast_to(pos_flat, source_flat.shape).astype(c.dtype)

        # encoder reference points (valid_ratios = 1)
        refs = []
        for (h, w) in spatial_shapes:
            ry = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            rx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
            refs.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
        enc_ref = jnp.concatenate(refs, axis=0)                 # [S, 2]
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :],
            (B, enc_ref.shape[0], c.num_feature_levels, 2))

        # ---- encoder ----
        vision = source_flat
        text = text_feat
        for i in range(c.encoder_layers):
            vision, text = EncoderLayer(c, name=f"encoder_layer{i}")(
                vision, pos_flat, text, text_pos, text_self_bias,
                text_pad_mask, enc_ref, spatial_shapes)

        # ---- two-stage query selection ----
        # proposals grid (full-valid): (grid + 0.5) / (w, h), wh = 0.05 * 2^lvl
        props = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            grid = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1)
            wh = jnp.full_like(grid, 0.05 * 2.0 ** lvl)
            props.append(jnp.concatenate([grid, wh], -1).reshape(-1, 4))
        proposals = jnp.concatenate(props, axis=0)[None]        # [1, S, 4]
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1,
                        keepdims=True)
        proposals = jnp.log(proposals / (1 - proposals))
        proposals = jnp.where(valid, proposals, jnp.inf)
        proposals = jnp.broadcast_to(proposals, (B, *proposals.shape[1:]))

        obj_query = jnp.where(valid, vision, 0.0)
        obj_query = nn.Dense(c.d_model, dtype=c.dtype, name="enc_output")(obj_query)
        obj_query = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                                 name="enc_output_norm")(obj_query).astype(c.dtype)

        enc_logits = contrastive_logits(obj_query, text, text_token_mask,
                                        c.max_text_len)
        enc_bbox_head = MLPPredictionHead(c.d_model, 4, 3, c.dtype,
                                          name="encoder_output_bbox_embed")
        delta = enc_bbox_head(obj_query)
        enc_coord_logits = delta + proposals

        topk_scores = jnp.where(jnp.isinf(enc_logits), -jnp.inf,
                                enc_logits).max(-1)             # [B, S]
        _, topk_idx = jax.lax.top_k(topk_scores, c.num_queries)
        topk_coords = jnp.take_along_axis(
            enc_coord_logits, topk_idx[..., None], axis=1)      # [B, Q, 4]
        reference_points = jax.nn.sigmoid(
            jax.lax.stop_gradient(topk_coords))
        init_reference = reference_points

        query_embeds = self.param("query_position_embeddings",
                                  nn.initializers.normal(1.0),
                                  (c.num_queries, c.d_model), jnp.float32)
        target = jnp.broadcast_to(query_embeds[None], (B, c.num_queries,
                                                       c.d_model)).astype(c.dtype)

        # ---- decoder with iterative box refinement ----
        text_cross_bias = jnp.where(text_pad_mask[:, None, None, :],
                                    jnp.finfo(jnp.float32).min, 0.0)
        bbox_head = MLPPredictionHead(c.d_model, 4, 3, c.dtype,
                                      name="decoder_bbox_embed")   # shared
        ref_head = MLPPredictionHead(c.d_model, c.d_model, 2, c.dtype,
                                     name="reference_points_head")
        decoder_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                                    name="decoder_layer_norm")     # shared

        hidden = target
        intermediate = []
        intermediate_refs = []
        for i in range(c.decoder_layers):
            ref_input = reference_points[:, :, None, :]         # valid_ratios=1
            ref_input = jnp.broadcast_to(
                ref_input, (B, c.num_queries, c.num_feature_levels, 4))
            query_sine = get_sine_pos_embed(ref_input[:, :, 0, :],
                                            c.d_model // 2)
            query_pos = ref_head(query_sine).astype(c.dtype)

            hidden = DecoderLayer(c, name=f"decoder_layer{i}")(
                hidden, query_pos, ref_input, spatial_shapes, vision, text,
                text_cross_bias)

            delta = bbox_head(hidden)
            new_ref = jax.nn.sigmoid(delta + _logit(reference_points))
            reference_points = jax.lax.stop_gradient(new_ref)

            normed = decoder_norm(hidden)
            intermediate.append(normed)
            intermediate_refs.append(reference_points)

        # ---- per-layer heads (ForObjectDetection) ----
        outputs_classes = []
        outputs_coords = []
        for lvl in range(c.decoder_layers):
            ref = init_reference if lvl == 0 else intermediate_refs[lvl - 1]
            ref_logit = _logit(ref)
            cls = contrastive_logits(intermediate[lvl], text, text_token_mask,
                                     c.max_text_len)
            delta = bbox_head(intermediate[lvl].astype(c.dtype))
            coords = jax.nn.sigmoid(delta + ref_logit)
            outputs_classes.append(cls)
            outputs_coords.append(coords)

        return dict(
            logits=outputs_classes[-1],
            pred_boxes=outputs_coords[-1],
            all_logits=jnp.stack(outputs_classes, 1),
            all_boxes=jnp.stack(outputs_coords, 1),
            enc_logits=enc_logits,
            enc_coord_logits=enc_coord_logits,
            encoder_text=text,
            encoder_vision=vision,
        )


# --------------------------------------------------------------------------- #
# host-side helpers (tokenized-prompt plumbing)
# --------------------------------------------------------------------------- #

SPECIAL_TOKENS = (101, 102, 1012, 1029)   # [CLS], [SEP], '.', '?'


def generate_special_token_masks(input_ids: np.ndarray):
    """Per-phrase text self-attention mask + position ids
    (modeling_grounding_dino.py:1863-1906), host-side numpy."""
    bsz, n = input_ids.shape
    special = np.isin(input_ids, np.asarray(SPECIAL_TOKENS))
    attn = np.tile(np.eye(n, dtype=bool)[None], (bsz, 1, 1))
    position_ids = np.zeros((bsz, n), np.int64)
    for row in range(bsz):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                attn[row, col, col] = True
                position_ids[row, col] = 0
            else:
                attn[row, prev + 1:col + 1, prev + 1:col + 1] = True
                position_ids[row, prev + 1:col + 1] = np.arange(col - prev)
            prev = col
    return attn, position_ids


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def preprocess_inputs(image_rgb: np.ndarray, input_ids: np.ndarray,
                      image_size: int):
    """Square-resize + normalize the image (static TPU shapes) and build the
    text-side masks. Returns the kwargs dict for GroundingDino.__call__."""
    from PIL import Image

    img = Image.fromarray(image_rgb).resize((image_size, image_size))
    pix = np.asarray(img, np.float32) / 255.0
    pix = (pix - IMAGENET_MEAN) / IMAGENET_STD
    attn, pos_ids = generate_special_token_masks(input_ids)
    return dict(
        pixel_values=jnp.asarray(pix[None]),
        input_ids=jnp.asarray(input_ids, jnp.int32),
        token_type_ids=jnp.zeros_like(jnp.asarray(input_ids, jnp.int32)),
        text_self_attention_masks=jnp.asarray(attn),
        position_ids=jnp.asarray(pos_ids, jnp.int32),
        text_token_mask=jnp.asarray(input_ids != 0),
    )


def simple_tokenize(text: str, max_len: int = 64,
                    vocab_size: int = 30522) -> np.ndarray:
    """Offline fallback tokenizer (hash word pieces into the BERT id space).

    Real runs should use the checkpoint's BertTokenizer vocab (conversion
    stores it); this keeps the graph drivable without vocab files."""
    words = text.lower().replace(".", " . ").split()
    base = min(1100, max(vocab_size - 8, 1))
    span = max(vocab_size - base, 1)
    ids = [101] + [base + (hash(w) % span) if w != "." else 1012
                   for w in words] + [102]
    ids = [min(i, vocab_size - 1) for i in ids][:max_len]
    out = np.zeros((1, len(ids)), np.int64)
    out[0, :len(ids)] = ids
    return out


def preprocess_caption(prompt: str) -> str:
    """HF GroundingDinoProcessor caption contract: lowercase + trailing '.'"""
    prompt = prompt.lower().strip()
    return prompt if prompt.endswith(".") else prompt + "."


def tokenize_prompt(prompt: str, vocab_size: int = 30522) -> np.ndarray:
    """Tokenize a GDINO caption with the checkpoint's real BERT WordPiece
    vocab (assets tokenizers/gdino/vocab.txt, installed by convert.gdino).

    Without a vocab: falls back to hashed ids so seed-init smoke runs stay
    drivable — but HARD-FAILS if real converted gdino params are present,
    because hash ids would silently produce confidently-wrong detections
    (set FOHO_ALLOW_HASH_TOKENIZER=1 to override for debugging)."""
    import os

    from followmyhold_tpu.text.tokenizers import load_gdino_tokenizer

    caption = preprocess_caption(prompt)
    tok = load_gdino_tokenizer()
    if tok is not None:
        return tok.encode(caption, max_len=256)
    from followmyhold_tpu.utils.params import has_params

    if has_params("gdino") and not os.environ.get("FOHO_ALLOW_HASH_TOKENIZER"):
        raise RuntimeError(
            "converted gdino params exist but no BERT vocab was installed "
            "(expected assets tokenizers/gdino/vocab.txt — rerun "
            "followmyhold_tpu.convert.gdino with --vocab, or set "
            "FOHO_ALLOW_HASH_TOKENIZER=1 to knowingly use garbage ids)")
    return simple_tokenize(caption, vocab_size=vocab_size)


def detect_text_prompt(model: GroundingDino, params, image_rgb: np.ndarray,
                       prompt: str, input_ids: Optional[np.ndarray] = None,
                       box_threshold: float = 0.3):
    """LangSAM.predict-style single-image detection: returns (boxes_xyxy in
    image pixels, scores) above threshold (lang_sam.py:18-74 contract)."""
    c = model.cfg
    if input_ids is None:
        input_ids = tokenize_prompt(prompt, vocab_size=c.bert.vocab_size)
    kwargs = preprocess_inputs(image_rgb, input_ids, c.image_size)
    out = model.apply(params, **kwargs)
    logits = np.asarray(out["logits"][0])                # [Q, max_text_len]
    boxes = np.asarray(out["pred_boxes"][0])             # [Q, 4] cxcywh in [0,1]
    scores = 1.0 / (1.0 + np.exp(-logits))
    scores = np.where(np.isfinite(logits), scores, 0.0).max(-1)
    H, W = image_rgb.shape[:2]
    cx, cy, w, h = boxes.T
    xyxy = np.stack([(cx - w / 2) * W, (cy - h / 2) * H,
                     (cx + w / 2) * W, (cy + h / 2) * H], -1)
    keep = scores > box_threshold
    order = np.argsort(-scores[keep])
    return xyxy[keep][order], scores[keep][order]
