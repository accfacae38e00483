"""Swin Transformer backbone in Flax (GroundingDINO's vision encoder).

Faithful port of the HF Swin backbone semantics (transformers
models/swin/modeling_swin.py) so the IDEA-Research/grounding-dino-base
checkpoint (Swin-B, out stages 2-4) converts losslessly:

- patch embed (conv p4) + LayerNorm, no absolute position embeddings,
- stages of window attention with learned relative position bias, cyclic
  shift on odd blocks (always_partition=True backbone behavior: window size
  never shrinks for small inputs),
- patch merging between stages (LayerNorm over the 4-gather, then a
  bias-free reduction to 2*dim),
- per-out-stage LayerNorms (hidden_states_norms), outputs taken BEFORE the
  stage's downsample.

Reference usage: third_party/LSAM/lang_sam/models/gdino.py:10-14 (the
pipeline's text-prompted detector front end).

Layout is NHWC; attention runs through ops/attention (Pallas on TPU when
shapes allow, XLA otherwise).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 128                      # swin-base
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    # which stage outputs to emit (1-indexed stages, pre-downsample)
    out_stages: Tuple[int, ...] = (2, 3, 4)
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2 ** i for i in range(len(self.depths)))

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(self.stage_dims[s - 1] for s in self.out_stages)


SWIN_B = SwinConfig()
SWIN_TINY_TEST = SwinConfig(embed_dim=16, depths=(1, 1, 1), num_heads=(1, 2, 4),
                            window_size=4, out_stages=(2, 3), dtype=jnp.float32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(windows: jnp.ndarray, w: int, H: int, W: int) -> jnp.ndarray:
    C = windows.shape[-1]
    x = windows.reshape(-1, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, H, W, C)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)                        # [w*w, w*w]


def _shift_attn_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """Additive mask [num_windows, w*w, w*w] for shifted windows (-100/0)."""
    img = np.zeros((1, hp, wp, 1), np.float32)
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = np.asarray(_window_partition(jnp.asarray(img), w))[:, :, 0]  # [nw, w*w]
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class SwinSelfAttention(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask) -> jnp.ndarray:
        c = self.cfg
        w = c.window_size
        nB, N, C = x.shape            # nB = B * num_windows, N = w*w
        hd = self.dim // self.heads

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * w - 1) * (2 * w - 1), self.heads), jnp.float32)
        rel_idx = jnp.asarray(_relative_position_index(w).reshape(-1))
        rel_bias = bias_table[rel_idx].reshape(N, N, self.heads)
        rel_bias = rel_bias.transpose(2, 0, 1)            # [h, N, N]

        q = nn.Dense(self.dim, use_bias=c.qkv_bias, dtype=c.dtype, name="query")(x)
        k = nn.Dense(self.dim, use_bias=c.qkv_bias, dtype=c.dtype, name="key")(x)
        v = nn.Dense(self.dim, use_bias=c.qkv_bias, dtype=c.dtype, name="value")(x)

        def split(t):
            return t.reshape(nB, N, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        logits = logits + rel_bias[None]
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(nB // nw, nw, self.heads, N, N)
            logits = logits + attn_mask[None, :, None]
            logits = logits.reshape(nB, self.heads, N, N)
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(c.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(nB, N, self.dim)
        return nn.Dense(self.dim, dtype=c.dtype, name="proj")(out)


class SwinLayer(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    shift: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, H, W, C] (already spatial)."""
        c = self.cfg
        w = c.window_size
        B, H, W, C = x.shape
        shortcut = x
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layernorm_before")(x).astype(c.dtype)

        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
            attn_mask = jnp.asarray(_shift_attn_mask(Hp, Wp, w, self.shift))
        else:
            attn_mask = None

        windows = _window_partition(h, w)
        attn = SwinSelfAttention(c, self.dim, self.heads, name="attn")(
            windows, attn_mask)
        h = _window_reverse(attn, w, Hp, Wp)

        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        h = h[:, :H, :W]
        x = shortcut + h

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layernorm_after")(x).astype(c.dtype)
        h = nn.Dense(int(c.mlp_ratio * self.dim), dtype=c.dtype,
                     name="intermediate")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=c.dtype, name="output")(h)
        return x + h


class SwinPatchMerging(nn.Module):
    cfg: SwinConfig
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="norm")(x).astype(c.dtype)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=c.dtype,
                        name="reduction")(x)


class SwinBackbone(nn.Module):
    """[B, H, W, 3] -> list of NHWC feature maps for cfg.out_stages."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        c = self.cfg
        B, H, W, _ = pixel_values.shape
        p = c.patch_size
        x = jnp.pad(pixel_values,
                    ((0, 0), (0, (p - H % p) % p), (0, (p - W % p) % p), (0, 0)))
        x = nn.Conv(c.embed_dim, (p, p), strides=(p, p), dtype=c.dtype,
                    name="patch_embed")(x.astype(c.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         name="embed_norm")(x).astype(c.dtype)

        outs = []
        for s, (depth, heads) in enumerate(zip(c.depths, c.num_heads)):
            dim = c.stage_dims[s]
            for b in range(depth):
                shift = 0 if b % 2 == 0 else c.window_size // 2
                x = SwinLayer(c, dim, heads, shift,
                              name=f"stage{s}_block{b}")(x)
            if (s + 1) in c.out_stages:
                y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name=f"out_norm{s + 1}")(x).astype(c.dtype)
                outs.append(y)
            if s < len(c.depths) - 1:
                x = SwinPatchMerging(c, dim, name=f"downsample{s}")(x)
        return outs
