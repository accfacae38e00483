"""T5 encoder (Flax) — FLUX's sequence-prompt tower (text_encoder_2).

Faithful port of HF T5EncoderModel (RMS norms, bias-free projections,
bucketed relative position bias on layer 0, gated-GELU feed-forward) so the
google/t5-v1_1-xxl checkpoint converts losslessly.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16


T5_XXL = T5Config()
T5_TINY_TEST = T5Config(vocab_size=500, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4, dtype=jnp.float32)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


def relative_position_bucket(rel, num_buckets=32, max_distance=128):
    """T5's bidirectional bucketing (modeling_t5._relative_position_bucket)."""
    num_buckets //= 2
    ret = (rel > 0).astype(np.int64) * num_buckets
    n = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_bias: bool

    @nn.compact
    def __call__(self, x, pos_bias):
        c = self.cfg
        B, L, _ = x.shape
        inner = c.num_heads * c.d_kv

        def split(t):
            return t.reshape(B, L, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        q = split(nn.Dense(inner, use_bias=False, dtype=c.dtype, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, dtype=c.dtype, name="k")(x))
        v = split(nn.Dense(inner, use_bias=False, dtype=c.dtype, name="v")(x))
        if self.has_bias:
            buckets = relative_position_bucket(
                np.arange(L)[None, :] - np.arange(L)[:, None],
                c.relative_attention_num_buckets,
                c.relative_attention_max_distance)
            table = self.param("relative_attention_bias",
                               nn.initializers.normal(1.0),
                               (c.relative_attention_num_buckets, c.num_heads),
                               jnp.float32)
            pos_bias = table[jnp.asarray(buckets)].transpose(2, 0, 1)[None]

        # T5 does NOT scale by sqrt(d_kv)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + pos_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(c.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner)
        return nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                        name="o")(out), pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_bias: bool

    @nn.compact
    def __call__(self, x, pos_bias):
        c = self.cfg
        h = RMSNorm(c.layer_norm_eps, name="ln1")(x)
        attn, pos_bias = T5Attention(c, self.has_bias, name="attn")(h, pos_bias)
        x = x + attn
        h = RMSNorm(c.layer_norm_eps, name="ln2")(x)
        g = nn.gelu(nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype,
                             name="wi_0")(h), approximate=True)
        u = nn.Dense(c.d_ff, use_bias=False, dtype=c.dtype, name="wi_1")(h)
        x = x + nn.Dense(c.d_model, use_bias=False, dtype=c.dtype,
                         name="wo")(g * u)
        return x, pos_bias


class T5Encoder(nn.Module):
    """-> last_hidden_state [B, L, d_model]."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.d_model, dtype=jnp.float32,
                     name="shared")(input_ids).astype(c.dtype)
        pos_bias = jnp.zeros((1, c.num_heads, 1, 1), jnp.float32)
        for i in range(c.num_layers):
            x, pos_bias = T5Block(c, has_bias=(i == 0),
                                  name=f"block{i}")(x, pos_bias)
        return RMSNorm(c.layer_norm_eps, name="final_norm")(x)
