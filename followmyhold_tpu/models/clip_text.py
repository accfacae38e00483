"""CLIP text encoder (Flax) — FLUX's pooled-prompt tower.

Faithful port of HF CLIPTextModel (pre-LN blocks, quick-GELU MLP, causal
mask, pooled output = hidden state at the EOS token) so
openai/clip-vit-large-patch14 (the FLUX.1 text_encoder) converts losslessly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: jnp.dtype = jnp.bfloat16


CLIP_L = ClipTextConfig()
CLIP_TINY_TEST = ClipTextConfig(vocab_size=1000, hidden_size=32, num_layers=2,
                                num_heads=2, intermediate_size=64,
                                max_position_embeddings=24, eos_token_id=999,
                                dtype=jnp.float32)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipLayer(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.cfg
        B, L, D = x.shape
        hd = D // c.num_heads

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm1")(x).astype(c.dtype)

        def split(t):
            return t.reshape(B, L, c.num_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(D, dtype=c.dtype, name="q_proj")(h))
        k = split(nn.Dense(D, dtype=c.dtype, name="k_proj")(h))
        v = split(nn.Dense(D, dtype=c.dtype, name="v_proj")(h))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        logits = logits + causal_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                          preferred_element_type=jnp.float32).astype(c.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + nn.Dense(D, dtype=c.dtype, name="out_proj")(attn)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="layer_norm2")(x).astype(c.dtype)
        h = quick_gelu(nn.Dense(c.intermediate_size, dtype=c.dtype,
                                name="fc1")(h))
        return x + nn.Dense(D, dtype=c.dtype, name="fc2")(h)


class ClipTextModel(nn.Module):
    """-> (last_hidden_state [B,L,D], pooled [B,D])."""

    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        c = self.cfg
        B, L = input_ids.shape
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=jnp.float32,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size), jnp.float32)
        x = (x + pos[None, :L]).astype(c.dtype)

        causal = jnp.triu(jnp.full((L, L), jnp.finfo(jnp.float32).min), k=1)
        causal = causal[None, None]
        for i in range(c.num_layers):
            x = ClipLayer(c, name=f"layer{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="final_layer_norm")(x)

        # pooled = hidden state at the EOS token (argmax of eos matches)
        eos_pos = jnp.argmax((input_ids == c.eos_token_id).astype(jnp.int32),
                             axis=1)
        pooled = x[jnp.arange(B), eos_pos]
        return x, pooled
