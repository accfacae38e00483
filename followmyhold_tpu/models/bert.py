"""BERT text encoder in Flax (GroundingDINO's text backbone).

Faithful port of the HF BertModel encoder semantics (post-LN residual
blocks, separate q/k/v, learned word/position/token-type embeddings) so the
grounding-dino-base checkpoint's text tower converts losslessly. GroundingDINO
calls it with a PER-PAIR self-attention mask ([B, L, L] bool between special
tokens — modeling_grounding_dino.py:1863-1906) and explicit position ids.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.bfloat16


BERT_BASE = BertConfig()
BERT_TINY_TEST = BertConfig(vocab_size=2048, hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=64,
                            max_position_embeddings=64, dtype=jnp.float32)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]):
        c = self.cfg
        B, L, _ = x.shape
        hd = c.hidden_size // c.num_attention_heads

        def split(t):
            return t.reshape(B, L, c.num_attention_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(c.hidden_size, dtype=c.dtype, name="query")(x))
        k = split(nn.Dense(c.hidden_size, dtype=c.dtype, name="key")(x))
        v = split(nn.Dense(c.hidden_size, dtype=c.dtype, name="value")(x))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if attn_bias is not None:
            logits = logits + attn_bias
        probs = jax.nn.softmax(logits, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                         preferred_element_type=jnp.float32).astype(c.dtype)
        return out.transpose(0, 2, 1, 3).reshape(B, L, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: Optional[jnp.ndarray]):
        c = self.cfg
        attn = BertSelfAttention(c, name="self")(x, attn_bias)
        attn = nn.Dense(c.hidden_size, dtype=c.dtype, name="attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="attn_norm")(x + attn).astype(c.dtype)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="output")(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="out_norm")(x + h).astype(c.dtype)
        return x


class BertModel(nn.Module):
    """Returns last_hidden_state [B, L, hidden]."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,                    # [B, L] int32
        attention_mask: Optional[jnp.ndarray] = None,  # [B,L] or [B,L,L] bool/int
        token_type_ids: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        B, L = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                        dtype=jnp.float32)(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings", dtype=jnp.float32)(position_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings", dtype=jnp.float32)(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                         name="embed_norm")(word + pos + typ).astype(c.dtype)

        attn_bias = None
        if attention_mask is not None:
            m = attention_mask.astype(jnp.float32)
            if m.ndim == 2:
                m = m[:, None, None, :]
            elif m.ndim == 3:
                m = m[:, None, :, :]
            attn_bias = (1.0 - m) * jnp.finfo(jnp.float32).min

        for i in range(c.num_hidden_layers):
            x = BertLayer(c, name=f"layer{i}")(x, attn_bias)
        return x
