"""Open-vocabulary (text-prompted) detector, GroundingDINO-class (Flax).

Replaces the GroundingDINO slot in LangSAM (reference third_party/LSAM/
lang_sam/models/gdino.py:10-14: text prompt -> boxes+scores, fed to SAM).
Architecture: ViT image encoder + byte-level text transformer + cross-modal
decoder queries -> (boxes cxcywh-normalized, text-similarity logits). The
tokenizer is byte-level so no external vocab asset is needed.
"""

from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.vit import ViT, ViTConfig
from followmyhold_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class GDinoConfig:
    image_encoder: ViTConfig = ViTConfig(
        img_size=(518, 518), patch_size=14, embed_dim=768, depth=12,
        num_heads=12, use_cls_token=False)
    text_dim: int = 256
    text_depth: int = 4
    text_heads: int = 4
    max_text_len: int = 64
    num_queries: int = 32
    dim: int = 256
    heads: int = 8
    decoder_depth: int = 4
    dtype: jnp.dtype = jnp.bfloat16


GDINO_TINY = GDinoConfig(
    image_encoder=ViTConfig(img_size=(56, 56), patch_size=14, embed_dim=32,
                            depth=1, num_heads=2, dtype=jnp.float32),
    text_dim=16, text_depth=1, text_heads=2, max_text_len=16, num_queries=4,
    dim=16, heads=2, decoder_depth=1, dtype=jnp.float32)


def tokenize_bytes(text: str, max_len: int) -> np.ndarray:
    b = list(text.lower().encode("utf-8"))[: max_len - 1] + [0]
    b = b + [0] * (max_len - len(b))
    return np.asarray(b, np.int32)


class TextEncoder(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = nn.Embed(256, c.text_dim, name="byte_embed")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, c.max_text_len, c.text_dim), jnp.float32)
        x = (x + pos).astype(c.dtype)
        for i in range(c.text_depth):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(x).astype(c.dtype)
            qkv = nn.Dense(3 * c.text_dim, dtype=c.dtype, name=f"qkv{i}")(h)
            q, k, v = jnp.split(qkv, 3, -1)

            def split(t):
                B, N, _ = t.shape
                return t.reshape(B, N, c.text_heads, -1).transpose(0, 2, 1, 3)

            a = multi_head_attention(split(q), split(k), split(v))
            B, H, N, D = a.shape
            x = x + nn.Dense(c.text_dim, dtype=c.dtype, name=f"proj{i}")(
                a.transpose(0, 2, 1, 3).reshape(B, N, H * D))
            h2 = nn.LayerNorm(dtype=jnp.float32, name=f"ln2{i}")(x).astype(c.dtype)
            x = x + nn.Dense(c.text_dim, dtype=c.dtype, name=f"mlp2{i}")(
                nn.gelu(nn.Dense(4 * c.text_dim, dtype=c.dtype,
                                 name=f"mlp1{i}")(h2)))
        return nn.LayerNorm(dtype=jnp.float32, name="ln_out")(x)


class GroundingDetector(nn.Module):
    cfg: GDinoConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, token_ids: jnp.ndarray):
        """image [B,H,W,3] in [0,1], tokens [B,L] -> (boxes [B,Q,4] cxcywh in
        [0,1], logits [B,Q] max text similarity)."""
        c = self.cfg
        B = image.shape[0]
        img_tokens = ViT(c.image_encoder, name="image_encoder")(image)
        img = nn.Dense(c.dim, dtype=c.dtype, name="img_proj")(
            img_tokens.astype(c.dtype))
        txt = TextEncoder(c, name="text_encoder")(token_ids)
        txt = nn.Dense(c.dim, dtype=c.dtype, name="txt_proj")(txt.astype(c.dtype))

        ctx = jnp.concatenate([img, txt], axis=1)
        queries = self.param("queries", nn.initializers.normal(0.02),
                             (1, c.num_queries, c.dim), jnp.float32)
        q = jnp.tile(queries.astype(c.dtype), (B, 1, 1))

        def split(t):
            Bq, N, _ = t.shape
            return t.reshape(Bq, N, c.heads, -1).transpose(0, 2, 1, 3)

        for i in range(c.decoder_depth):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(q).astype(c.dtype)
            qq = nn.Dense(c.dim, dtype=c.dtype, name=f"q{i}")(h)
            kk = nn.Dense(c.dim, dtype=c.dtype, name=f"k{i}")(ctx)
            vv = nn.Dense(c.dim, dtype=c.dtype, name=f"v{i}")(ctx)
            a = multi_head_attention(split(qq), split(kk), split(vv))
            Bq, H, N, D = a.shape
            q = q + nn.Dense(c.dim, dtype=c.dtype, name=f"proj{i}")(
                a.transpose(0, 2, 1, 3).reshape(Bq, N, H * D))
            h2 = nn.LayerNorm(dtype=jnp.float32, name=f"lnf{i}")(q).astype(c.dtype)
            q = q + nn.Dense(c.dim, dtype=c.dtype, name=f"m2{i}")(
                nn.gelu(nn.Dense(4 * c.dim, dtype=c.dtype, name=f"m1{i}")(h2)))

        qf = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(q)
        boxes = jax.nn.sigmoid(nn.Dense(4, dtype=jnp.float32, name="box_head")(qf))
        # text-similarity logits: max over text tokens (grounding-style)
        sim = jnp.einsum("bqd,btd->bqt", qf,
                         txt.astype(jnp.float32))
        logits = sim.max(axis=-1) / np.sqrt(c.dim)
        return boxes, logits


def detect_text_prompt(model: GroundingDetector, params, image_rgb: np.ndarray,
                       text: str, box_threshold: float = 0.3,
                       top_k: int = 4) -> List[dict]:
    """LangSAM.predict-style output: boxes xyxy (pixels) + scores."""
    c = model.cfg
    H, W = image_rgb.shape[:2]
    s = c.image_encoder.img_size[0]
    img = jnp.asarray(image_rgb, jnp.float32)[None] / 255.0
    img = jax.image.resize(img, (1, s, s, 3), "bilinear")
    toks = jnp.asarray(tokenize_bytes(text, c.max_text_len))[None]
    boxes, logits = model.apply(params, img, toks)
    boxes = np.asarray(boxes[0])
    scores = np.asarray(jax.nn.sigmoid(logits[0]))
    order = np.argsort(-scores)[:top_k]
    out = []
    for i in order:
        if scores[i] < box_threshold:
            continue
        cx, cy, w, h = boxes[i]
        out.append({
            "box": np.array([(cx - w / 2) * W, (cy - h / 2) * H,
                             (cx + w / 2) * W, (cy + h / 2) * H], np.float32),
            "score": float(scores[i]),
        })
    return out
