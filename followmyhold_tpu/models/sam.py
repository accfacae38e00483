"""SAM-class promptable segmentation (Flax).

Replaces the SAM-2.1 slot in LangSAM (reference third_party/LSAM/lang_sam/
models/sam.py:11-95): ViT image encoder -> prompt encoder (box/point tokens)
-> two-way transformer mask decoder -> upscaled mask logits. Box prompts come
from the open-vocabulary detector (models/gdino.py), matching
LangSAM.predict's boxes->masks contract (lang_sam.py:18-74).
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.vit import ViT, ViTConfig
from followmyhold_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class SamConfig:
    encoder: ViTConfig = ViTConfig(
        img_size=(1024, 1024), patch_size=16, embed_dim=1152, depth=32,
        num_heads=16, use_cls_token=False)
    prompt_dim: int = 256
    decoder_depth: int = 2
    decoder_heads: int = 8
    num_mask_tokens: int = 4
    dtype: jnp.dtype = jnp.bfloat16


SAM_TINY = SamConfig(
    encoder=ViTConfig(img_size=(64, 64), patch_size=16, embed_dim=32, depth=1,
                      num_heads=2, dtype=jnp.float32),
    prompt_dim=16, decoder_depth=1, decoder_heads=2, dtype=jnp.float32)


class TwoWayBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, tokens, image):
        def attn(q, kv, name):
            d = self.dim
            qh = nn.Dense(d, dtype=self.dtype, name=f"{name}_q")(q)
            kh = nn.Dense(d, dtype=self.dtype, name=f"{name}_k")(kv)
            vh = nn.Dense(d, dtype=self.dtype, name=f"{name}_v")(kv)

            def split(t):
                B, N, _ = t.shape
                return t.reshape(B, N, self.heads, -1).transpose(0, 2, 1, 3)

            out = multi_head_attention(split(qh), split(kh), split(vh))
            B, H, N, D = out.shape
            return nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_o")(
                out.transpose(0, 2, 1, 3).reshape(B, N, H * D))

        tokens = nn.LayerNorm(dtype=jnp.float32, name="ln1")(
            tokens + attn(tokens, tokens, "self")).astype(self.dtype)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="ln2")(
            tokens + attn(tokens, image, "t2i")).astype(self.dtype)
        h = nn.Dense(self.dim * 4, dtype=self.dtype, name="mlp1")(tokens)
        tokens = nn.LayerNorm(dtype=jnp.float32, name="ln3")(
            tokens + nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(
                nn.gelu(h))).astype(self.dtype)
        image = nn.LayerNorm(dtype=jnp.float32, name="ln4")(
            image + attn(image, tokens, "i2t")).astype(self.dtype)
        return tokens, image


class Sam(nn.Module):
    cfg: SamConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, box_xyxy: jnp.ndarray):
        """image [B,H,W,3] in [0,1]; box [B,4] normalized to [0,1].
        -> (mask_logits [B,H,W,num_mask_tokens], iou_pred [B,num_mask_tokens])."""
        c = self.cfg
        B, H, W, _ = image.shape
        tokens = ViT(c.encoder, name="encoder")(image)
        gh, gw = H // c.encoder.patch_size, W // c.encoder.patch_size
        img = nn.Dense(c.prompt_dim, dtype=c.dtype, name="neck")(
            tokens.astype(c.dtype))

        # prompt: box corners as 2 tokens with learned corner embeddings
        corner = self.param("corner_embed", nn.initializers.normal(0.02),
                            (2, c.prompt_dim), jnp.float32)
        pe = self.param("pos_proj", nn.initializers.normal(1.0),
                        (2, c.prompt_dim // 2), jnp.float32)
        pts = box_xyxy.reshape(B, 2, 2)
        ang = 2 * jnp.pi * (pts @ pe)
        box_tokens = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        box_tokens = (box_tokens + corner[None]).astype(c.dtype)

        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (1, c.num_mask_tokens, c.prompt_dim), jnp.float32)
        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, 1, c.prompt_dim), jnp.float32)
        t = jnp.concatenate([
            jnp.tile(iou_token.astype(c.dtype), (B, 1, 1)),
            jnp.tile(mask_tokens.astype(c.dtype), (B, 1, 1)),
            box_tokens,
        ], axis=1)

        for i in range(c.decoder_depth):
            t, img = TwoWayBlock(c.prompt_dim, c.decoder_heads, c.dtype,
                                 name=f"block{i}")(t, img)

        iou_pred = nn.Dense(c.num_mask_tokens, dtype=jnp.float32,
                            name="iou_head")(t[:, 0].astype(jnp.float32))
        mtok = t[:, 1:1 + c.num_mask_tokens]
        mtok = nn.Dense(c.prompt_dim, dtype=jnp.float32, name="hyper")(
            mtok.astype(jnp.float32))

        fmap = img.reshape(B, gh, gw, c.prompt_dim).astype(jnp.float32)
        fmap = jax.image.resize(fmap, (B, H, W, c.prompt_dim), "bilinear")
        logits = jnp.einsum("bhwc,bmc->bhwm", fmap, mtok)
        return logits, iou_pred


def segment_box(model: Sam, params, image_rgb: np.ndarray,
                box_xyxy: np.ndarray) -> np.ndarray:
    """Best mask for one box prompt -> bool [H,W]."""
    H, W = image_rgb.shape[:2]
    img = jnp.asarray(image_rgb, jnp.float32)[None] / 255.0
    box = jnp.asarray(box_xyxy, jnp.float32).reshape(1, 4) / jnp.asarray(
        [W, H, W, H], jnp.float32)
    logits, iou = model.apply(params, img, box)
    best = int(np.argmax(np.asarray(iou[0])))
    return np.asarray(logits[0, :, :, best]) > 0
