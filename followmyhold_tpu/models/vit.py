"""Generic ViT encoder (Flax) shared by HaMeR (ViT-H/16, ViTPose-style) and
MoGe's DINOv2-L/14 encoder.

Reference architectures:
- HaMeR backbone: img 256x192, patch 16, width 1280, depth 32, heads 16,
  qkv_bias, no cls token in output feature map
  (hamer/models/backbones/vit.py:12-24).
- DINOv2 ViT-L/14: width 1024, depth 24, heads 16, cls token, LayerScale
  (MoGe/moge/model/dinov2/).

Precision policy: params in fp32, matmuls in bf16 (TPU MXU), layernorm/softmax
accumulate fp32. Attention dispatches to the Pallas flash kernel on TPU
(ops/attention.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: Tuple[int, int] = (256, 192)   # (H, W)
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_cls_token: bool = False
    num_register_tokens: int = 0
    layerscale_init: Optional[float] = None  # DINOv2 uses 1e-5
    # HaMeR's ViTPose-style patch embed pads the conv by 2px (vit.py:168:
    # padding = 4 + 2*(ratio//2-1) with ratio=1) — different windows than an
    # unpadded stride-16 conv.
    patch_padding: int = 0
    # HaMeR keeps a cls SLOT in pos_embed without a cls token and adds it as a
    # bias to every patch token (vit.py:327: x + pos[:, 1:] + pos[:, :1]).
    pos_embed_cls_slot: bool = False
    # "mlp" (fc1/gelu/fc2) or "swiglu" (DINOv2-giant SwiGLUFFNFused:
    # w12 -> chunk -> silu(x1)*x2 -> w3, hidden = round8(dim*4*2/3))
    ffn: str = "mlp"
    # DINOv2's interpolate_pos_encoding quirk: samples with scale
    # (dst + offset) / src instead of dst / src (vision_transformer.py:202-215,
    # interpolate_offset=0.1). 0.0 = plain resize.
    pos_interp_offset: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def grid(self) -> Tuple[int, int]:
        return (self.img_size[0] // self.patch_size, self.img_size[1] // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


HAMER_VIT_H = ViTConfig(patch_padding=2, pos_embed_cls_slot=True)

DINOV2_VIT_L = ViTConfig(
    img_size=(518, 518), patch_size=14, embed_dim=1024, depth=24, num_heads=16,
    use_cls_token=True, layerscale_init=1e-5, pos_interp_offset=0.1,
)


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, N, D = x.shape
        head_dim = D // c.num_heads
        qkv = nn.Dense(3 * D, use_bias=c.qkv_bias, dtype=c.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, c.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        q = jnp.transpose(q, (0, 2, 1, 3))
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        out = multi_head_attention(q, k, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, D)
        return nn.Dense(D, dtype=c.dtype, name="proj")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        if c.ffn == "swiglu":
            hidden = ((int(c.embed_dim * c.mlp_ratio * 2 / 3) + 7) // 8) * 8
            x12 = nn.Dense(2 * hidden, dtype=c.dtype, name="w12")(x)
            x1, x2 = jnp.split(x12, 2, axis=-1)
            return nn.Dense(c.embed_dim, dtype=c.dtype, name="w3")(
                nn.silu(x1) * x2)
        hidden = int(c.embed_dim * c.mlp_ratio)
        x = nn.Dense(hidden, dtype=c.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(c.embed_dim, dtype=c.dtype, name="fc2")(x)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg

        def maybe_scale(y, name):
            if c.layerscale_init is None:
                return y
            gamma = self.param(name, nn.initializers.constant(c.layerscale_init),
                               (c.embed_dim,), jnp.float32)
            return y * gamma.astype(y.dtype)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(c.dtype)
        x = x + maybe_scale(Attention(c, name="attn")(h), "ls1")
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(c.dtype)
        x = x + maybe_scale(Mlp(c, name="mlp")(h), "ls2")
        return x


def _torch_bicubic_weights(src: int, dst: int, scale: float) -> np.ndarray:
    """[dst, src] sampling matrix reproducing torch F.interpolate(mode=
    'bicubic', align_corners=False, antialias=False): out pixel i samples
    input coordinate (i + 0.5) / scale - 0.5 through the Keys cubic kernel
    with a = -0.75 (torch's parameter; jax.image uses -0.5) and edge-clamped
    taps. Grids are static, so this is trace-time numpy."""
    a = -0.75
    W = np.zeros((dst, src), np.float64)
    for i in range(dst):
        x = (i + 0.5) / scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        for k in range(-1, 3):
            tt = abs(t - k)
            if tt <= 1.0:
                w = (a + 2) * tt ** 3 - (a + 3) * tt ** 2 + 1
            elif tt < 2.0:
                w = a * tt ** 3 - 5 * a * tt ** 2 + 8 * a * tt - 4 * a
            else:
                continue
            W[i, min(max(x0 + k, 0), src - 1)] += w
    return W.astype(np.float32)


def interpolate_pos_embed(pos: jnp.ndarray, src_grid, dst_grid,
                          offset: float = 0.0) -> jnp.ndarray:
    """Bicubic pos-embed resize matching torch semantics exactly (reference
    get_abs_pos, vit.py:26-57: F.interpolate(size=dst); DINOv2
    interpolate_pos_encoding: F.interpolate(scale_factor=(dst + offset) /
    src) with interpolate_offset=0.1 — vision_transformer.py:202-215)."""
    if tuple(src_grid) == tuple(dst_grid):
        return pos
    c = pos.shape[-1]
    grid = pos.reshape(src_grid[0], src_grid[1], c)
    wy = jnp.asarray(_torch_bicubic_weights(
        src_grid[0], dst_grid[0], (dst_grid[0] + offset) / src_grid[0]))
    wx = jnp.asarray(_torch_bicubic_weights(
        src_grid[1], dst_grid[1], (dst_grid[1] + offset) / src_grid[1]))
    out = jnp.einsum("ij,jkc->ikc", wy, grid)
    out = jnp.einsum("kj,ijc->ikc", wx, out)
    return out.reshape(1, dst_grid[0] * dst_grid[1], c)


class ViT(nn.Module):
    """Returns final tokens [B, N, C] (patch tokens only; cls/regs stripped)
    or, when out_layers is given, a list of intermediate token maps."""

    cfg: ViTConfig

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # [B, H, W, 3] float
        out_layers: Optional[Sequence[int]] = None,
        keep_prefix: bool = False,
    ):
        c = self.cfg
        B, H, W, _ = images.shape
        pp = c.patch_padding
        gh = (H + 2 * pp - c.patch_size) // c.patch_size + 1
        gw = (W + 2 * pp - c.patch_size) // c.patch_size + 1

        x = nn.Conv(
            c.embed_dim, kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding=((pp, pp), (pp, pp)) if pp else "VALID",
            dtype=c.dtype, name="patch_embed",
        )(images.astype(c.dtype))
        x = x.reshape(B, gh * gw, c.embed_dim)

        n_prefix = (1 if c.use_cls_token else 0) + c.num_register_tokens
        has_cls_slot = c.use_cls_token or c.pos_embed_cls_slot
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, c.num_patches + (1 if has_cls_slot else 0), c.embed_dim),
            jnp.float32,
        )
        if has_cls_slot:
            cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        else:
            cls_pos, patch_pos = None, pos
        patch_pos = interpolate_pos_embed(patch_pos, c.grid, (gh, gw),
                                          c.pos_interp_offset)
        if c.pos_embed_cls_slot and not c.use_cls_token:
            # HaMeR adds the cls-slot embedding as a bias to every token
            patch_pos = patch_pos + cls_pos

        x = x + patch_pos.astype(c.dtype)
        if c.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, c.embed_dim),
                             jnp.float32)
            cls = (cls + cls_pos).astype(c.dtype)
            tokens = [jnp.tile(cls, (B, 1, 1))]
            if c.num_register_tokens:
                regs = self.param("register_tokens", nn.initializers.zeros,
                                  (1, c.num_register_tokens, c.embed_dim), jnp.float32)
                tokens.append(jnp.tile(regs.astype(c.dtype), (B, 1, 1)))
            tokens.append(x)
            x = jnp.concatenate(tokens, axis=1)

        # scan over depth: XLA compiles ONE block (params carry a leading
        # depth axis; converters stack per-layer torch weights). Compile time
        # is ~60 s/block over a remote-compile tunnel, so unrolled 32-deep
        # stacks are not viable.
        need_ys = out_layers is not None

        class ScanBlock(nn.Module):
            cfg: ViTConfig
            collect: bool

            @nn.compact
            def __call__(self, carry, _):
                y = Block(self.cfg, name="block")(carry)
                return y, (y if self.collect else None)

        scan = nn.scan(
            ScanBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.depth,
        )
        x, layer_outs = scan(c, need_ys, name="blocks")(x, None)  # ys [D,B,N,C]

        norm = nn.LayerNorm(dtype=jnp.float32, name="norm")
        x = norm(x).astype(c.dtype)

        if out_layers is not None:
            # DINOv2 get_intermediate_layers applies the FINAL norm to every
            # collected layer (vision_transformer.py norm=True default; MoGe
            # relies on it) — raw block outputs would be numerically wrong
            collected = [norm(layer_outs[i]).astype(c.dtype)[:, n_prefix:]
                         for i in out_layers]
            return collected, x[:, n_prefix:], (x[:, 0] if c.use_cls_token else None)
        if keep_prefix:
            # HF-style last_hidden_state: cls (+ registers) kept — the
            # Hunyuan DINO conditioner feeds cls+patches to the DiT
            return x
        return x[:, n_prefix:]


class ViTFeatureMap(nn.Module):
    """HaMeR-style backbone wrapper: [B,H,W,3] -> [B, gh, gw, C] feature map."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, H, W, _ = images.shape
        tokens = ViT(c, name="vit")(images)
        pp = c.patch_padding
        gh = (H + 2 * pp - c.patch_size) // c.patch_size + 1
        gw = (W + 2 * pp - c.patch_size) // c.patch_size + 1
        return tokens.reshape(B, gh, gw, c.embed_dim)
