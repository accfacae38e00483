"""FLUX-Kontext-class latent inpainting model (Flax).

Replaces the reference's FLUX.1-Kontext 4-bit hand-removal inpainting
(preprocess/inpaint.py:33-79: "Remove hands but keep the {object}", 28 steps,
guidance 2.5, seed 2). Architecture: a small conv VAE (stride-8 latent space)
+ the same double/single-stream rectified-flow DiT used for shape generation
(models/hunyuan.HunyuanDiT), conditioned on the masked-image latents + mask
(channel-concat, inpainting-standard) and a byte-level text prompt embedding.

The classical Telea backend in preprocess/inpaint.py remains the fallback
until converted weights exist; this module supplies the learned path and is
architecture-complete for conversion.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.diffusion.scheduler import make_schedule, step
from followmyhold_tpu.models.hunyuan import DiTConfig, HunyuanDiT


@dataclasses.dataclass(frozen=True)
class ByteTextConfig:
    text_dim: int = 256
    text_depth: int = 4
    text_heads: int = 4
    max_text_len: int = 64
    dtype: jnp.dtype = jnp.float32


def tokenize_bytes(text: str, max_len: int) -> np.ndarray:
    ids = np.zeros(max_len, np.int32)
    raw = text.encode("utf-8")[: max_len]
    ids[: len(raw)] = np.frombuffer(raw, np.uint8).astype(np.int32) + 1
    return ids


class ByteTextEncoder(nn.Module):
    """Small byte-level transformer prompt encoder (stand-in conditioning)."""

    cfg: ByteTextConfig

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = nn.Embed(257, c.text_dim, name="embed")(token_ids)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, c.max_text_len, c.text_dim), jnp.float32)
        x = (x + pos[:, : x.shape[1]]).astype(c.dtype)
        for i in range(c.text_depth):
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln{i}")(x).astype(c.dtype)
            qkv = nn.Dense(3 * c.text_dim, dtype=c.dtype, name=f"qkv{i}")(h)
            q, k, v = jnp.split(qkv, 3, -1)

            def split(t):
                B, N, D = t.shape
                hd = D // c.text_heads
                return t.reshape(B, N, c.text_heads, hd).transpose(0, 2, 1, 3)

            from followmyhold_tpu.ops.attention import multi_head_attention

            a = multi_head_attention(split(q), split(k), split(v))
            B, H, N, hd = a.shape
            a = a.transpose(0, 2, 1, 3).reshape(B, N, H * hd)
            x = x + nn.Dense(c.text_dim, dtype=c.dtype, name=f"proj{i}")(a)
            h = nn.LayerNorm(dtype=jnp.float32, name=f"ln2_{i}")(x).astype(c.dtype)
            h = nn.gelu(nn.Dense(4 * c.text_dim, dtype=c.dtype, name=f"fc1{i}")(h))
            x = x + nn.Dense(c.text_dim, dtype=c.dtype, name=f"fc2{i}")(h)
        return x


@dataclasses.dataclass(frozen=True)
class FluxInpaintConfig:
    latent_channels: int = 16
    vae_width: int = 128
    dit: DiTConfig = DiTConfig(in_channels=16 + 16 + 1, context_dim=256,
                               hidden=1024, heads=16, depth_double=4,
                               depth_single=8)
    text: ByteTextConfig = ByteTextConfig(text_dim=256, text_depth=4,
                                          text_heads=4, max_text_len=64)
    num_steps: int = 28
    guidance: float = 2.5
    dtype: jnp.dtype = jnp.bfloat16


FLUX_TINY = FluxInpaintConfig(
    latent_channels=4, vae_width=8,
    dit=DiTConfig(in_channels=4 + 4 + 1, context_dim=16, hidden=32, heads=2,
                  depth_double=1, depth_single=1, time_dim=16,
                  dtype=jnp.float32),
    text=ByteTextConfig(text_dim=16, text_depth=1, text_heads=2,
                        max_text_len=16),
    num_steps=4, dtype=jnp.float32)


class ConvVAE(nn.Module):
    """Stride-8 conv encoder/decoder pair (deterministic AE for inpainting)."""

    cfg: FluxInpaintConfig

    def setup(self):
        c = self.cfg
        self.enc = [nn.Conv(c.vae_width * (2 ** i), (3, 3), strides=(2, 2),
                            dtype=c.dtype, name=f"enc{i}") for i in range(3)]
        self.enc_out = nn.Conv(c.latent_channels, (1, 1), dtype=jnp.float32,
                               name="enc_out")
        self.dec = [nn.ConvTranspose(c.vae_width * (2 ** i), (4, 4),
                                     strides=(2, 2), dtype=c.dtype,
                                     name=f"dec{i}")
                    for i in reversed(range(3))]
        self.dec_out = nn.Conv(3, (1, 1), dtype=jnp.float32, name="dec_out")

    def __call__(self, image):  # touches both for init
        return self.decode(self.encode(image))

    def encode(self, image: jnp.ndarray) -> jnp.ndarray:
        x = image.astype(self.cfg.dtype)
        for layer in self.enc:
            x = nn.silu(layer(x))
        return self.enc_out(x.astype(jnp.float32))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        x = z.astype(self.cfg.dtype)
        for layer in self.dec:
            x = nn.silu(layer(x))
        return self.dec_out(x.astype(jnp.float32))


class FluxInpainter(nn.Module):
    cfg: FluxInpaintConfig

    def setup(self):
        self.vae = ConvVAE(self.cfg)
        self.dit = HunyuanDiT(self.cfg.dit)
        self.text_encoder = ByteTextEncoder(self.cfg.text)
        self.text_proj = nn.Dense(self.cfg.dit.context_dim, name="text_proj")

    def __call__(self, image, mask, token_ids, t, noisy_latents):
        """One denoising step's velocity prediction (used for init/training).
        Also touches the VAE decoder so a single init creates all params."""
        cond = self.encode_condition(image, mask, token_ids)
        v = self.velocity(noisy_latents, t, cond)
        _ = self.vae.decode(noisy_latents)
        return v

    def encode_condition(self, image, mask, token_ids):
        masked = image * (1.0 - mask[..., None])
        z_img = self.vae.encode(masked)
        B, h, w, _ = z_img.shape
        m = jax.image.resize(mask[..., None], (B, h, w, 1), "nearest")
        txt = self.text_proj(self.text_encoder(token_ids))
        return {"z_img": z_img, "mask": m, "text": txt}

    def velocity(self, noisy, t, cond):
        B, h, w, _ = noisy.shape
        x = jnp.concatenate([noisy, cond["z_img"], cond["mask"]], axis=-1)
        tokens = x.reshape(B, h * w, -1)
        eps = self.dit(tokens, t, cond["text"])
        return eps[..., : self.cfg.latent_channels].reshape(
            B, h, w, self.cfg.latent_channels)

    def decode(self, z):
        return self.vae.decode(z)


def inpaint(
    model: FluxInpainter,
    params,
    image_rgb01: jnp.ndarray,   # [B,H,W,3] in [0,1]
    mask: jnp.ndarray,          # [B,H,W] 1 = remove
    prompt: str,
    key: jax.Array,
    num_steps: int | None = None,
    guidance: float | None = None,
) -> jnp.ndarray:
    """Rectified-flow inpainting loop (reference contract: 28 steps,
    guidance 2.5). Returns [B,H,W,3] in [0,1]."""
    c = model.cfg
    num_steps = num_steps or c.num_steps
    guidance = guidance if guidance is not None else c.guidance
    B, H, W, _ = image_rgb01.shape

    toks = jnp.asarray(tokenize_bytes(prompt, c.text.max_text_len))[None]
    toks = jnp.tile(toks, (B, 1))
    uncond_toks = jnp.zeros_like(toks)

    cond = model.apply(params, image_rgb01, mask, toks,
                       method=FluxInpainter.encode_condition)
    uncond = model.apply(params, image_rgb01, mask, uncond_toks,
                         method=FluxInpainter.encode_condition)

    h, w = H // 8, W // 8
    sched = make_schedule(sigmas=np.linspace(0, 1, num_steps))
    z = jax.random.normal(key, (B, h, w, c.latent_channels))

    for i in range(num_steps):
        t = jnp.full((B,), sched.timesteps[i] / sched.num_train_timesteps)
        eps_c = model.apply(params, z, t, cond, method=FluxInpainter.velocity)
        eps_u = model.apply(params, z, t, uncond, method=FluxInpainter.velocity)
        eps = eps_u + guidance * (eps_c - eps_u)
        z, _ = step(sched, i, eps, z)

    out = model.apply(params, z, method=FluxInpainter.decode)
    out = jnp.clip(out, 0.0, 1.0)
    # keep unmasked pixels from the source (standard inpainting composite)
    return image_rgb01 * (1 - mask[..., None]) + out * mask[..., None]
