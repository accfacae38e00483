"""FLUX.1 (Kontext) rectified-flow image editor in Flax.

Replaces the reference's hand-removal inpainting
(src/foho/preprocess/inpaint.py:33-79: FluxKontextPipeline, prompt
"Remove hands but keep the {object}", guidance 2.5, 28 steps, seed 2) with a
checkpoint-compatible port of the diffusers graphs:

- FluxTransformer2DModel: 19 double + 38 single stream blocks at hidden 3072,
  3-axis RoPE (16/56/56), adaLN-zero modulation from (timestep, guidance,
  pooled CLIP), T5 sequence conditioning. Kontext conditions on the source
  image by CONCATENATING its packed latents to the image stream with ids
  whose first RoPE axis is 1.
- AutoencoderKL (16-ch latents, 2x2 packing -> 64-dim tokens).
- Text towers live in models/clip_text.py (pooled) and models/t5.py.

Converters: convert/flux.py (transformer + VAE), convert/flux_text.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# transformer
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64              # 16 latent ch x 2x2 packing
    hidden: int = 3072
    heads: int = 24
    num_layers: int = 19
    num_single_layers: int = 38
    joint_dim: int = 4096              # T5 hidden
    pooled_dim: int = 768              # CLIP hidden
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    guidance_embeds: bool = True
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16


FLUX_DEV = FluxConfig()
FLUX_TINY_TEST = FluxConfig(in_channels=16, hidden=48, heads=3, num_layers=1,
                            num_single_layers=2, joint_dim=32, pooled_dim=24,
                            axes_dims_rope=(4, 6, 6), dtype=jnp.float32)


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0): cat(cos, sin)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def rope_freqs(ids: jnp.ndarray, axes_dims: Sequence[int],
               theta: float = 10000.0):
    """ids [..., n_axes] -> (cos, sin) each [..., head_dim//2] for the pairwise
    rotation (diffusers FluxPosEmbed)."""
    outs_cos, outs_sin = [], []
    for i, d in enumerate(axes_dims):
        omega = 1.0 / theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
        ang = ids[..., i:i + 1].astype(jnp.float32) * omega[None]
        outs_cos.append(jnp.cos(ang))
        outs_sin.append(jnp.sin(ang))
    return jnp.concatenate(outs_cos, -1), jnp.concatenate(outs_sin, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [B, H, N, D]; rotate (even, odd) pairs."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[None, None]
    s = sin[None, None]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


class MlpEmbed(nn.Module):
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="linear_1")(x)
        return nn.Dense(self.hidden, dtype=self.dtype,
                        name="linear_2")(nn.silu(x))


class QKNorm(nn.Module):
    """Per-head RMSNorm with learned scale (diffusers qk_norm='rms_norm')."""

    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + 1e-6)
                * scale).astype(x.dtype)


def _split(x, heads):
    B, N, D = x.shape
    return x.reshape(B, N, heads, D // heads).transpose(0, 2, 1, 3)


def _merge(x):
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def _attention(q, k, v):
    from followmyhold_tpu.ops.attention import multi_head_attention

    return multi_head_attention(q, k, v)


class FluxDoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin):
        c = self.cfg
        h = c.hidden
        hd = h // c.heads
        img_mod = nn.Dense(6 * h, dtype=c.dtype, name="norm1_linear")(
            nn.silu(vec))[:, None]
        txt_mod = nn.Dense(6 * h, dtype=c.dtype,
                           name="norm1_context_linear")(nn.silu(vec))[:, None]
        im = jnp.split(img_mod, 6, -1)
        tm = jnp.split(txt_mod, 6, -1)

        def norm(x):
            return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                dtype=jnp.float32)(x).astype(c.dtype)

        xin = norm(img) * (1 + im[1]) + im[0]
        tin = norm(txt) * (1 + tm[1]) + tm[0]

        q = QKNorm(hd, name="norm_q")(_split(
            nn.Dense(h, dtype=c.dtype, name="to_q")(xin), c.heads))
        k = QKNorm(hd, name="norm_k")(_split(
            nn.Dense(h, dtype=c.dtype, name="to_k")(xin), c.heads))
        v = _split(nn.Dense(h, dtype=c.dtype, name="to_v")(xin), c.heads)
        tq = QKNorm(hd, name="norm_added_q")(_split(
            nn.Dense(h, dtype=c.dtype, name="add_q_proj")(tin), c.heads))
        tk = QKNorm(hd, name="norm_added_k")(_split(
            nn.Dense(h, dtype=c.dtype, name="add_k_proj")(tin), c.heads))
        tv = _split(nn.Dense(h, dtype=c.dtype, name="add_v_proj")(tin), c.heads)

        q = jnp.concatenate([tq, q], axis=2)
        k = jnp.concatenate([tk, k], axis=2)
        v = jnp.concatenate([tv, v], axis=2)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _merge(_attention(q, k, v))
        t_attn, x_attn = attn[:, :txt.shape[1]], attn[:, txt.shape[1]:]

        img = img + im[2] * nn.Dense(h, dtype=c.dtype, name="to_out")(x_attn)
        txt = txt + tm[2] * nn.Dense(h, dtype=c.dtype, name="to_add_out")(t_attn)

        xin = norm(img) * (1 + im[4]) + im[3]
        ff = nn.Dense(int(h * c.mlp_ratio), dtype=c.dtype, name="ff_in")(xin)
        ff = nn.gelu(ff, approximate=True)
        img = img + im[5] * nn.Dense(h, dtype=c.dtype, name="ff_out")(ff)

        tin = norm(txt) * (1 + tm[4]) + tm[3]
        ff = nn.Dense(int(h * c.mlp_ratio), dtype=c.dtype,
                      name="ff_context_in")(tin)
        ff = nn.gelu(ff, approximate=True)
        txt = txt + tm[5] * nn.Dense(h, dtype=c.dtype,
                                     name="ff_context_out")(ff)
        return img, txt


class FluxSingleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, vec, cos, sin):
        c = self.cfg
        h = c.hidden
        hd = h // c.heads
        mod = nn.Dense(3 * h, dtype=c.dtype, name="norm_linear")(
            nn.silu(vec))[:, None]
        shift, scale, gate = jnp.split(mod, 3, -1)
        xin = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                           dtype=jnp.float32)(x).astype(c.dtype)
        xin = xin * (1 + scale) + shift

        q = QKNorm(hd, name="norm_q")(_split(
            nn.Dense(h, dtype=c.dtype, name="to_q")(xin), c.heads))
        k = QKNorm(hd, name="norm_k")(_split(
            nn.Dense(h, dtype=c.dtype, name="to_k")(xin), c.heads))
        v = _split(nn.Dense(h, dtype=c.dtype, name="to_v")(xin), c.heads)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = _merge(_attention(q, k, v))

        mlp = nn.gelu(nn.Dense(int(h * c.mlp_ratio), dtype=c.dtype,
                               name="proj_mlp")(xin), approximate=True)
        out = nn.Dense(h, dtype=c.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=-1))
        return x + gate * out


class FluxTransformer(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,       # [B, N_img(+N_ctx), in_channels]
        encoder_hidden_states: jnp.ndarray,  # [B, T, joint_dim]
        pooled: jnp.ndarray,              # [B, pooled_dim]
        timestep: jnp.ndarray,            # [B] in [0, 1]
        img_ids: jnp.ndarray,             # [N_img(+ctx), 3]
        txt_ids: jnp.ndarray,             # [T, 3]
        guidance: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        img = nn.Dense(c.hidden, dtype=c.dtype, name="x_embedder")(
            hidden_states.astype(c.dtype))
        txt = nn.Dense(c.hidden, dtype=c.dtype, name="context_embedder")(
            encoder_hidden_states.astype(c.dtype))

        vec = MlpEmbed(c.hidden, c.dtype, name="timestep_embedder")(
            sinusoidal_embedding(timestep * 1000.0, 256).astype(c.dtype))
        if c.guidance_embeds:
            g = jnp.zeros_like(timestep) if guidance is None else guidance
            vec = vec + MlpEmbed(c.hidden, c.dtype, name="guidance_embedder")(
                sinusoidal_embedding(g * 1000.0, 256).astype(c.dtype))
        vec = vec + MlpEmbed(c.hidden, c.dtype, name="text_embedder")(
            pooled.astype(c.dtype))

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_freqs(ids, c.axes_dims_rope)

        for i in range(c.num_layers):
            img, txt = FluxDoubleBlock(c, name=f"double{i}")(
                img, txt, vec, cos, sin)
        x = jnp.concatenate([txt, img], axis=1)
        for i in range(c.num_single_layers):
            x = FluxSingleBlock(c, name=f"single{i}")(x, vec, cos, sin)
        x = x[:, txt.shape[1]:]

        mod = nn.Dense(2 * c.hidden, dtype=c.dtype, name="norm_out_linear")(
            nn.silu(vec))[:, None]
        scale, shift = jnp.split(mod, 2, -1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=jnp.float32)(x).astype(c.dtype)
        x = x * (1 + scale) + shift
        return nn.Dense(c.in_channels, dtype=jnp.float32, name="proj_out")(x)


# --------------------------------------------------------------------------- #
# VAE (AutoencoderKL, FLUX variant: 16 latent channels)
# --------------------------------------------------------------------------- #

@dataclasses.dataclass(frozen=True)
class FluxVaeConfig:
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    dtype: jnp.dtype = jnp.bfloat16


FLUX_VAE = FluxVaeConfig()
FLUX_VAE_TINY = FluxVaeConfig(latent_channels=4,
                              block_out_channels=(8, 16), layers_per_block=1,
                              dtype=jnp.float32)


class VaeResnet(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="norm1")(x)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.silu(h).astype(self.dtype))
        h = nn.GroupNorm(num_groups=min(32, self.ch), epsilon=1e-6,
                         dtype=jnp.float32, name="norm2")(h)
        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.silu(h).astype(self.dtype))
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=min(32, C), epsilon=1e-6,
                         dtype=jnp.float32, name="group_norm")(x)
        h = h.reshape(B, H * W, C).astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bqd,bkd->bqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(C)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        o = jnp.einsum("bqk,bkd->bqd", probs, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        o = nn.Dense(C, dtype=self.dtype, name="to_out")(o)
        return x + o.reshape(B, H, W, C)


class FluxVae(nn.Module):
    cfg: FluxVaeConfig

    def setup(self):
        self.enc = VaeEncoder(self.cfg)
        self.dec = VaeDecoder(self.cfg)

    def __call__(self, image):
        z = self.encode(image)
        return self.decode(z)

    def encode(self, image: jnp.ndarray) -> jnp.ndarray:
        """[B,H,W,3] in [-1,1] -> scaled latents (the deterministic mean)."""
        c = self.cfg
        moments = self.enc(image)
        mean = moments[..., :c.latent_channels]
        return (mean - c.shift_factor) * c.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        return self.dec(z / c.scaling_factor + c.shift_factor)


class VaeEncoder(nn.Module):
    cfg: FluxVaeConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        x = nn.Conv(c.block_out_channels[0], (3, 3), dtype=c.dtype,
                    name="conv_in")(x.astype(c.dtype))
        for bi, ch in enumerate(c.block_out_channels):
            for li in range(c.layers_per_block):
                x = VaeResnet(ch, c.dtype, name=f"down{bi}_res{li}")(x)
            if bi < len(c.block_out_channels) - 1:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=c.dtype, name=f"down{bi}_conv")(x)
        x = VaeResnet(c.block_out_channels[-1], c.dtype, name="mid_res0")(x)
        x = VaeAttention(c.dtype, name="mid_attn")(x)
        x = VaeResnet(c.block_out_channels[-1], c.dtype, name="mid_res1")(x)
        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(x)
        return nn.Conv(2 * c.latent_channels, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(x).astype(c.dtype))


class VaeDecoder(nn.Module):
    cfg: FluxVaeConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        rev = tuple(reversed(c.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), dtype=c.dtype, name="conv_in")(
            z.astype(c.dtype))
        x = VaeResnet(rev[0], c.dtype, name="mid_res0")(x)
        x = VaeAttention(c.dtype, name="mid_attn")(x)
        x = VaeResnet(rev[0], c.dtype, name="mid_res1")(x)
        for bi, ch in enumerate(rev):
            for li in range(c.layers_per_block + 1):
                x = VaeResnet(ch, c.dtype, name=f"up{bi}_res{li}")(x)
            if bi < len(rev) - 1:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 2 * H, 2 * W, C), "nearest")
                x = nn.Conv(ch, (3, 3), dtype=c.dtype, name=f"up{bi}_conv")(x)
        x = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6,
                         dtype=jnp.float32, name="conv_norm_out")(x)
        return nn.Conv(3, (3, 3), dtype=jnp.float32,
                       name="conv_out")(nn.silu(x).astype(c.dtype))


# --------------------------------------------------------------------------- #
# packing + Kontext sampling
# --------------------------------------------------------------------------- #

def pack_latents(z: jnp.ndarray) -> jnp.ndarray:
    """[B, h, w, C] -> [B, (h/2)(w/2), 4C] (2x2 patchify)."""
    B, h, w, C = z.shape
    z = z.reshape(B, h // 2, 2, w // 2, 2, C)
    z = z.transpose(0, 1, 3, 5, 2, 4)
    return z.reshape(B, (h // 2) * (w // 2), C * 4)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    B, N, D = tokens.shape
    C = D // 4
    z = tokens.reshape(B, h // 2, w // 2, C, 2, 2)
    z = z.transpose(0, 1, 4, 2, 5, 3)
    return z.reshape(B, h, w, C)


def latent_ids(h2: int, w2: int, t: int = 0) -> np.ndarray:
    """Packed-token position ids [(h2*w2), 3] = (t, y, x); Kontext context
    tokens use t=1."""
    ids = np.zeros((h2, w2, 3), np.float32)
    ids[..., 0] = t
    ids[..., 1] = np.arange(h2)[:, None]
    ids[..., 2] = np.arange(w2)[None, :]
    return ids.reshape(-1, 3)


def kontext_edit(
    transformer: FluxTransformer, t_params,
    vae: FluxVae, vae_params,
    t5_states: jnp.ndarray,          # [1, T, joint_dim]
    pooled: jnp.ndarray,             # [1, pooled_dim]
    image_rgb01: jnp.ndarray,        # [1, H, W, 3] in [0, 1]
    key: jax.Array,
    num_steps: int = 28,
    guidance: float = 2.5,
) -> jnp.ndarray:
    """FluxKontextPipeline inference: sample new latents conditioned on the
    packed source-image latents (ids t=1) + prompt; returns [1,H,W,3] in
    [0,1]. Flow-matching Euler with the dev-model guidance embedding (no
    CFG double batch)."""
    B, H, W, _ = image_rgb01.shape
    z_ctx = vae.apply(vae_params, image_rgb01 * 2.0 - 1.0,
                      method=FluxVae.encode)
    h, w = z_ctx.shape[1:3]
    ctx_tokens = pack_latents(z_ctx)
    n_img = (h // 2) * (w // 2)

    img_ids = jnp.asarray(np.concatenate(
        [latent_ids(h // 2, w // 2, 0), latent_ids(h // 2, w // 2, 1)]))
    txt_ids = jnp.zeros((t5_states.shape[1], 3), jnp.float32)

    lat = jax.random.normal(key, ctx_tokens.shape, jnp.float32)
    # dev-model "dynamic shifting": exponential time shift with mu
    # interpolated from the image sequence length (diffusers FluxPipeline
    # calculate_shift: base 0.5@256 tokens -> 1.15@4096)
    mu = 0.5 + (n_img - 256) * (1.15 - 0.5) / (4096 - 256)
    base = jnp.linspace(1.0, 1.0 / num_steps, num_steps)
    shifted = math.exp(mu) / (math.exp(mu) + (1.0 / base - 1.0))
    sigmas = jnp.concatenate([shifted, jnp.zeros((1,))])
    g = jnp.full((B,), guidance, jnp.float32)

    def body(lat, i):
        t = jnp.full((B,), sigmas[i], jnp.float32)
        x_in = jnp.concatenate([lat, ctx_tokens], axis=1)
        v = transformer.apply(t_params, x_in, t5_states, pooled, t,
                              img_ids, txt_ids, g)[:, :n_img]
        return lat + (sigmas[i + 1] - sigmas[i]) * v, None

    lat, _ = jax.lax.scan(body, lat, jnp.arange(num_steps))
    z = unpack_latents(lat, h, w)
    out = vae.apply(vae_params, z, method=FluxVae.decode)
    return jnp.clip(out * 0.5 + 0.5, 0.0, 1.0)
