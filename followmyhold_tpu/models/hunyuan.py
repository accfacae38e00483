"""Hunyuan3D-2 shape-generation stack in Flax: flow-matching DiT + ShapeVAE
decoder + image conditioner.

The reference consumes an external Hunyuan3D-2 clone whose contract is visible
in the patched pipeline (third_party_patches/hy3dgen/shapegen/pipelines.py):
- model(latents [B,L,E], timestep [B] in 0..1, cond, guidance=None) -> eps
  (pipelines.py:972, 1280),
- vae.scale_factor, vae.latent_shape, vae(latents) -> decoded feature set,
  vae.geo_decoder(queries [B,N,3], decoded) -> occupancy logits
  (pipelines.py:292-312),
- conditioner(image=..., mask=...) -> {'main': tokens};
  conditioner.unconditional_embedding(bsz) (pipelines.py:599-638).

Architectures here are TPU-first re-designs of the same shapes: a FLUX-style
double/single-stream DiT with adaLN modulation over latent tokens + image
condition tokens, and a vecset ShapeVAE decoder whose geo_decoder is one
cross-attention readout over Fourier-embedded query points (chunked with
lax.map, MXU-shaped). Exact layer counts/widths are config so converted
checkpoints can set them.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.attention import multi_head_attention


# ---------------------------------------------------------------------------
# common blocks
# ---------------------------------------------------------------------------

def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of t in [0,1] (scaled by 1000, FLUX convention)."""
    t = t.astype(jnp.float32) * 1000.0
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class MlpEmbedder(nn.Module):
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="in_layer")(x)
        x = nn.silu(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_layer")(x)


def _split_heads(x, heads):
    B, N, D = x.shape
    return x.reshape(B, N, heads, D // heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


class Modulation(nn.Module):
    hidden: int
    n_mods: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, vec):
        out = nn.Dense(self.n_mods * self.hidden, dtype=self.dtype, name="lin")(
            nn.silu(vec))
        return jnp.split(out[:, None, :], self.n_mods, axis=-1)


def _modulate(x, shift, scale):
    return x * (1 + scale) + shift


class DoubleStreamBlock(nn.Module):
    """Joint attention over (latent, cond) streams with per-stream adaLN."""

    hidden: int
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, c, vec):
        h = self.hidden
        x_mods = Modulation(h, 6, self.dtype, name="img_mod")(vec)
        c_mods = Modulation(h, 6, self.dtype, name="txt_mod")(vec)

        def qkv(stream, name):
            q, k, v = jnp.split(
                nn.Dense(3 * h, dtype=self.dtype, name=f"{name}_qkv")(stream), 3, -1)
            # FLUX-contract QKNorm: per-head RMSNorm with learned scale
            # (hunyuan3ddit double_blocks.*.{img,txt}_attn.norm.{query,key}_norm)
            q = nn.RMSNorm(dtype=jnp.float32, name=f"{name}_qnorm")(
                _split_heads(q, self.heads)).astype(self.dtype)
            k = nn.RMSNorm(dtype=jnp.float32, name=f"{name}_knorm")(
                _split_heads(k, self.heads)).astype(self.dtype)
            return q, k, _split_heads(v, self.heads)

        xn = nn.LayerNorm(dtype=jnp.float32, use_bias=False, use_scale=False,
                          name="img_norm1")(x).astype(self.dtype)
        xn = _modulate(xn, x_mods[0], x_mods[1])
        cn = nn.LayerNorm(dtype=jnp.float32, use_bias=False, use_scale=False,
                          name="txt_norm1")(c).astype(self.dtype)
        cn = _modulate(cn, c_mods[0], c_mods[1])

        xq, xk, xv = qkv(xn, "img")
        cq, ck, cv = qkv(cn, "txt")
        q = jnp.concatenate([cq, xq], axis=2)
        k = jnp.concatenate([ck, xk], axis=2)
        v = jnp.concatenate([cv, xv], axis=2)
        attn = _merge_heads(multi_head_attention(q, k, v))
        c_attn, x_attn = attn[:, : c.shape[1]], attn[:, c.shape[1]:]

        x = x + x_mods[2] * nn.Dense(h, dtype=self.dtype, name="img_proj")(x_attn)
        c = c + c_mods[2] * nn.Dense(h, dtype=self.dtype, name="txt_proj")(c_attn)

        def mlp(stream, shift, scale, gate, name):
            s = nn.LayerNorm(dtype=jnp.float32, use_bias=False, use_scale=False,
                             name=f"{name}_norm2")(stream).astype(self.dtype)
            s = _modulate(s, shift, scale)
            s = nn.Dense(int(h * self.mlp_ratio), dtype=self.dtype, name=f"{name}_mlp1")(s)
            s = nn.gelu(s, approximate=True)
            return stream + gate * nn.Dense(h, dtype=self.dtype, name=f"{name}_mlp2")(s)

        x = mlp(x, x_mods[3], x_mods[4], x_mods[5], "img")
        c = mlp(c, c_mods[3], c_mods[4], c_mods[5], "txt")
        return x, c


class SingleStreamBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, vec):
        h = self.hidden
        mods = Modulation(h, 3, self.dtype, name="mod")(vec)
        xn = nn.LayerNorm(dtype=jnp.float32, use_bias=False, use_scale=False,
                          name="pre_norm")(x).astype(self.dtype)
        xn = _modulate(xn, mods[0], mods[1])
        mlp_dim = int(h * self.mlp_ratio)
        qkv_mlp = nn.Dense(3 * h + mlp_dim, dtype=self.dtype, name="linear1")(xn)
        q, k, v, m = jnp.split(qkv_mlp, [h, 2 * h, 3 * h], axis=-1)
        q = nn.RMSNorm(dtype=jnp.float32, name="qnorm")(
            _split_heads(q, self.heads)).astype(self.dtype)
        k = nn.RMSNorm(dtype=jnp.float32, name="knorm")(
            _split_heads(k, self.heads)).astype(self.dtype)
        attn = _merge_heads(multi_head_attention(q, k, _split_heads(v, self.heads)))
        out = nn.Dense(h, dtype=self.dtype, name="linear2")(
            jnp.concatenate([attn, nn.gelu(m, approximate=True)], axis=-1))
        return x + mods[2] * out


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 64
    context_dim: int = 1536          # conditioner token dim
    hidden: int = 2048
    heads: int = 16
    depth_double: int = 8
    depth_single: int = 16
    mlp_ratio: float = 4.0
    guidance_embed: bool = False     # lcm-distilled variants embed the scale
    time_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16


DIT_FULL = DiTConfig()
DIT_TINY = DiTConfig(hidden=64, heads=4, depth_double=1, depth_single=2,
                     context_dim=32, time_dim=32, dtype=jnp.float32)


class HunyuanDiT(nn.Module):
    """eps = DiT(latents, t, cond): flow-matching velocity prediction."""

    cfg: DiTConfig

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,   # [B, L, in_channels]
        timestep: jnp.ndarray,  # [B] in [0,1]
        cond: jnp.ndarray,      # [B, M, context_dim]
        guidance: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        x = nn.Dense(c.hidden, dtype=c.dtype, name="latent_in")(
            latents.astype(c.dtype))
        ctx = nn.Dense(c.hidden, dtype=c.dtype, name="cond_in")(cond.astype(c.dtype))

        vec = MlpEmbedder(c.hidden, c.dtype, name="time_in")(
            timestep_embedding(timestep, c.time_dim).astype(c.dtype))
        if c.guidance_embed:
            g = jnp.zeros_like(timestep) if guidance is None else guidance
            vec = vec + MlpEmbedder(c.hidden, c.dtype, name="guidance_in")(
                timestep_embedding(g / 1000.0, c.time_dim).astype(c.dtype))

        class _DoubleScan(nn.Module):
            hidden: int
            heads: int
            mlp_ratio: float
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, carry, _):
                x, ctx, vec = carry
                x, ctx = DoubleStreamBlock(self.hidden, self.heads,
                                           self.mlp_ratio, self.dtype,
                                           name="block")(x, ctx, vec)
                return (x, ctx, vec), None

        class _SingleScan(nn.Module):
            hidden: int
            heads: int
            mlp_ratio: float
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, carry, _):
                s, vec = carry
                s = SingleStreamBlock(self.hidden, self.heads, self.mlp_ratio,
                                      self.dtype, name="block")(s, vec)
                return (s, vec), None

        dscan = nn.scan(_DoubleScan, variable_axes={"params": 0},
                        split_rngs={"params": True}, length=c.depth_double)
        (x, ctx, _), _ = dscan(c.hidden, c.heads, c.mlp_ratio, c.dtype,
                               name="double_blocks")((x, ctx, vec), None)
        s = jnp.concatenate([ctx, x], axis=1)
        sscan = nn.scan(_SingleScan, variable_axes={"params": 0},
                        split_rngs={"params": True}, length=c.depth_single)
        (s, _), _ = sscan(c.hidden, c.heads, c.mlp_ratio, c.dtype,
                          name="single_blocks")((s, vec), None)
        x = s[:, ctx.shape[1]:]

        shift, scale = Modulation(c.hidden, 2, c.dtype, name="final_mod")(vec)
        x = nn.LayerNorm(dtype=jnp.float32, use_bias=False, use_scale=False,
                         name="final_norm")(x).astype(c.dtype)
        x = _modulate(x, shift, scale)
        return nn.Dense(c.in_channels, dtype=jnp.float32, name="final_proj")(x)


# ---------------------------------------------------------------------------
# ShapeVAE (decode path)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ShapeVAEConfig:
    num_latents: int = 3072
    embed_dim: int = 64
    width: int = 1024
    heads: int = 16
    depth: int = 16
    geo_heads: int = 16
    fourier_freqs: int = 8
    scale_factor: float = 1.0039506158752403  # hy3dgen shapevae default
    # remat knobs: recompute-in-backward trades FLOPs for HBM. With the
    # Pallas flash backward the activation footprint shrank enough that the
    # defaults may be revisited per deployment (bench FOHO_VAE_REMAT=0/1).
    remat_blocks: bool = True
    dtype: jnp.dtype = jnp.bfloat16


VAE_FULL = ShapeVAEConfig()
VAE_TINY = ShapeVAEConfig(num_latents=16, embed_dim=8, width=32, heads=4,
                          depth=1, geo_heads=4, dtype=jnp.float32)


def fourier_embed(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[..., 3] -> [..., 3 * (2*num_freqs + 1)] (include input)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    ang = x[..., None] * freqs  # [..., 3, F]
    emb = jnp.concatenate(
        [x[..., None], jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.reshape(*x.shape[:-1], -1)


class VAESelfBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(h)
        q, k, v = (_split_heads(t, self.heads) for t in jnp.split(qkv, 3, -1))
        x = x + nn.Dense(self.width, dtype=self.dtype, name="proj")(
            _merge_heads(multi_head_attention(q, k, v)))
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype, name="fc2")(h)


class _VAEScanBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, carry, _):
        y = VAESelfBlock(self.width, self.heads, self.dtype, name="block")(carry)
        return y, None


class ShapeVAEDecoder(nn.Module):
    """latents [B,L,E] -> feature set [B,L,width] (reference `vae(latents)`).

    Depth is folded with nn.scan (one compiled block; params carry a leading
    depth axis) — unrolled deep stacks take ~minutes/block to compile over a
    remote-compile tunnel."""

    cfg: ShapeVAEConfig

    @nn.compact
    def __call__(self, latents: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = nn.Dense(c.width, dtype=c.dtype, name="post_kl")(latents.astype(c.dtype))
        # remat each block (cfg.remat_blocks): the guidance loop
        # differentiates through this decoder every optimizer iteration;
        # storing 16 layers of residuals at [B,3072,1024] costs HBM, while
        # recompute costs ~1/3 more decoder FLOPs in the backward
        block = nn.remat(_VAEScanBlock) if c.remat_blocks else _VAEScanBlock
        scan = nn.scan(block, variable_axes={"params": 0},
                       split_rngs={"params": True}, length=c.depth)
        x, _ = scan(c.width, c.heads, c.dtype, name="blocks")(x, None)
        return nn.LayerNorm(dtype=jnp.float32, name="ln_post")(x).astype(c.dtype)


class GeoDecoder(nn.Module):
    """Occupancy-logit query head: cross-attend Fourier-embedded points to the
    decoded latent set (reference vae.geo_decoder, pipelines.py:305), with the
    Michelangelo/vecset ResidualCrossAttentionBlock contract: a cross-attn
    residual (ln_1 on queries, ln_2 on the latent set) followed by an MLP
    residual (ln_3 -> c_fc -> GELU -> c_proj), then ln_post + output_proj.

    Split into kv_feats (per decoded latent set, computed ONCE) and query
    (per chunk of points) so the chunked grid decode doesn't re-project the
    k/v of all 3072 latent tokens for every chunk. Submodule names match the
    original compact layout, so converted checkpoints are unaffected."""

    cfg: ShapeVAEConfig

    def setup(self):
        c = self.cfg
        self.query_in = nn.Dense(c.width, dtype=c.dtype)
        self.lnq = nn.LayerNorm(dtype=jnp.float32)
        self.kv = nn.Dense(2 * c.width, dtype=c.dtype)
        self.lnkv = nn.LayerNorm(dtype=jnp.float32)
        self.q = nn.Dense(c.width, dtype=c.dtype)
        self.proj = nn.Dense(c.width, dtype=c.dtype)
        self.ln3 = nn.LayerNorm(dtype=jnp.float32)
        self.fc1 = nn.Dense(4 * c.width, dtype=c.dtype)
        self.fc2 = nn.Dense(c.width, dtype=c.dtype)
        self.ln_out = nn.LayerNorm(dtype=jnp.float32)
        self.logit = nn.Dense(1, dtype=jnp.float32)

    def kv_feats(self, features: jnp.ndarray) -> jnp.ndarray:
        """[B,L,width] -> merged k,v [B,L,2*width]."""
        return self.kv(self.lnkv(features).astype(self.cfg.dtype))

    def query_head(self, queries: jnp.ndarray, kv: jnp.ndarray):
        """Embed + projections + cross-attention: everything whose backward
        residuals are worth KEEPING (the flash-attention custom VJP re-runs
        its forward kernel whenever its region is rematerialized — see
        vae_query_logits remat='tail'). Returns (q_resid, attn_merged)."""
        c = self.cfg
        q = fourier_embed(queries, c.fourier_freqs)
        q = self.query_in(q.astype(c.dtype))
        qn = self.lnq(q).astype(c.dtype)
        k, v = jnp.split(kv, 2, -1)
        qh = _split_heads(self.q(qn), c.geo_heads)
        attn = multi_head_attention(qh, _split_heads(k, c.geo_heads),
                                    _split_heads(v, c.geo_heads))
        return q, _merge_heads(attn)

    def query_tail(self, q: jnp.ndarray, attn_merged: jnp.ndarray) -> jnp.ndarray:
        """Residual proj + MLP + output head: cheap to recompute, and its
        fc1 activation ([N,4096]) is the HBM hog — the remat target."""
        x = q + self.proj(attn_merged)
        h = self.ln3(x).astype(self.cfg.dtype)
        x = x + self.fc2(nn.gelu(self.fc1(h), approximate=False))
        x = self.ln_out(x)
        return self.logit(x)[..., 0]

    def query(self, queries: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        """queries [B,N,3] x kv [B,L,2*width] -> logits [B,N]."""
        q, attn_merged = self.query_head(queries, kv)
        return self.query_tail(q, attn_merged)

    def __call__(self, queries: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        return self.query(queries, self.kv_feats(features))


class ShapeVAE(nn.Module):
    """Bundles decoder + geo head behind the reference's call contract.

    __call__(latents, queries) touches BOTH submodules so a single init
    creates all params; queries=None returns the decoded feature set only.
    """

    cfg: ShapeVAEConfig

    def setup(self):
        self.decoder = ShapeVAEDecoder(self.cfg)
        self.geo = GeoDecoder(self.cfg)

    def __call__(self, latents: jnp.ndarray,
                 queries: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        feats = self.decoder(latents)
        if queries is None:
            return feats
        return self.geo(queries, feats)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(latents)

    def geo_decoder(self, queries: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
        return self.geo(queries, features)

    def geo_kv(self, features: jnp.ndarray) -> jnp.ndarray:
        return self.geo.kv_feats(features)

    def geo_query(self, queries: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
        return self.geo.query(queries, kv)

    def geo_query_head(self, queries: jnp.ndarray, kv: jnp.ndarray):
        return self.geo.query_head(queries, kv)

    def geo_query_tail(self, q: jnp.ndarray, attn_merged: jnp.ndarray):
        return self.geo.query_tail(q, attn_merged)


def _geo_query_grouped(
    vae: ShapeVAE,
    params,
    kv: jnp.ndarray,          # [B, L, 2*width] precomputed geo k/v
    queries: jnp.ndarray,     # [B, N, 3]
    chunk: int = 8192,
    remat_chunks: bool = True,
    group: int = 34,
    remat: Optional[str] = None,
) -> jnp.ndarray:
    """Chunked + grouped geo-decoder query against precomputed k/v.

    The remote-compile tunnel rejects attention graphs with q longer than
    8192, so larger chunks can't amortize the per-call overhead (~10 ms vs
    ~2.3 ms of flops at chunk=8192). Instead stack `group` chunks as a
    BATCH axis per call: q stays 8192, the flash grid gets group x taller.
    Sweep (65^3 grad): group 8 -> 406 ms, 17 -> 363, 34 (one group) -> 355.

    remat modes (HBM saved vs FLOPs recomputed in the backward):
      'full': jax.checkpoint around the whole per-group query — the backward
              re-runs EVERYTHING including the flash-attention forward
              kernel (its custom VJP needs out/logsumexp residuals, which a
              plain checkpoint discards).
      'tail': save the attention head's residuals (q/qn/qh/attn-out/lse,
              ~2.5 GB bf16 at 65^3), checkpoint only the proj+MLP tail whose
              fc1 activation is the real HBM hog — the backward skips the
              flash forward re-run. Measured SLOWER than 'full' on the dense
              65^3 decode (452 vs 435 ms grad epoch): the residual HBM
              writes cost more than the ~3.4 ms flash re-run, since both
              kernels sit near the D=64 MXU floor. Kept as a knob because
              the trade shifts when the query count shrinks (hier decode).
      'none': save everything.
    Default: 'full' if remat_chunks (legacy bool) else 'none'.
    """
    if remat is None:
        remat = "full" if remat_chunks else "none"
    assert remat in ("full", "tail", "none"), f"unknown remat mode {remat!r}"
    B, N, _ = queries.shape
    pad = (-N) % chunk
    qp = jnp.pad(queries, ((0, 0), (0, pad), (0, 0)))
    qc = qp.reshape(B, -1, chunk, 3).transpose(1, 0, 2, 3)  # [n_chunks,B,chunk,3]
    n_chunks = qc.shape[0]
    group = max(1, min(group, n_chunks))
    # equalize group sizes across the fixed number of groups so the last
    # group isn't mostly padding (112 chunks at group=34 would pad 24)
    n_groups = -(-n_chunks // group)
    group = -(-n_chunks // n_groups)
    gpad = (-n_chunks) % group
    qc = jnp.pad(qc, ((0, gpad), (0, 0), (0, 0), (0, 0)))
    qg = qc.reshape(-1, group * B, chunk, 3)  # [n_groups, G*B, chunk, 3]
    kvg = jnp.broadcast_to(kv[None], (group,) + kv.shape).reshape(
        group * B, *kv.shape[1:])
    if remat == "tail":
        tail = jax.checkpoint(lambda qr, am: vae.apply(
            params, qr, am, method=ShapeVAE.geo_query_tail))

        def geo_fn(q, f):
            qr, am = vae.apply(params, q, f, method=ShapeVAE.geo_query_head)
            return tail(qr, am)
    else:
        geo_fn = lambda q, f: vae.apply(params, q, f,  # noqa: E731
                                        method=ShapeVAE.geo_query)
        if remat == "full":
            geo_fn = jax.checkpoint(geo_fn)
    logits = jax.lax.map(lambda q: geo_fn(q, kvg), qg)  # [n_groups, G*B, chunk]
    logits = logits.reshape(-1, B, chunk).transpose(1, 0, 2).reshape(B, -1)
    return logits[:, :N]


def vae_decode_kv(vae: ShapeVAE, params, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled ShapeVAE decode + geo k/v projection (computed ONCE per decode,
    not once per query chunk)."""
    feats = vae.apply(params, latents / vae.cfg.scale_factor,
                      method=ShapeVAE.decode)
    return vae.apply(params, feats, method=ShapeVAE.geo_kv)


def vae_query_logits(
    vae: ShapeVAE,
    params,
    latents: jnp.ndarray,
    queries: jnp.ndarray,
    chunk: int = 8192,
    remat_chunks: bool = True,
    group: int = 34,
    remat: Optional[str] = None,
) -> jnp.ndarray:
    """Scaled decode + chunked grid query (reference latent2sdf,
    pipelines.py:292-312; chunk 8000 -> padded to an MXU-friendly 8192).
    Returns logits [B, N] (raw; FOHO negates to get inside<0).

    Chunking uses lax.map over vae.apply (a pure fn), keeping the per-chunk
    cross-attention in VMEM-friendly sizes while the weights stay resident.
    remat_chunks recomputes each chunk's forward in the backward (HBM vs
    FLOPs; see ShapeVAEConfig.remat_blocks).
    """
    kv = vae_decode_kv(vae, params, latents)
    return _geo_query_grouped(vae, params, kv, queries, chunk,
                              remat_chunks, group, remat)


def _upsample_corner_aligned(g: jnp.ndarray, cf: int) -> jnp.ndarray:
    """Corner-aligned trilinear upsample [n_c,n_c,n_c] -> [(n_c-1)*cf+1, ...]
    for the IN-LOOP decode, whose background values feed differentiable SDF
    losses and so must interpolate (the export compose only needs signs away
    from the surface and uses a floor fill instead)."""

    def up_axis(a):
        base, nxt = a[:-1], a[1:]
        parts = jnp.stack(
            [base * (1 - r / cf) + nxt * (r / cf) for r in range(cf)], axis=1)
        out = parts.reshape((a.shape[0] - 1) * cf, *a.shape[1:])
        return jnp.concatenate([out, a[-1:]], axis=0)

    for _ in range(3):
        g = jnp.moveaxis(up_axis(g), 0, 2)
    return g


def _select_surface_cells(g_c3, res_c: int, pad_factor: float, xp):
    """Flat bool [res_c^3] surface-cell mask from a coarse corner grid.

    Shared by the device decodes (xp=jnp) and the host compose (xp=np): the
    ops used (slice/stack/min/max/abs/mul/compare) are IEEE-f32 exact on both,
    so the host reproduces the device's selection bit-for-bit from the same
    g_c values (tested on adversarial random-VAE noise fields)."""
    cs = xp.stack([g_c3[dx:dx + res_c, dy:dy + res_c, dz:dz + res_c]
                   for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)])
    cmin, cmax = cs.min(0), cs.max(0)
    min_abs = xp.minimum(xp.abs(cmin), xp.abs(cmax))
    spread = cmax - cmin
    select = ((cmin <= 0) & (cmax >= 0)) | (min_abs < pad_factor * spread)
    return select.reshape(-1)


def _noncoarse_offsets(cf: int) -> np.ndarray:
    """The (cf+1)^3 - 8 within-cell fine-lattice offsets that are NOT
    coarse-aligned corners (those already carry exact level-1 values)."""
    return np.array([(i, j, k)
                     for i in range(cf + 1)
                     for j in range(cf + 1)
                     for k in range(cf + 1)
                     if not (i % cf == 0 and j % cf == 0 and k % cf == 0)],
                    np.int32)


def _refine_point_budget(cf: int) -> int:
    """Unique refine points per selected cell, with ~12.5% margin.

    On a 2D surface shell each selected cell owns ~cf^3 unique non-coarse
    points (interior (cf-1)^3 + half of 6 faces + quarter of 12 edges +
    shared non-coarse corners telescopes to cf^3). Measured maxima on the
    capacity-sweep fields (sphere/box/wavy/ripple/box-filling sphere):
    8.73/cell at cf=2 (res 64) and 71.2/cell at cf=4 (res 384) — both under
    the 9*cf^3/8 budget (9 at cf=2, 72 at cf=4). Isolated cells can own all
    (cf+1)^3-8 points, but only on noise fields where the cell cap is
    already saturated; overflow degrades to the interpolated background and
    is reported by the caller-visible count."""
    return (9 * cf ** 3) // 8


def vae_query_logits_hier_grid(
    vae: ShapeVAE,
    params,
    latents: jnp.ndarray,            # [1, L, E]
    bbox_min,
    bbox_max,
    resolution: int,
    chunk: int = 8192,
    coarse_factor: int = 2,
    cell_cap: int = 10240,
    pad_factor: float = 0.5,
    remat_chunks: bool = True,
    remat: Optional[str] = None,
    small_cell_cap: Optional[int] = None,
):
    """DIFFERENTIABLE two-level grid decode -> dense logits [1, (res+1)^3].

    The in-loop 65^3 decode queries all 274,625 grid points through the geo
    cross-attention every optimizer iteration (reference latent2sdf,
    pipelines.py:292-312), but the loss gradient only reaches logits at
    surface-crossing cells (marching-tets vertices interpolate those; far
    cells emit nothing). So: decode the coarse (res/cf) sub-lattice (an exact
    subset of the fine grid), select cells whose corner signs could cross
    within a pad_factor margin (min|corner| < pad_factor * corner spread, a
    local-Lipschitz shell), and refine ONLY the selected cells' non-coarse
    lattice points — 19 of 27 offsets at cf=2; the 8 coarse-aligned corners
    are already exact.

    pad_factor=0.5 (vs the export decode's 1.5): a res-64 sweep over
    sphere / two-sphere / wavy / thin-plate / adversarial (ripple
    wavelength ~2 fine cells) fields shows mesh equality with the dense
    decode holds down to 0.5 everywhere and first breaks at 0.25 on the
    adversarial field, while 1.5 selects ~3x the crossing cells (10.5k of
    32k for a box-filling sphere — overflowing any useful cell_cap).

    Composition is a multiplicity-normalized scatter-ADD of (fine - upsampled)
    deltas: adjacent selected cells share face/edge corners, and a plain
    scatter-set with duplicate indices would double-count their cotangents in
    the backward. With the delta/multiplicity form each duplicate write gets
    cot/mult (summing to the true cotangent) and the interpolated background
    cancels exactly at refined points, so values AND gradients match the
    dense decode wherever geometry is emitted (selection is stop_gradient'd,
    discrete in the reference semantics too).

    Returns (dense_logits [1, (res+1)^3], capacity_indicator). The indicator
    is max(n_selected_cells, n_refine_points scaled into cell units), so
    indicator > cell_cap iff EITHER the cell set or the deduped point set
    overflowed its cap; overflowed cells/points keep interpolated
    (value-approximate) background values — monitor like export's check.

    small_cell_cap: two-tier refine capacity. The refine query set is padded
    to 9*cell_cap for STATIC shapes, but typical shapes select far fewer
    cells than the worst-case cap sized for box-filling objects (8800 cells
    measured vs ~5-6k for sphere-like shapes) — ~15 ms/iter per 1024 cells
    of pure padding (exp_ab_caps, v5e 2026-08-20). With small_cell_cap set,
    a lax.cond picks a 9*small_cell_cap refine set whenever the selected
    cells fit, falling back to the full cell_cap branch otherwise — exact
    everywhere, and the common case pays only the capacity it needs. Under
    vmap (batched guidance) lax.cond lowers to both-branches-execute;
    batched callers should pass small_cell_cap=None.

    MEASURED NET-NEGATIVE inside the guidance grad loops on v5e
    (exp_small_cap, 2026-08-20): differentiating through the cond unions
    both branches' residuals, costing +21-27 ms/iter even when only the big
    branch ever executes — see GuidedSampler.inloop_small_cap (default
    None). The machinery is kept for forward-only decodes and deployments
    where the trade differs.
    """
    assert coarse_factor >= 2, "cf=1 has an empty refine set; use the dense decode"
    assert resolution % coarse_factor == 0
    assert latents.shape[0] == 1, "in-loop decode is per-image (vmap batches)"
    cf = coarse_factor
    res_c = resolution // cf
    # a cap above the total cell count only pads the refine query set
    # (tiny test grids would otherwise query cap*19 mostly-duplicate points)
    cell_cap = min(cell_cap, res_c ** 3)
    n_c, n_f = res_c + 1, resolution + 1
    lo = jnp.asarray(bbox_min, jnp.float32)
    hi = jnp.asarray(bbox_max, jnp.float32)
    step_f = (hi - lo) / resolution

    kv = vae_decode_kv(vae, params, latents)

    # ---- level 1: coarse sub-lattice (every cf-th fine point) ----
    idx_c = jnp.arange(n_c) * cf
    IX, IY, IZ = jnp.meshgrid(idx_c, idx_c, idx_c, indexing="ij")
    pts_c = lo + jnp.stack([IX, IY, IZ], -1).astype(jnp.float32) * step_f
    g_c = _geo_query_grouped(vae, params, kv, pts_c.reshape(1, -1, 3),
                             chunk, remat_chunks, remat=remat)[0]
    g_c3 = g_c.reshape(n_c, n_c, n_c)

    # ---- select surface cells (discrete; gradient-free) ----
    select = _select_surface_cells(jax.lax.stop_gradient(g_c3), res_c,
                                   pad_factor, jnp)
    n_sel = select.sum()
    (cell_ids,) = jnp.nonzero(select, size=cell_cap, fill_value=0)
    pad_row = jnp.arange(cell_cap) >= jnp.minimum(n_sel, cell_cap)
    cell_ids = jnp.where(pad_row, cell_ids[0], cell_ids)

    # ---- level 2: refine non-coarse lattice points of selected cells ----
    # Deduplicated: adjacent selected cells share face/edge lattice points
    # (measured ~8.5 unique points per cell on surface shells vs 19 raw), so
    # mark the union on the fine lattice and query each point ONCE. The
    # delta/multiplicity compose below keeps duplicate-pad rows grad-exact.
    ci = cell_ids // (res_c * res_c)
    cj = (cell_ids // res_c) % res_c
    ck = cell_ids % res_c
    base = jnp.stack([ci, cj, ck], -1) * cf                      # [K,3]
    offs = _noncoarse_offsets(cf)                                # [(cf+1)^3-8,3]
    fine_idx = base[:, None, :] + jnp.asarray(offs)[None]        # [K,P,3]
    flat_all = ((fine_idx[..., 0] * n_f + fine_idx[..., 1]) * n_f
                + fine_idx[..., 2]).reshape(-1)
    mark = jnp.zeros((n_f ** 3,), bool).at[flat_all].set(True)
    n_pts = mark.sum()
    dense_bg = _upsample_corner_aligned(g_c3, cf).reshape(-1)    # [n_f^3]

    def refine_and_compose(cap_cells: int):
        """Query the marked points at a 9*cap_cells static budget and compose.
        pt_ids beyond mark's true count pad with point 0; the delta/
        multiplicity scatter keeps the padded duplicates value- and
        gradient-exact, so two capacities that both fit n_pts compose to
        IDENTICAL dense grids (the small-cap lax.cond branch below relies on
        this). Budget covers every analytic field tested (see
        _refine_point_budget); overflow degrades to the interpolated
        background exactly like cell overflow and is folded into the
        returned indicator."""
        point_cap = min(_refine_point_budget(cf) * cap_cells, n_f ** 3)
        (pt_ids,) = jnp.nonzero(mark, size=point_cap, fill_value=0)
        pad_pt = jnp.arange(point_cap) >= jnp.minimum(n_pts, point_cap)
        pt_ids = jnp.where(pad_pt, pt_ids[0], pt_ids)
        fi = pt_ids // (n_f * n_f)
        fj = (pt_ids // n_f) % n_f
        fk = pt_ids % n_f
        pts_f = lo + jnp.stack([fi, fj, fk], -1).astype(jnp.float32) * step_f
        g_f = _geo_query_grouped(vae, params, kv, pts_f.reshape(1, -1, 3),
                                 chunk, remat_chunks, remat=remat)[0]

        # ---- compose: trilinear background + delta/multiplicity scatter ----
        up_at = dense_bg[pt_ids]
        mult = jnp.zeros(n_f ** 3, jnp.float32).at[pt_ids].add(1.0)
        dense = dense_bg.at[pt_ids].add(
            (g_f - up_at) / jnp.maximum(mult[pt_ids], 1.0))
        # capacity indicator: exceeds cell_cap iff the cell OR the point set
        # overflowed its cap (points scaled into cell units so callers keep
        # one threshold); int32-safe via float (n_pts*cell_cap can pass 2^31)
        pts_scaled = jnp.ceil(n_pts.astype(jnp.float32) / point_cap
                              * cell_cap).astype(jnp.int32)
        return dense, jnp.maximum(n_sel, pts_scaled)

    small = None if small_cell_cap is None else min(small_cell_cap, res_c ** 3)
    if small is not None and small < cell_cap:
        # two-tier: the small branch is taken when BOTH the cell set and the
        # marked point set fit its budgets. The mark union above was built
        # from the BIG-cap cell gather, so the small branch never truncates
        # cells — only the point budget binds, and when it fits the two
        # branches compose identically (see refine_and_compose docstring).
        fits = ((n_sel <= small)
                & (n_pts <= _refine_point_budget(cf) * small))
        dense, indicator = jax.lax.cond(
            fits,
            lambda: refine_and_compose(small),
            lambda: refine_and_compose(cell_cap))
    else:
        dense, indicator = refine_and_compose(cell_cap)
    return dense[None], indicator


import functools


EXPORT_CELL_CAP = 65536   # exactness needs n_selected <= cap; callers warn


@functools.lru_cache(maxsize=8)
def hierarchical_decode_fn(vae: ShapeVAE, box_v: float, resolution: int,
                           chunk: int = 8192, coarse_factor: int = 4,
                           cell_cap: int = EXPORT_CELL_CAP,
                           pad_factor: float = 0.5,
                           transfer_dtype=None):
    """ONE jitted (params, latents) -> (logits, n_selected) program for the
    two-level export decode. Eager execution dispatches each chunk as its own
    RPC over a remote-TPU tunnel (~3 ms each x ~600 chunks dominated the
    decode); a single jit amortizes dispatch entirely."""
    def f(params, latents):
        return vae_query_logits_hierarchical(
            vae, params, latents, [-box_v] * 3, [box_v] * 3, resolution,
            chunk=chunk, coarse_factor=coarse_factor, cell_cap=cell_cap,
            pad_factor=pad_factor, transfer_dtype=transfer_dtype)

    import jax

    return jax.jit(f)


def export_transfer_dtype():
    """FOHO_EXPORT_F16=1 ships the export decode's g_c + refine values as
    f16 (ids stay int32): the ~22 MB of f32 values in the ~41 MB D2H that
    rides the slow remote-TPU tunnel halve (~5-7 s of the on-bench export
    cost is this transfer — tools/exp_followup_r4.py). OFF by default: f16
    rounding breaks the bit-vs-dense exactness guarantee; the device counts
    sign flips at refined points and hierarchical_export_logits warns if any
    occurred. Free-standing attached TPUs don't need this."""
    import os

    return (jnp.float16
            if os.environ.get("FOHO_EXPORT_F16", "0") == "1" else None)


def hierarchical_export_logits(vae: ShapeVAE, params, latents,
                               box_v: float, resolution: int,
                               chunk: int = 8192,
                               cell_cap: int = EXPORT_CELL_CAP,
                               coarse_factor: int = 4) -> np.ndarray:
    """Device two-level decode + D2H + host compose with capacity/f16
    warnings — the one entry point the export paths share (guidance export,
    pipeline decode, bench). Returns the dense [n_f^3] logits grid (f32);
    callers negate for the SDF convention. Honors FOHO_EXPORT_F16."""
    tdt = export_transfer_dtype()
    out = hierarchical_decode_fn(
        vae, box_v, resolution, chunk=chunk, coarse_factor=coarse_factor,
        cell_cap=cell_cap, transfer_dtype=tdt)(params, latents)
    if tdt is None:
        g_c, pt_ids, fine, n_sel, n_pts = out
    else:
        g_c, pt_ids, fine, n_sel, n_pts, n_flips = out
        if int(n_flips):
            print(f"WARNING: FOHO_EXPORT_F16 rounding flipped the sign of "
                  f"{int(n_flips)} refined-point logits (|logit| < ~6e-8); "
                  f"the surface may shift by up to one fine cell there — "
                  f"unset FOHO_EXPORT_F16 for bit-exact export")
    grid = compose_hierarchical_grid(
        np.asarray(g_c), np.asarray(fine), resolution,
        coarse_factor=coarse_factor, cell_cap=cell_cap,
        expect_n_pts=int(n_pts), pt_ids=np.asarray(pt_ids))
    pt_cap = min(_refine_point_budget(coarse_factor) * cell_cap,
                 (resolution + 1) ** 3)
    if int(n_sel) > cell_cap or int(n_pts) > pt_cap:
        print(f"WARNING: hierarchical decode capacity overflow: "
              f"{int(n_sel)}/{cell_cap} surface cells, "
              f"{int(n_pts)}/{pt_cap} refine points — raise cell_cap")
    return grid


def vae_query_logits_hierarchical(
    vae: ShapeVAE,
    params,
    latents: jnp.ndarray,            # [1, L, E]
    bbox_min,
    bbox_max,
    resolution: int,
    chunk: int = 8192,
    coarse_factor: int = 4,
    cell_cap: int = 65536,
    pad_factor: float = 0.5,
    transfer_dtype=None,
):
    """Two-level export decode: DEVICE part.

    The reference's final 384^3 export decodes EVERY one of 57M grid points
    through the geo cross-attention (pipelines.py:1624-1641) — ~38 s/image at
    the measured chunk rate. The zero set only crosses ~0.1%% of cells, so:
    decode a coarse (res/coarse_factor) grid, select cells whose min corner
    |logit| is within pad_factor x the cell's corner spread of zero, and
    re-decode only those at full resolution.

    Defaults (pad_factor 0.5, cell_cap 65536) come from a 384^3 sweep on
    analytic fields: a box-filling sphere selects 54.6k coarse cells at
    pf=0.5 (exact vs the dense decode: zero bad crossing cells, zero sign
    flips) while pf=1.5 selects 109k — the OLD 32768 cap overflowed 3.3x on
    such objects, silently corrupting 40%% of crossing cells (2176 sign
    flips). Exactness needs n_selected <= cell_cap; the caller warns.

    Returns (coarse_grid [n_c,n_c,n_c], pt_ids [point_cap], refine_vals
    [point_cap], n_selected, n_points): ~41 MB to transfer instead of the
    228 MB dense grid (the D2H copy rides a slow remote-TPU tunnel here).
    The ascending deduped point ids ARE transferred: shipping the 19 MB
    int32 array measured ~0.5 s vs ~2.2 s for the host to recompute the
    selection from g_c (refine_point_ids_host remains as the values-only
    fallback and the determinism cross-check).
    compose_hierarchical_grid() rebuilds the dense-equivalent grid —
    sign-exact away from the surface and value-exact at every refined cell,
    so marching output matches the dense decode's. Compare n_selected to
    cell_cap and n_points to _refine_point_budget(cf)*cell_cap on the host;
    overflow degrades smoothly (missed cells keep background values) but
    warrants a bigger cap.

    transfer_dtype (e.g. jnp.float16, see export_transfer_dtype): cast g_c
    and the refine values to it before return so the D2H copy ships half the
    bytes; ids stay int32. Returns a SIXTH element n_flips — the number of
    valid refined points whose f16-rounded logit changed sign (only
    |logit| < ~6e-8 can; the caller warns). The host compose then MUST take
    the transferred pt_ids (the host id recompute needs the exact f32 g_c).
    """
    assert resolution % coarse_factor == 0
    assert latents.shape[0] == 1, "export decode is per-image"
    res_c = resolution // coarse_factor
    n_c = res_c + 1
    lo = jnp.asarray(bbox_min, jnp.float32)
    hi = jnp.asarray(bbox_max, jnp.float32)
    step_f = (hi - lo) / resolution

    # ---- level 1: coarse dense decode ----
    ax_c = jnp.linspace(lo[0], hi[0], n_c)
    ay_c = jnp.linspace(lo[1], hi[1], n_c)
    az_c = jnp.linspace(lo[2], hi[2], n_c)
    Xc, Yc, Zc = jnp.meshgrid(ax_c, ay_c, az_c, indexing="ij")
    pts_c = jnp.stack([Xc, Yc, Zc], -1).reshape(1, -1, 3)
    # ShapeVAE decode + geo k/v ONCE for both levels (~200 ms of decoder
    # forward that two vae_query_logits calls would otherwise duplicate)
    kv = vae_decode_kv(vae, params, latents)
    g_c = _geo_query_grouped(vae, params, kv, pts_c, chunk)[0]
    g_c = g_c.reshape(n_c, n_c, n_c)

    # ---- select surface cells + deduped refine-point union ----
    pt_ids, n_sel, n_pts = _refine_point_ids_device(
        g_c, resolution, coarse_factor, cell_cap, pad_factor)
    n_f = resolution + 1
    fi = pt_ids // (n_f * n_f)
    fj = (pt_ids // n_f) % n_f
    fk = pt_ids % n_f
    pts_f = lo + jnp.stack([fi, fj, fk], -1).astype(jnp.float32) * step_f
    g_f = _geo_query_grouped(vae, params, kv,
                             pts_f.reshape(1, -1, 3), chunk)[0]  # [point_cap]
    if transfer_dtype is not None:
        g_t = g_f.astype(transfer_dtype)
        valid = jnp.arange(pt_ids.shape[0]) < jnp.minimum(
            n_pts, pt_ids.shape[0])
        n_flips = jnp.sum(valid & (jnp.sign(g_t.astype(jnp.float32))
                                   != jnp.sign(g_f)))
        return g_c.astype(transfer_dtype), pt_ids, g_t, n_sel, n_pts, n_flips
    return g_c, pt_ids, g_f, n_sel, n_pts


def _refine_point_ids_device(g_c, resolution: int, coarse_factor: int,
                             cell_cap: int, pad_factor: float):
    """DEVICE refine-point ids for the export decode (jnp twin of
    refine_point_ids_host; the host reproduces it bit-for-bit from g_c).

    Adjacent selected cells share face/edge points and every cell's 8
    corners are coarse-aligned (already decoded at level 1): querying all
    (cf+1)^3 points per cell costs 125/cell at cf=4 where only ~70.5 are
    unique (measured; see _refine_point_budget) — so mark the union on the
    fine lattice and query each point ONCE (~1.8x fewer geo queries).
    Returns (pt_ids [point_cap] ascending then zero-padded, n_sel, n_pts)."""
    res_c = resolution // coarse_factor
    n_f = resolution + 1
    select = _select_surface_cells(g_c, res_c, pad_factor, jnp)
    n_sel = select.sum()
    (cell_ids,) = jnp.nonzero(select, size=cell_cap, fill_value=0)
    # pad rows re-use cell 0's points (harmless: duplicates mark no new ones)
    pad_row = jnp.arange(cell_cap) >= jnp.minimum(n_sel, cell_cap)
    cell_ids = jnp.where(pad_row, cell_ids[0], cell_ids)
    ci = cell_ids // (res_c * res_c)
    cj = (cell_ids // res_c) % res_c
    ck = cell_ids % res_c
    base = jnp.stack([ci, cj, ck], -1) * coarse_factor          # [K,3] fine idx
    offs = _noncoarse_offsets(coarse_factor)
    fine_idx = base[:, None, :] + jnp.asarray(offs)[None]       # [K,P,3]
    flat_all = ((fine_idx[..., 0] * n_f + fine_idx[..., 1]) * n_f
                + fine_idx[..., 2]).reshape(-1)
    point_cap = min(_refine_point_budget(coarse_factor) * cell_cap, n_f ** 3)
    mark = jnp.zeros((n_f ** 3,), bool).at[flat_all].set(True)
    n_pts = mark.sum()
    (pt_ids,) = jnp.nonzero(mark, size=point_cap, fill_value=0)
    return pt_ids, n_sel, n_pts


def refine_point_ids_host(g_c, resolution: int, coarse_factor: int = 4,
                          cell_cap: int = EXPORT_CELL_CAP,
                          pad_factor: float = 0.5) -> np.ndarray:
    """HOST twin of the device's refine-point construction: ascending deduped
    fine-lattice ids of the selected cells' non-coarse points, truncated at
    the device's point_cap. Bit-exact vs the device because both derive from
    the SAME g_c values through IEEE-f32-exact ops (tested on adversarial
    random-VAE noise fields in test_hierarchical_decode.py)."""
    g_c = np.asarray(g_c, np.float32)
    res_c = resolution // coarse_factor
    n_f = resolution + 1
    cf = coarse_factor
    select = _select_surface_cells(g_c, res_c, pad_factor, np)
    ids = np.nonzero(select)[0][:cell_cap]
    if ids.size == 0:
        ids = np.zeros(1, np.int64)   # device pad rows mark cell 0's points
    ci = ids // (res_c * res_c)
    cj = (ids // res_c) % res_c
    ck = ids % res_c
    base = np.stack([ci, cj, ck], -1) * cf
    offs = _noncoarse_offsets(cf).astype(np.int64)
    fidx = base[:, None, :] + offs[None]
    flat = ((fidx[..., 0] * n_f + fidx[..., 1]) * n_f + fidx[..., 2])
    # dedup via a flat mark grid + flatnonzero (ascending unique ids, the
    # exact twin of the device's scatter+nonzero): np.unique's sort over the
    # 7.7M candidates measured ~10x slower than the 57M-bool mark pass
    mark = np.zeros(n_f ** 3, bool)
    mark[flat.reshape(-1)] = True
    pt_ids = np.flatnonzero(mark)
    point_cap = min(_refine_point_budget(cf) * cell_cap, n_f ** 3)
    return pt_ids[:point_cap]


def compose_hierarchical_grid(g_c, refine_vals, resolution: int,
                              coarse_factor: int = 4,
                              cell_cap: int = EXPORT_CELL_CAP,
                              pad_factor: float = 0.5,
                              expect_n_pts=None,
                              pt_ids=None,
                              expect_ids_digest=None):
    """HOST part of the two-level decode: floor-fill background + exact
    overwrite of refined point values.

    pt_ids: the device decode's ascending zero-padded refine-point ids
    (preferred — a ~0.5 s D2H copy). When None, the host recomputes them
    from g_c via refine_point_ids_host (~2.2 s; relies on the tested
    IEEE-f32 host/device selection equivalence); then cell_cap/pad_factor
    MUST match the device call's, and expect_n_pts (the device's n_points)
    cross-checks that the recomputation tracked the device (O(1) canary).
    expect_ids_digest (optional, fallback path only): the device's
    refine_ids_digest — an order-invariant uint32 wrap-sum of the ids that
    also catches count-preserving selection divergences the count canary
    cannot (a 4-byte transfer instead of the 19 MB id array).

    Background fill is FLOOR (each fine point takes its containing coarse
    cell's lower-corner value), not trilinear: every fine cell's corners
    then carry values of corners of its containing COARSE cell, so an
    unselected (sign-uniform-with-margin) coarse cell contributes no
    marching emission — exactly like trilinear, whose convex combinations
    are also sign-uniform there — while every zero-crossing fine cell lies
    in a selected coarse cell whose points are overwritten exactly. Marching
    output is therefore identical to the dense decode's (given
    n_selected <= cell_cap; the caller warns on overflow, where either fill
    degrades). The trilinear upsample this replaces was ~5 s of strided
    passes over 57M floats at 385^3; the floor fill is one broadcast write
    (~0.3 s)."""
    if pt_ids is None and np.asarray(g_c).dtype == np.float16:
        raise ValueError(
            "compose_hierarchical_grid: the host refine-point recompute "
            "needs the exact f32 g_c; FOHO_EXPORT_F16 requires the "
            "ids-transferred path (pass pt_ids)")
    g_c = np.asarray(g_c, np.float32)
    refine_vals = np.asarray(refine_vals, np.float32)
    cf = coarse_factor
    n_f = resolution + 1

    # floor index per axis; p == resolution lands on coarse index res_c, so
    # every coarse-aligned fine point (incl. the closing planes) is EXACT
    idx = np.arange(n_f) // cf
    dense = g_c[idx][:, idx][:, :, idx].reshape(-1)

    if pt_ids is not None:
        pt_ids = np.asarray(pt_ids)
        k = pt_ids.size
        if expect_n_pts is not None:
            k = min(k, int(expect_n_pts))     # drop the zero-padded tail
        dense[pt_ids[:k]] = refine_vals[:k]
        return dense

    host_ids = refine_point_ids_host(g_c, resolution, cf, cell_cap,
                                     pad_factor)
    if expect_n_pts is not None:
        point_cap = min(_refine_point_budget(cf) * cell_cap,
                        (resolution + 1) ** 3)
        if min(int(expect_n_pts), point_cap) != host_ids.size:
            raise RuntimeError(
                f"hierarchical compose: host recomputed {host_ids.size} "
                f"refine points but the device queried "
                f"{min(int(expect_n_pts), point_cap)} — host/device "
                f"selection diverged; refusing to scatter misaligned values")
    if expect_ids_digest is not None:
        got = refine_ids_digest(host_ids)
        if got != int(expect_ids_digest):
            raise RuntimeError(
                f"hierarchical compose: host refine-id digest {got} != "
                f"device digest {int(expect_ids_digest)} — host/device "
                f"selection diverged with the same count; refusing to "
                f"scatter misaligned values")
    dense[host_ids] = refine_vals[: host_ids.size]
    return dense


def refine_ids_digest(pt_ids) -> int:
    """Order-invariant digest of refine-point ids: uint32 wraparound sum.
    Pad rows are id 0 (the fine-lattice origin is coarse-aligned, never a
    refine point) so the full zero-padded device array and the host's valid
    prefix digest identically. Device callers should reduce on device and
    transfer the scalar: int(jax.device_get(jnp.sum(ids.astype(jnp.uint32))))
    is this function for jax arrays."""
    import jax as _jax

    if isinstance(pt_ids, _jax.Array):
        return int(np.asarray(jnp.sum(pt_ids.astype(jnp.uint32),
                                      dtype=jnp.uint32)))
    a = np.asarray(pt_ids).astype(np.uint32)
    return int(a.sum(dtype=np.uint32))


# ---------------------------------------------------------------------------
# conditioner
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    """DINOv2-G image encoder -> main cond tokens (hy3dgen conditioner).

    dinov2-giant uses the fused-SwiGLU FFN (ffn="swiglu"); tiny test configs
    keep plain MLP."""

    image_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1536
    depth: int = 40
    heads: int = 24
    ffn: str = "swiglu"
    # hy3dgen DinoImageEncoder(use_cls_token=True): the cond sequence is
    # last_hidden_state = cls + patches (1370 tokens at 518/14)
    use_cls_token: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def n_tokens(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + (
            1 if self.use_cls_token else 0)


COND_FULL = ConditionerConfig()
COND_TINY = ConditionerConfig(image_size=28, patch_size=14, embed_dim=32,
                              depth=1, heads=2, ffn="mlp", dtype=jnp.float32)


class ImageConditioner(nn.Module):
    """image [B,H,W,3] in [0,1] (+optional mask channel) -> {'main': tokens}.

    Matches conditioner(image=..., mask=...) + unconditional_embedding(bsz)
    (pipelines.py:599-638). The unconditional embedding is a learned token
    table, converted from the checkpoint.
    """

    cfg: ConditionerConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        from followmyhold_tpu.models.vit import ViT, ViTConfig

        c = self.cfg
        vcfg = ViTConfig(
            img_size=(c.image_size, c.image_size), patch_size=c.patch_size,
            embed_dim=c.embed_dim, depth=c.depth, num_heads=c.heads,
            use_cls_token=True, layerscale_init=1e-5, ffn=c.ffn, dtype=c.dtype,
        )
        x = image
        if mask is not None:
            x = jnp.concatenate([x, mask[..., None]], axis=-1)
        mean = jnp.asarray([0.485, 0.456, 0.406] + ([0.5] if mask is not None else []))
        std = jnp.asarray([0.229, 0.224, 0.225] + ([0.5] if mask is not None else []))
        x = (x - mean) / std
        if x.shape[1] != c.image_size:
            x = jax.image.resize(
                x, (x.shape[0], c.image_size, c.image_size, x.shape[-1]), "cubic")
        tokens = ViT(vcfg, name="encoder")(x, keep_prefix=c.use_cls_token)
        return {"main": tokens}


class Conditioner(nn.Module):
    cfg: ConditionerConfig

    def setup(self):
        self.encoder = ImageConditioner(self.cfg)
        # hy3dgen's ImageEncoder.unconditional_embedding returns ZEROS of
        # [B, n_tokens, D]; kept as a zero-init param so checkpoint variants
        # that do ship a learned table convert onto it (absent -> zeros)
        self.uncond_embedding = self.param(
            "uncond_embedding", nn.initializers.zeros,
            (1, self.cfg.n_tokens, self.cfg.embed_dim), jnp.float32)

    def __call__(self, image, mask=None):
        return self.encoder(image, mask)

    def unconditional_embedding(self, bsz: int):
        return {"main": jnp.tile(self.uncond_embedding, (bsz, 1, 1))}
