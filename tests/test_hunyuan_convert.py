"""Hunyuan3D-2 converter tests (tiny configs).

No hy3dgen source ships offline (the reference clones Hunyuan3D-2 externally,
README.md:39-41), so like SAM2's the converter is validated for LAYOUT
COMPLETENESS: synthetic state dicts with the exact public hy3dgen tensor
names/shapes (hunyuan3ddit double/single blocks with FLUX QKNorm, the
Michelangelo-lineage vecset ShapeVAE + CrossAttentionDecoder, the DINOv2
conditioner in both HF and dinov2-repo namings) must map 100% — no missing
source keys, no unused source keys, every flax leaf written — and drive a
working forward pass. Contract anchors: pipelines.py:292-312,477-515,599-638.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followmyhold_tpu.convert.hunyuan import (
    convert_conditioner,
    convert_dit,
    convert_vae,
)
from followmyhold_tpu.models.hunyuan import (
    COND_TINY,
    DIT_TINY,
    VAE_TINY,
    Conditioner,
    ConditionerConfig,
    HunyuanDiT,
    ShapeVAE,
)

RNG = np.random.default_rng(0)


def _leaf_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.extend(_leaf_paths(v, p))
        else:
            out.append(p)
    return out


def _assert_complete(params, report, sd):
    """100% mapping: nothing missing/unused AND every flax leaf written.
    (mapped counts stacked dst entries, one per nn.scan leaf, so it is
    compared against the param tree, not len(sd).)"""
    assert report.missing_src == [], report.missing_src[:10]
    assert report.unused_src == [], report.unused_src[:10]
    leaves = set(_leaf_paths(params))
    mapped = set(report.mapped)
    assert leaves == mapped, (sorted(leaves - mapped)[:10],
                              sorted(mapped - leaves)[:10])


def _add(sd, name, *shape):
    sd[name] = RNG.normal(0, 0.05, shape).astype(np.float32)


# ---------------------------------------------------------------------------
# DiT (hunyuan3ddit.py naming, FLUX lineage)
# ---------------------------------------------------------------------------

def _synth_dit_sd(cfg):
    sd = {}
    h, hd = cfg.hidden, cfg.hidden // cfg.heads
    m = int(h * cfg.mlp_ratio)
    _add(sd, "latent_in.weight", h, cfg.in_channels)
    _add(sd, "latent_in.bias", h)
    _add(sd, "cond_in.weight", h, cfg.context_dim)
    _add(sd, "cond_in.bias", h)
    _add(sd, "time_in.in_layer.weight", h, cfg.time_dim)
    _add(sd, "time_in.in_layer.bias", h)
    _add(sd, "time_in.out_layer.weight", h, h)
    _add(sd, "time_in.out_layer.bias", h)
    if cfg.guidance_embed:
        _add(sd, "guidance_in.in_layer.weight", h, cfg.time_dim)
        _add(sd, "guidance_in.in_layer.bias", h)
        _add(sd, "guidance_in.out_layer.weight", h, h)
        _add(sd, "guidance_in.out_layer.bias", h)
    for i in range(cfg.depth_double):
        for s in ("img", "txt"):
            b = f"double_blocks.{i}.{s}"
            _add(sd, f"{b}_mod.lin.weight", 6 * h, h)
            _add(sd, f"{b}_mod.lin.bias", 6 * h)
            _add(sd, f"{b}_attn.qkv.weight", 3 * h, h)
            _add(sd, f"{b}_attn.qkv.bias", 3 * h)
            _add(sd, f"{b}_attn.norm.query_norm.scale", hd)
            _add(sd, f"{b}_attn.norm.key_norm.scale", hd)
            _add(sd, f"{b}_attn.proj.weight", h, h)
            _add(sd, f"{b}_attn.proj.bias", h)
            _add(sd, f"{b}_mlp.0.weight", m, h)
            _add(sd, f"{b}_mlp.0.bias", m)
            _add(sd, f"{b}_mlp.2.weight", h, m)
            _add(sd, f"{b}_mlp.2.bias", h)
    for i in range(cfg.depth_single):
        b = f"single_blocks.{i}"
        _add(sd, f"{b}.modulation.lin.weight", 3 * h, h)
        _add(sd, f"{b}.modulation.lin.bias", 3 * h)
        _add(sd, f"{b}.norm.query_norm.scale", hd)
        _add(sd, f"{b}.norm.key_norm.scale", hd)
        _add(sd, f"{b}.linear1.weight", 3 * h + m, h)
        _add(sd, f"{b}.linear1.bias", 3 * h + m)
        _add(sd, f"{b}.linear2.weight", h, h + m)
        _add(sd, f"{b}.linear2.bias", h)
    _add(sd, "final_layer.adaLN_modulation.1.weight", 2 * h, h)
    _add(sd, "final_layer.adaLN_modulation.1.bias", 2 * h)
    _add(sd, "final_layer.linear.weight", cfg.in_channels, h)
    _add(sd, "final_layer.linear.bias", cfg.in_channels)
    return sd


@pytest.mark.parametrize("guidance", [False, True])
def test_convert_dit_complete_and_forward(guidance):
    import dataclasses

    cfg = dataclasses.replace(DIT_TINY, guidance_embed=guidance)
    sd = _synth_dit_sd(cfg)
    params, report = convert_dit(dict(sd), cfg)
    _assert_complete(params, report, sd)

    model = HunyuanDiT(cfg)
    eps = model.apply(params, jnp.ones((2, 8, cfg.in_channels)) * 0.1,
                      jnp.asarray([0.3, 0.7]),
                      jnp.ones((2, 4, cfg.context_dim)) * 0.1,
                      guidance=jnp.asarray([5.0, 5.0]) if guidance else None)
    assert eps.shape == (2, 8, cfg.in_channels)
    assert np.isfinite(np.asarray(eps)).all()
    # converted weights must actually flow: zero weights give a different eps
    zeroed = jax.tree_util.tree_map(np.zeros_like, params)
    eps0 = model.apply(zeroed, jnp.ones((2, 8, cfg.in_channels)) * 0.1,
                       jnp.asarray([0.3, 0.7]),
                       jnp.ones((2, 4, cfg.context_dim)) * 0.1)
    assert not np.allclose(np.asarray(eps), np.asarray(eps0))


# ---------------------------------------------------------------------------
# ShapeVAE (vecset transformer + CrossAttentionDecoder naming)
# ---------------------------------------------------------------------------

def _synth_vae_sd(cfg):
    sd = {}
    w = cfg.width
    _add(sd, "post_kl.weight", w, cfg.embed_dim)
    _add(sd, "post_kl.bias", w)
    for i in range(cfg.depth):
        b = f"transformer.resblocks.{i}"
        _add(sd, f"{b}.ln_1.weight", w)
        _add(sd, f"{b}.ln_1.bias", w)
        _add(sd, f"{b}.attn.c_qkv.weight", 3 * w, w)
        _add(sd, f"{b}.attn.c_qkv.bias", 3 * w)
        _add(sd, f"{b}.attn.c_proj.weight", w, w)
        _add(sd, f"{b}.attn.c_proj.bias", w)
        _add(sd, f"{b}.ln_2.weight", w)
        _add(sd, f"{b}.ln_2.bias", w)
        _add(sd, f"{b}.mlp.c_fc.weight", 4 * w, w)
        _add(sd, f"{b}.mlp.c_fc.bias", 4 * w)
        _add(sd, f"{b}.mlp.c_proj.weight", w, 4 * w)
        _add(sd, f"{b}.mlp.c_proj.bias", w)
    _add(sd, "ln_post.weight", w)
    _add(sd, "ln_post.bias", w)

    fdim = 3 * (2 * cfg.fourier_freqs + 1)
    g = "geo_decoder.cross_attn_decoder"
    _add(sd, "geo_decoder.query_proj.weight", w, fdim)
    _add(sd, "geo_decoder.query_proj.bias", w)
    for ln in ("ln_1", "ln_2", "ln_3"):
        _add(sd, f"{g}.{ln}.weight", w)
        _add(sd, f"{g}.{ln}.bias", w)
    _add(sd, f"{g}.attn.c_q.weight", w, w)
    _add(sd, f"{g}.attn.c_q.bias", w)
    _add(sd, f"{g}.attn.c_kv.weight", 2 * w, w)
    _add(sd, f"{g}.attn.c_kv.bias", 2 * w)
    _add(sd, f"{g}.attn.c_proj.weight", w, w)
    _add(sd, f"{g}.attn.c_proj.bias", w)
    _add(sd, f"{g}.mlp.c_fc.weight", 4 * w, w)
    _add(sd, f"{g}.mlp.c_fc.bias", 4 * w)
    _add(sd, f"{g}.mlp.c_proj.weight", w, 4 * w)
    _add(sd, f"{g}.mlp.c_proj.bias", w)
    _add(sd, "geo_decoder.ln_post.weight", w)
    _add(sd, "geo_decoder.ln_post.bias", w)
    _add(sd, "geo_decoder.output_proj.weight", 1, w)
    _add(sd, "geo_decoder.output_proj.bias", 1)
    return sd


def test_convert_vae_complete_and_forward():
    cfg = VAE_TINY
    sd = _synth_vae_sd(cfg)
    params, report = convert_vae(dict(sd), cfg)
    _assert_complete(params, report, sd)

    model = ShapeVAE(cfg)
    lat = jnp.ones((1, cfg.num_latents, cfg.embed_dim)) * 0.1
    queries = jnp.asarray(RNG.uniform(-1, 1, (1, 64, 3)).astype(np.float32))
    logits = model.apply(params, lat, queries)
    assert logits.shape == (1, 64)
    assert np.isfinite(np.asarray(logits)).all()
    zeroed = jax.tree_util.tree_map(np.zeros_like, params)
    assert not np.allclose(np.asarray(logits),
                           np.asarray(model.apply(zeroed, lat, queries)))


# ---------------------------------------------------------------------------
# conditioner (DINOv2 under main_image_encoder.model.*, two possible namings)
# ---------------------------------------------------------------------------

def _synth_cond_timm(cfg):
    pfx = "main_image_encoder.model."
    sd = {}
    e = cfg.embed_dim
    n = (cfg.image_size // cfg.patch_size) ** 2
    _add(sd, "main_image_encoder.unconditional_embedding", 1, cfg.n_tokens, e)
    _add(sd, f"{pfx}cls_token", 1, 1, e)
    _add(sd, f"{pfx}pos_embed", 1, n + 1, e)
    _add(sd, f"{pfx}mask_token", 1, e)           # unused by inference, dropped
    _add(sd, f"{pfx}patch_embed.proj.weight", e, 3, cfg.patch_size, cfg.patch_size)
    _add(sd, f"{pfx}patch_embed.proj.bias", e)
    for i in range(cfg.depth):
        b = f"{pfx}blocks.{i}"
        _add(sd, f"{b}.norm1.weight", e)
        _add(sd, f"{b}.norm1.bias", e)
        _add(sd, f"{b}.attn.qkv.weight", 3 * e, e)
        _add(sd, f"{b}.attn.qkv.bias", 3 * e)
        _add(sd, f"{b}.attn.proj.weight", e, e)
        _add(sd, f"{b}.attn.proj.bias", e)
        _add(sd, f"{b}.ls1.gamma", e)
        _add(sd, f"{b}.norm2.weight", e)
        _add(sd, f"{b}.norm2.bias", e)
        _add(sd, f"{b}.ls2.gamma", e)
        if cfg.ffn == "swiglu":
            hid = ((int(e * 4 * 2 / 3) + 7) // 8) * 8
            _add(sd, f"{b}.mlp.w12.weight", 2 * hid, e)
            _add(sd, f"{b}.mlp.w12.bias", 2 * hid)
            _add(sd, f"{b}.mlp.w3.weight", e, hid)
            _add(sd, f"{b}.mlp.w3.bias", e)
        else:
            _add(sd, f"{b}.mlp.fc1.weight", 4 * e, e)
            _add(sd, f"{b}.mlp.fc1.bias", 4 * e)
            _add(sd, f"{b}.mlp.fc2.weight", e, 4 * e)
            _add(sd, f"{b}.mlp.fc2.bias", e)
    _add(sd, f"{pfx}norm.weight", e)
    _add(sd, f"{pfx}norm.bias", e)
    return sd


def _synth_cond_hf(cfg):
    pfx = "main_image_encoder.model."
    sd = {}
    e = cfg.embed_dim
    n = (cfg.image_size // cfg.patch_size) ** 2
    _add(sd, "main_image_encoder.unconditional_embedding", 1, cfg.n_tokens, e)
    _add(sd, f"{pfx}embeddings.cls_token", 1, 1, e)
    _add(sd, f"{pfx}embeddings.mask_token", 1, e)
    _add(sd, f"{pfx}embeddings.position_embeddings", 1, n + 1, e)
    _add(sd, f"{pfx}embeddings.patch_embeddings.projection.weight",
         e, 3, cfg.patch_size, cfg.patch_size)
    _add(sd, f"{pfx}embeddings.patch_embeddings.projection.bias", e)
    for i in range(cfg.depth):
        b = f"{pfx}encoder.layer.{i}"
        _add(sd, f"{b}.norm1.weight", e)
        _add(sd, f"{b}.norm1.bias", e)
        for qkv in ("query", "key", "value"):
            _add(sd, f"{b}.attention.attention.{qkv}.weight", e, e)
            _add(sd, f"{b}.attention.attention.{qkv}.bias", e)
        _add(sd, f"{b}.attention.output.dense.weight", e, e)
        _add(sd, f"{b}.attention.output.dense.bias", e)
        _add(sd, f"{b}.layer_scale1.lambda1", e)
        _add(sd, f"{b}.norm2.weight", e)
        _add(sd, f"{b}.norm2.bias", e)
        _add(sd, f"{b}.layer_scale2.lambda1", e)
        if cfg.ffn == "swiglu":
            hid = ((int(e * 4 * 2 / 3) + 7) // 8) * 8
            _add(sd, f"{b}.mlp.weights_in.weight", 2 * hid, e)
            _add(sd, f"{b}.mlp.weights_in.bias", 2 * hid)
            _add(sd, f"{b}.mlp.weights_out.weight", e, hid)
            _add(sd, f"{b}.mlp.weights_out.bias", e)
        else:
            _add(sd, f"{b}.mlp.fc1.weight", 4 * e, e)
            _add(sd, f"{b}.mlp.fc1.bias", 4 * e)
            _add(sd, f"{b}.mlp.fc2.weight", e, 4 * e)
            _add(sd, f"{b}.mlp.fc2.bias", e)
    _add(sd, f"{pfx}layernorm.weight", e)
    _add(sd, f"{pfx}layernorm.bias", e)
    return sd


COND_TINY_SWIGLU = ConditionerConfig(image_size=28, patch_size=14,
                                     embed_dim=32, depth=2, heads=2,
                                     ffn="swiglu", dtype=jnp.float32)


@pytest.mark.parametrize("cfg,synth", [
    (COND_TINY, _synth_cond_timm),
    (COND_TINY, _synth_cond_hf),
    (COND_TINY_SWIGLU, _synth_cond_timm),
    (COND_TINY_SWIGLU, _synth_cond_hf),
])
def test_convert_conditioner_complete_and_forward(cfg, synth):
    sd = synth(cfg)
    params, report = convert_conditioner(dict(sd), cfg)
    _assert_complete(params, report, sd)

    model = Conditioner(cfg)
    img = jnp.asarray(RNG.uniform(0, 1, (1, cfg.image_size, cfg.image_size, 3))
                      .astype(np.float32))
    out = model.apply(params, img)
    tokens = out["main"]
    assert tokens.shape == (1, cfg.n_tokens, cfg.embed_dim)
    assert np.isfinite(np.asarray(tokens)).all()
    uncond = model.apply(params, 2,
                         method=Conditioner.unconditional_embedding)["main"]
    assert uncond.shape == (2, cfg.n_tokens, cfg.embed_dim)
