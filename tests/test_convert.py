"""Weight-conversion roundtrip tests with synthetic torch-layout state dicts.

Builds a torch-style state dict FROM a randomly initialized torch-free
synthetic source, converts, and verifies (a) every tensor lands, (b) a
forward pass uses the converted values (kernel transposes correct by
numerical check against a manual matmul).
"""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.common import ConversionReport, dense_kernel
from followmyhold_tpu.convert.hamer import convert_hamer
from followmyhold_tpu.convert.vit_torch import convert_vit
from followmyhold_tpu.models.hamer import HamerConfig
from followmyhold_tpu.models.vit import ViT, ViTConfig
from followmyhold_tpu.models.mano import synthetic_mano
from followmyhold_tpu.convert.common import to_mutable

TINY_VIT = ViTConfig(img_size=(32, 32), patch_size=16, embed_dim=16, depth=2,
                     num_heads=2, dtype=jnp.float32)


def synth_vit_torch_sd(cfg: ViTConfig, rng):
    """Torch-layout state dict with random values for our tiny ViT."""
    d = cfg.embed_dim
    sd = {
        "patch_embed.proj.weight": rng.normal(size=(d, 3, cfg.patch_size, cfg.patch_size)),
        "patch_embed.proj.bias": rng.normal(size=(d,)),
        "pos_embed": rng.normal(size=(1, cfg.num_patches, d)),
        "norm.weight": rng.normal(size=(d,)),
        "norm.bias": rng.normal(size=(d,)),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        sd.update({
            b + "norm1.weight": rng.normal(size=(d,)),
            b + "norm1.bias": rng.normal(size=(d,)),
            b + "attn.qkv.weight": rng.normal(size=(3 * d, d)),
            b + "attn.qkv.bias": rng.normal(size=(3 * d,)),
            b + "attn.proj.weight": rng.normal(size=(d, d)),
            b + "attn.proj.bias": rng.normal(size=(d,)),
            b + "norm2.weight": rng.normal(size=(d,)),
            b + "norm2.bias": rng.normal(size=(d,)),
            b + "mlp.fc1.weight": rng.normal(size=(4 * d, d)),
            b + "mlp.fc1.bias": rng.normal(size=(4 * d,)),
            b + "mlp.fc2.weight": rng.normal(size=(d, 4 * d)),
            b + "mlp.fc2.bias": rng.normal(size=(d,)),
        })
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_convert_vit_complete_and_numerically_used():
    rng = np.random.default_rng(0)
    sd = synth_vit_torch_sd(TINY_VIT, rng)

    model = ViT(TINY_VIT)
    x = jnp.ones((1, 32, 32, 3)) * 0.3
    params = to_mutable(model.init(jax.random.key(0), x))
    before = np.asarray(model.apply(params, x))

    report = convert_vit(sd, params, prefix="", flax_prefix="params")
    assert not report.missing_src, report.missing_src
    assert not report.unused_src, report.unused_src
    # per-layer tensors stack into one leading-depth tensor each
    assert params["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"].shape[0] \
        == TINY_VIT.depth

    after = np.asarray(model.apply(params, x))
    assert np.abs(after - before).max() > 1e-3  # weights actually changed

    # numerical check of the qkv transpose: first block, first token
    # reproduce patch embed + pos + norm1 + qkv manually
    patch = params["params"]["patch_embed"]
    tok = jax.lax.conv_general_dilated(
        np.asarray(x), jnp.asarray(patch["kernel"]), (16, 16), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + patch["bias"]
    tok = tok.reshape(1, -1, 16) + params["params"]["pos_embed"]
    h = tok[0, 0]
    mean = h.mean()
    var = h.var()
    hn = (h - mean) / np.sqrt(var + 1e-6)
    blk = params["params"]["blocks"]["block"]  # stacked [depth, ...]
    hn = hn * blk["norm1"]["scale"][0] + blk["norm1"]["bias"][0]
    qkv_manual = hn @ blk["attn"]["qkv"]["kernel"][0] + blk["attn"]["qkv"]["bias"][0]
    qkv_torch = np.asarray(sd["blocks.0.attn.qkv.weight"]) @ np.asarray(hn) + sd[
        "blocks.0.attn.qkv.bias"]
    np.testing.assert_allclose(np.asarray(qkv_manual), qkv_torch, rtol=1e-4, atol=1e-5)


def test_convert_hamer_structure():
    cfg = HamerConfig(
        backbone=ViTConfig(img_size=(64, 48), patch_size=16, embed_dim=16,
                           depth=1, num_heads=2, dtype=jnp.float32),
        head_dim=16, head_depth=1, head_heads=2, head_dim_head=8,
        head_mlp_dim=16, context_dim=16, image_size=64, dtype=jnp.float32)
    rng = np.random.default_rng(1)

    sd = {f"backbone.{k}": v for k, v in
          synth_vit_torch_sd(cfg.backbone, rng).items()}
    inner = cfg.head_heads * cfg.head_dim_head
    sd.update({
        "mano_head.decpose.weight": rng.normal(size=(96, 16)).astype(np.float32),
        "mano_head.decpose.bias": rng.normal(size=(96,)).astype(np.float32),
        "mano_head.decshape.weight": rng.normal(size=(10, 16)).astype(np.float32),
        "mano_head.decshape.bias": rng.normal(size=(10,)).astype(np.float32),
        "mano_head.deccam.weight": rng.normal(size=(3, 16)).astype(np.float32),
        "mano_head.deccam.bias": rng.normal(size=(3,)).astype(np.float32),
        "mano_head.init_hand_pose": rng.normal(size=(1, 96)).astype(np.float32),
        "mano_head.init_betas": rng.normal(size=(1, 10)).astype(np.float32),
        "mano_head.init_cam": rng.normal(size=(1, 3)).astype(np.float32),
        "mano_head.transformer.to_token_embedding.weight":
            rng.normal(size=(16, 1)).astype(np.float32),
        "mano_head.transformer.to_token_embedding.bias":
            np.zeros(16, np.float32),
        "mano_head.transformer.pos_embedding":
            rng.normal(size=(1, 1, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.0.norm.weight": np.ones(16, np.float32),
        "mano_head.transformer.transformer.layers.0.0.norm.bias": np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.0.fn.to_qkv.weight":
            rng.normal(size=(3 * inner, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.0.fn.to_out.0.weight":
            rng.normal(size=(16, inner)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.0.fn.to_out.0.bias":
            np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.1.norm.weight": np.ones(16, np.float32),
        "mano_head.transformer.transformer.layers.0.1.norm.bias": np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.1.fn.to_q.weight":
            rng.normal(size=(inner, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.1.fn.to_kv.weight":
            rng.normal(size=(2 * inner, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.1.fn.to_out.0.weight":
            rng.normal(size=(16, inner)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.1.fn.to_out.0.bias":
            np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.2.norm.weight": np.ones(16, np.float32),
        "mano_head.transformer.transformer.layers.0.2.norm.bias": np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.2.fn.net.0.weight":
            rng.normal(size=(16, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.2.fn.net.0.bias":
            np.zeros(16, np.float32),
        "mano_head.transformer.transformer.layers.0.2.fn.net.3.weight":
            rng.normal(size=(16, 16)).astype(np.float32),
        "mano_head.transformer.transformer.layers.0.2.fn.net.3.bias":
            np.zeros(16, np.float32),
    })

    params, report = convert_hamer(sd, cfg)
    assert not report.missing_src, report.missing_src[:5]
    assert not report.unused_src, report.unused_src[:5]

    # converted params drive a working forward pass
    from followmyhold_tpu.models.hamer import Hamer, hamer_forward

    model = Hamer(cfg)
    out = hamer_forward(model, params, synthetic_mano(),
                        jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out.vertices)).all()
