"""ViTPose converter layout test (exact official-repo names, tiny config).

ViTPose's state dict uses timm-style ViT naming under backbone.* plus the
classic top-down head (deconv_layers with BatchNorms, final_layer); BN folds
into per-channel affine params at conversion (inference semantics)."""

import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.vitpose import convert_vitpose
from followmyhold_tpu.models.vitpose import VITPOSE_TINY, ViTPose

RNG = np.random.default_rng(0)


def _add(sd, name, *shape):
    sd[name] = RNG.normal(0, 0.05, shape).astype(np.float32)


def _synth_vitpose_sd(cfg):
    sd = {}
    b = cfg.backbone
    e = b.embed_dim
    np_tokens = (b.img_size[0] // b.patch_size) * (b.img_size[1] // b.patch_size)
    _add(sd, "backbone.patch_embed.proj.weight", e, 3, b.patch_size, b.patch_size)
    _add(sd, "backbone.patch_embed.proj.bias", e)
    _add(sd, "backbone.pos_embed", 1, np_tokens + 1, e)   # cls SLOT kept
    for i in range(b.depth):
        blk = f"backbone.blocks.{i}"
        _add(sd, f"{blk}.norm1.weight", e)
        _add(sd, f"{blk}.norm1.bias", e)
        _add(sd, f"{blk}.attn.qkv.weight", 3 * e, e)
        _add(sd, f"{blk}.attn.qkv.bias", 3 * e)
        _add(sd, f"{blk}.attn.proj.weight", e, e)
        _add(sd, f"{blk}.attn.proj.bias", e)
        _add(sd, f"{blk}.norm2.weight", e)
        _add(sd, f"{blk}.norm2.bias", e)
        _add(sd, f"{blk}.mlp.fc1.weight", 4 * e, e)
        _add(sd, f"{blk}.mlp.fc1.bias", 4 * e)
        _add(sd, f"{blk}.mlp.fc2.weight", e, 4 * e)
        _add(sd, f"{blk}.mlp.fc2.bias", e)
    _add(sd, "backbone.last_norm.weight", e)
    _add(sd, "backbone.last_norm.bias", e)

    dc = cfg.deconv_channels
    prev = e
    for i in range(cfg.num_deconv):
        dl = 3 * i
        _add(sd, f"keypoint_head.deconv_layers.{dl}.weight", prev, dc, 4, 4)
        _add(sd, f"keypoint_head.deconv_layers.{dl + 1}.weight", dc)
        _add(sd, f"keypoint_head.deconv_layers.{dl + 1}.bias", dc)
        sd[f"keypoint_head.deconv_layers.{dl + 1}.running_mean"] = \
            RNG.normal(0, 0.1, dc).astype(np.float32)
        sd[f"keypoint_head.deconv_layers.{dl + 1}.running_var"] = \
            RNG.uniform(0.5, 1.5, dc).astype(np.float32)
        sd[f"keypoint_head.deconv_layers.{dl + 1}.num_batches_tracked"] = \
            np.asarray(100)
        prev = dc
    _add(sd, "keypoint_head.final_layer.weight", cfg.num_keypoints, dc, 1, 1)
    _add(sd, "keypoint_head.final_layer.bias", cfg.num_keypoints)
    return sd


def test_convert_vitpose_complete_and_forward():
    cfg = VITPOSE_TINY
    sd = _synth_vitpose_sd(cfg)
    params, report = convert_vitpose(dict(sd), cfg)
    assert report.missing_src == [], report.missing_src[:10]
    assert report.unused_src == [], report.unused_src[:10]

    model = ViTPose(cfg)
    ih, iw = cfg.backbone.img_size
    hm = model.apply(params, jnp.ones((1, ih, iw, 3)) * 0.2)
    assert hm.shape == (1, ih // 4, iw // 4, cfg.num_keypoints)
    assert np.isfinite(np.asarray(hm)).all()

    # BN folding sanity: scale = gamma/sqrt(var+eps), bias = beta - mean*scale
    g = sd["keypoint_head.deconv_layers.1.weight"]
    v = sd["keypoint_head.deconv_layers.1.running_var"]
    m = sd["keypoint_head.deconv_layers.1.running_mean"]
    be = sd["keypoint_head.deconv_layers.1.bias"]
    scale = g / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(params["params"]["bn0_scale"], scale, rtol=1e-6)
    np.testing.assert_allclose(params["params"]["bn0_bias"], be - m * scale,
                               rtol=1e-5, atol=1e-7)


# --------------------------------------------------------------------------- #
# full numeric oracle: reference torch ViT + exact mmpose head semantics
# --------------------------------------------------------------------------- #

def test_vitpose_full_forward_matches_torch():
    """End-to-end ViTPose numeric parity: the backbone is the reference's
    vendored ViT (hamer vit.py, same ViTPose-derived class), the head is the
    mmpose TopdownHeatmapSimpleHead contract written directly in torch
    (ConvTranspose2d k=4 s=2 p=1 bias=False + eval-mode BN + ReLU, twice,
    then a 1x1 final conv). Catches deconv padding/flip and BN-fold errors
    the layout test cannot."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import _torch_oracles as oracles

    if not oracles.reference_available():
        import pytest

        pytest.skip("reference tree not available")
    import torch

    _, vit_mod = oracles.import_hamer_oracle()

    cfg = VITPOSE_TINY
    b = cfg.backbone
    (ih, iw), e, dc, K = b.img_size, b.embed_dim, cfg.deconv_channels, \
        cfg.num_keypoints

    vit_t = vit_mod.ViT(img_size=(ih, iw), patch_size=16, embed_dim=e,
                        depth=b.depth, num_heads=b.num_heads, mlp_ratio=4.0,
                        qkv_bias=True, ratio=1, last_norm=True)
    vit_t.eval()

    head_t = torch.nn.Sequential(
        torch.nn.ConvTranspose2d(e, dc, 4, stride=2, padding=1, bias=False),
        torch.nn.BatchNorm2d(dc),
        torch.nn.ReLU(inplace=True),
        torch.nn.ConvTranspose2d(dc, dc, 4, stride=2, padding=1, bias=False),
        torch.nn.BatchNorm2d(dc),
        torch.nn.ReLU(inplace=True),
        torch.nn.Conv2d(dc, K, 1),
    ).eval()
    torch.manual_seed(0)
    with torch.no_grad():
        for p in vit_t.parameters():
            p.normal_(0, 0.05)
        for p in head_t.parameters():
            p.normal_(0, 0.05)
        for m in head_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (2, 3, ih, iw)).astype(np.float32)
    with torch.no_grad():
        ref = head_t(vit_t(torch.from_numpy(x))).numpy()   # [B, K, h, w]

    # assemble the official-format state dict from both torch modules
    sd = {f"backbone.{k}": v.numpy() for k, v in vit_t.state_dict().items()}
    for dl, mod in ((0, head_t[0]), (3, head_t[3])):
        sd[f"keypoint_head.deconv_layers.{dl}.weight"] = mod.weight.detach().numpy()
        bn = head_t[dl + 1]
        sd[f"keypoint_head.deconv_layers.{dl + 1}.weight"] = bn.weight.detach().numpy()
        sd[f"keypoint_head.deconv_layers.{dl + 1}.bias"] = bn.bias.detach().numpy()
        sd[f"keypoint_head.deconv_layers.{dl + 1}.running_mean"] = \
            bn.running_mean.numpy()
        sd[f"keypoint_head.deconv_layers.{dl + 1}.running_var"] = \
            bn.running_var.numpy()
    sd["keypoint_head.final_layer.weight"] = head_t[6].weight.detach().numpy()
    sd["keypoint_head.final_layer.bias"] = head_t[6].bias.detach().numpy()

    params, report = convert_vitpose(sd, cfg)
    assert not report.missing_src, report.missing_src[:10]
    assert not report.unused_src, report.unused_src[:10]

    out = ViTPose(cfg).apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               ref, atol=3e-4)
