"""Converter validation against the reference's torch modules (VERDICT r1 #5).

Builds the REFERENCE torch submodule at a small config with random weights,
converts the state dict with our converter, runs our Flax graph on the same
input, and asserts numerical agreement. This is the strongest available check
of layout fidelity (SURVEY §7 hard-part #4) without real checkpoints.

Skipped when /root/reference is absent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import _torch_oracles as oracles

pytestmark = pytest.mark.skipif(
    not oracles.reference_available(), reason="reference tree not available")


class _CN(dict):
    """Minimal yacs-CfgNode stand-in (attribute access + .get)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


@pytest.fixture(scope="module")
def torch():
    import torch

    torch.manual_seed(0)
    return torch


# --------------------------------------------------------------------------- #
# HaMeR MANO transformer-decoder head
# --------------------------------------------------------------------------- #

def _small_hamer_cfg():
    from followmyhold_tpu.models.hamer import HamerConfig
    from followmyhold_tpu.models.vit import ViTConfig

    return HamerConfig(
        backbone=ViTConfig(img_size=(64, 48), patch_size=16, embed_dim=48,
                           depth=2, num_heads=2, patch_padding=2,
                           pos_embed_cls_slot=True, dtype=jnp.float32),
        head_dim=32, head_depth=2, head_heads=2, head_dim_head=16,
        head_mlp_dim=64, context_dim=48, dtype=jnp.float32)


def test_hamer_mano_head_matches_reference(torch, tmp_path):
    mano_head_mod, _ = oracles.import_hamer_oracle()

    npose = 6 * 16
    npz = tmp_path / "mean.npz"
    rng = np.random.default_rng(0)
    np.savez(npz, pose=rng.normal(0, 0.3, npose).astype(np.float32),
             shape=rng.normal(0, 0.2, 10).astype(np.float32),
             cam=np.asarray([0.9, 0.0, 0.0], np.float32))

    cfg = _CN(
        MODEL=_CN(MANO_HEAD=_CN(
            TYPE="transformer_decoder", JOINT_REP="6d", IEF_ITERS=1,
            TRANSFORMER_DECODER=_CN(dim=32, depth=2, heads=2, mlp_dim=64,
                                    dim_head=16, dropout=0.0, emb_dropout=0.0,
                                    norm="layer", context_dim=48))),
        MANO=_CN(NUM_HAND_JOINTS=15, MEAN_PARAMS=str(npz)),
    )
    head_t = mano_head_mod.MANOTransformerDecoderHead(cfg).eval()

    B, hp, wp, C = 2, 3, 4, 48
    x = rng.normal(0, 1, (B, C, hp, wp)).astype(np.float32)
    with torch.no_grad():
        mano_params, pred_cam, _ = head_t(torch.from_numpy(x))

    # --- convert and run our head ---
    from followmyhold_tpu.convert.common import ConversionReport, to_mutable
    from followmyhold_tpu.convert.hamer import convert_mano_head
    from followmyhold_tpu.models.hamer import ManoHead

    fcfg = _small_hamer_cfg()
    tokens = jnp.asarray(np.transpose(x.reshape(B, C, hp * wp), (0, 2, 1)))
    head_f = ManoHead(fcfg)
    params = to_mutable(head_f.init(jax.random.key(0), tokens))
    sd = {"mano_head." + k: v.numpy() for k, v in head_t.state_dict().items()}
    report = ConversionReport()
    convert_mano_head(sd, params, fcfg, flax_prefix="params", report=report)
    assert not report.missing_src, report.missing_src
    assert not report.unused_src, report.unused_src

    go, hp_rot, betas, cam = head_f.apply(params, tokens)

    np.testing.assert_allclose(np.asarray(cam), pred_cam.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(betas),
                               mano_params["betas"].numpy(), atol=1e-5)
    # rotmats agree to ~1e-3: the Gram-Schmidt in rot6d is ill-conditioned for
    # random (near-parallel) 6d vectors; cam/betas/global_orient match at 1e-5
    np.testing.assert_allclose(np.asarray(go),
                               mano_params["global_orient"].numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(hp_rot),
                               mano_params["hand_pose"].numpy(), atol=1e-3)


# --------------------------------------------------------------------------- #
# HaMeR ViT backbone (ViTPose-style: padded patch embed, cls-slot pos embed)
# --------------------------------------------------------------------------- #

def test_hamer_vit_backbone_matches_reference(torch):
    _, vit_mod = oracles.import_hamer_oracle()

    H, W, D = 64, 48, 32
    vit_t = vit_mod.ViT(img_size=(H, W), patch_size=16, embed_dim=D, depth=2,
                        num_heads=2, mlp_ratio=4.0, qkv_bias=True, ratio=1,
                        last_norm=True)
    vit_t.eval()  # their train() override returns None; don't chain
    with torch.no_grad():
        for p in vit_t.parameters():
            p.normal_(0, 0.05)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        ref = vit_t(torch.from_numpy(x)).numpy()      # [B, C, Hp, Wp]

    from followmyhold_tpu.convert.common import ConversionReport, to_mutable
    from followmyhold_tpu.convert.vit_torch import convert_vit
    from followmyhold_tpu.models.vit import ViTConfig, ViTFeatureMap

    cfg = ViTConfig(img_size=(H, W), patch_size=16, embed_dim=D, depth=2,
                    num_heads=2, patch_padding=2, pos_embed_cls_slot=True,
                    dtype=jnp.float32)
    model = ViTFeatureMap(cfg)
    xf = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = to_mutable(model.init(jax.random.key(0), xf))
    report = ConversionReport()
    convert_vit({k: v.numpy() for k, v in vit_t.state_dict().items()},
                params, prefix="", flax_prefix="params/vit", depth=2,
                report=report)
    assert not report.missing_src, report.missing_src
    assert not report.unused_src, report.unused_src

    out = model.apply(params, xf)                      # [B, Hp, Wp, C]
    out_t = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_t, ref, atol=2e-4)


# --------------------------------------------------------------------------- #
# MoGe ConvStack (neck/heads building block)
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("resampler", ["pixel_shuffle", "bilinear"])
def test_moge_conv_stack_matches_reference(torch, resampler):
    mm = oracles.import_moge_oracle()

    dims = [32, 32, 32]
    stack_t = mm.ConvStack(
        dim_in=[12, None, 2], dim_res_blocks=dims, dim_out=3,
        resamplers=[resampler, resampler], dim_times_res_block_hidden=2,
        num_res_blocks=2)
    stack_t.eval()
    with torch.no_grad():
        for p in stack_t.parameters():
            p.normal_(0, 0.08)

    rng = np.random.default_rng(3)
    B = 2
    x0 = rng.normal(0, 1, (B, 12, 8, 8)).astype(np.float32)
    x2 = rng.normal(0, 1, (B, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        outs_t = stack_t([torch.from_numpy(x0), None, torch.from_numpy(x2)])

    from followmyhold_tpu.convert.common import ConversionReport, to_mutable
    from followmyhold_tpu.convert.moge import conv_stack, detect_conv_stack_resampler
    from followmyhold_tpu.models.moge import ConvStack

    sd = {"stack." + k: v.numpy() for k, v in stack_t.state_dict().items()}
    assert detect_conv_stack_resampler(sd, "stack") == (
        "pixel_shuffle" if resampler == "pixel_shuffle" else "bilinear")

    stack_f = ConvStack(level_dims=tuple(dims), out_dim=3, num_res_blocks=2,
                        dtype=jnp.float32, resampler=resampler, hidden_mult=2)
    inputs = [jnp.asarray(np.transpose(x0, (0, 2, 3, 1))), None,
              jnp.asarray(np.transpose(x2, (0, 2, 3, 1)))]
    params = to_mutable(stack_f.init(jax.random.key(0), inputs))
    report = ConversionReport()
    conv_stack(sd, params, "stack", "params", 3, 2, resampler, report)
    assert not report.missing_src, report.missing_src
    assert not [k for k in sd], list(sd)[:8]

    outs_f = stack_f.apply(params, inputs)
    for lvl, (of, ot) in enumerate(zip(outs_f, outs_t)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(of), (0, 3, 1, 2)), ot.numpy(),
            atol=5e-4, err_msg=f"level {lvl} ({resampler})")


def test_moge_scale_head_mlp_matches_reference(torch):
    mm = oracles.import_moge_oracle()
    mlp_t = mm.MLP([24, 32, 16, 1])
    mlp_t.eval()
    with torch.no_grad():
        for p in mlp_t.parameters():
            p.normal_(0, 0.2)

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, (2, 24)).astype(np.float32)
    with torch.no_grad():
        ref = mlp_t(torch.from_numpy(x)).numpy()

    # our scale head is inline Dense+relu chain; replicate the math directly
    # from the converted tensors to validate the scale_head mapping
    sd = {k: v.numpy() for k, v in mlp_t.state_dict().items()}
    h = x
    for i in range(2):
        h = np.maximum(h @ sd[f"{2 * i}.weight"].T + sd[f"{2 * i}.bias"], 0.0)
    out = h @ sd["4.weight"].T + sd["4.bias"]
    np.testing.assert_allclose(out, ref, atol=1e-5)


# --------------------------------------------------------------------------- #
# GroundingDINO: full tiny-model forward vs HF transformers
# --------------------------------------------------------------------------- #

def test_gdino_matches_hf_reference(torch):
    from transformers import BertConfig as HFBertConfig
    from transformers import GroundingDinoConfig as HFGDinoConfig
    from transformers import GroundingDinoForObjectDetection
    from transformers import SwinConfig as HFSwinConfig

    hf_swin = HFSwinConfig(image_size=64, patch_size=4, embed_dim=16,
                           depths=[1, 1, 1], num_heads=[1, 2, 4], window_size=4,
                           out_features=["stage2", "stage3"])
    hf_bert = HFBertConfig(vocab_size=2048, hidden_size=32, num_hidden_layers=1,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=64)
    hf_cfg = HFGDinoConfig(backbone_config=hf_swin, text_config=hf_bert,
                           d_model=32, encoder_layers=1, decoder_layers=2,
                           encoder_attention_heads=2, decoder_attention_heads=2,
                           encoder_ffn_dim=64, decoder_ffn_dim=64,
                           num_queries=12, num_feature_levels=3,
                           encoder_n_points=2, decoder_n_points=2,
                           max_text_len=16)
    torch.manual_seed(3)
    hf = GroundingDinoForObjectDetection(hf_cfg)
    hf.eval()

    rng = np.random.default_rng(7)
    pix = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    # ids with [CLS] ... '.' ... [SEP] so the special-token masking is exercised
    ids = np.asarray([[101, 7, 8, 1012, 9, 10, 11, 102]], np.int64)
    with torch.no_grad():
        out_t = hf(pixel_values=torch.from_numpy(pix),
                   input_ids=torch.from_numpy(ids))
    ref_logits = out_t.logits.numpy()
    ref_boxes = out_t.pred_boxes.numpy()

    # ---- convert + run ours ----
    import jax
    from followmyhold_tpu.convert.gdino import convert_gdino
    from followmyhold_tpu.models import gdino as G

    import dataclasses as _dc

    cfg = G.GroundingDinoConfig(
        swin=G.SWIN_TINY_TEST,
        bert=_dc.replace(G.BERT_TINY_TEST, vocab_size=2048), d_model=32,
        num_queries=12, encoder_layers=1, decoder_layers=2, encoder_heads=2,
        decoder_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        num_feature_levels=3, encoder_n_points=2, decoder_n_points=2,
        max_text_len=16, image_size=64)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, report = convert_gdino(sd, cfg)
    assert not report.missing_src, report.missing_src[:8]
    assert not report.unused_src, report.unused_src[:8]

    attn, pos_ids = G.generate_special_token_masks(ids)
    model = G.GroundingDino(cfg)
    out = model.apply(
        params,
        pixel_values=jnp.asarray(np.transpose(pix, (0, 2, 3, 1))),
        input_ids=jnp.asarray(ids, jnp.int32),
        token_type_ids=jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
        text_self_attention_masks=jnp.asarray(attn),
        position_ids=jnp.asarray(pos_ids, jnp.int32),
        text_token_mask=jnp.ones_like(jnp.asarray(ids), dtype=bool),
    )
    logits = np.asarray(out["logits"])
    boxes = np.asarray(out["pred_boxes"])

    finite = np.isfinite(ref_logits)
    assert (np.isfinite(logits) == finite).all()
    np.testing.assert_allclose(logits[finite], ref_logits[finite],
                               atol=2e-3)
    np.testing.assert_allclose(boxes, ref_boxes, atol=2e-3)


# --------------------------------------------------------------------------- #
# hand_object_detector: caffe-style ResNet backbone + head-to-tail
# --------------------------------------------------------------------------- #

def test_frcnn_resnet_backbone_matches_reference(torch):
    mod = oracles.import_frcnn_resnet_oracle()

    # the reference ResNet class hardcodes width 64; use 1 block per stage
    net = mod.ResNet(mod.Bottleneck, [1, 1, 1, 1])
    net.eval()
    with torch.no_grad():
        for p in net.parameters():
            p.normal_(0, 0.03)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (1, 3, 64, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        # RCNN_base = conv1,bn1,relu,maxpool,layer1..layer3 (resnet.py:238-240)
        h = net.relu(net.bn1(net.conv1(xt)))
        h = net.maxpool(h)
        base = net.layer3(net.layer2(net.layer1(h)))
        # _head_to_tail: layer4 then spatial mean (resnet.py:271-273)
        tail = net.layer4(base).mean(3).mean(2)
    ref_base = base.numpy()
    ref_tail = tail.numpy()

    # ---- convert (state dict renamed to the checkpoint layout) ----
    from followmyhold_tpu.convert.hand_object import convert_hand_object
    from followmyhold_tpu.models.hand_object_detector import (
        FrcnnConfig,
        FusedConv,
        HandObjectDetector,
        ResNetStage,
    )
    import flax.linen as nn_flax

    sd = {}
    for k, v in net.state_dict().items():
        if k.startswith("conv1."):
            sd[k.replace("conv1", "RCNN_base.0")] = v.numpy()
        elif k.startswith("bn1."):
            sd[k.replace("bn1", "RCNN_base.1")] = v.numpy()
        elif k.startswith(("layer1.", "layer2.", "layer3.")):
            idx = {"layer1": 4, "layer2": 5, "layer3": 6}[k.split(".")[0]]
            sd[f"RCNN_base.{idx}." + k.split(".", 1)[1]] = v.numpy()
        elif k.startswith("layer4."):
            sd["RCNN_top.0." + k.split(".", 1)[1]] = v.numpy()
        # fc ignored

    cfg = FrcnnConfig(width=64, stage_blocks=(1, 1, 1, 1),
                      pre_nms_top_n=64, post_nms_top_n=8, dtype=jnp.float32)
    params, report = convert_hand_object(sd, cfg, init_size=64)
    backbone_missing = [m for m in report.missing_src
                        if m.startswith(("RCNN_base", "RCNN_top"))]
    assert not backbone_missing, backbone_missing[:8]
    assert not report.unused_src, report.unused_src[:8]

    # run just the backbone part of our model on the same input
    class BaseOnly(nn_flax.Module):
        cfg: FrcnnConfig

        @nn_flax.compact
        def __call__(self, image):
            c = self.cfg
            h = nn_flax.relu(FusedConv(c.width, 7, 2, c.dtype, name="conv1")(
                image[None].astype(c.dtype)))
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            h = nn_flax.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
            h = ResNetStage(c.width, c.stage_blocks[0], 1, c.dtype,
                            name="layer1")(h)
            h = ResNetStage(c.width * 2, c.stage_blocks[1], 2, c.dtype,
                            name="layer2")(h)
            base = ResNetStage(c.width * 4, c.stage_blocks[2], 2, c.dtype,
                               name="layer3")(h)
            tail = ResNetStage(c.width * 8, c.stage_blocks[3], 2, c.dtype,
                               name="layer4")(base)
            return base, tail.mean(axis=(1, 2))

    sub = {"params": {k: params["params"][k] for k in
                      ("conv1", "layer1", "layer2", "layer3", "layer4")}}
    base_f, tail_f = BaseOnly(cfg).apply(
        sub, jnp.asarray(np.transpose(x[0], (1, 2, 0))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(base_f[0]), (2, 0, 1)), ref_base[0],
        atol=2e-3)
    np.testing.assert_allclose(np.asarray(tail_f), ref_tail, atol=2e-3)


# --------------------------------------------------------------------------- #
# FLUX text towers: CLIP-L and T5 encoder vs HF transformers
# --------------------------------------------------------------------------- #

def test_clip_text_matches_hf_reference(torch):
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel as HFModel

    torch.manual_seed(5)
    hf = HFModel(HFCfg(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=2, intermediate_size=64,
                       max_position_embeddings=24, eos_token_id=999,
                       bos_token_id=998))
    hf.eval()
    ids = np.asarray([[998, 5, 6, 7, 999, 0, 0, 0]], np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids))
    ref_h = out.last_hidden_state.numpy()
    ref_p = out.pooler_output.numpy()

    from followmyhold_tpu.convert.flux_text import convert_clip_text
    from followmyhold_tpu.models.clip_text import CLIP_TINY_TEST, ClipTextModel

    params, report = convert_clip_text(
        {k: v.numpy() for k, v in hf.state_dict().items()}, CLIP_TINY_TEST)
    assert not report.missing_src, report.missing_src[:6]
    assert not report.unused_src, report.unused_src[:6]
    h, p = ClipTextModel(CLIP_TINY_TEST).apply(
        params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p), ref_p, atol=2e-4)


def test_t5_encoder_matches_hf_reference(torch):
    from transformers import T5Config as HFCfg
    from transformers import T5EncoderModel as HFModel

    torch.manual_seed(6)
    hf = HFModel(HFCfg(vocab_size=500, d_model=32, d_kv=8, d_ff=64,
                       num_layers=2, num_heads=4, feed_forward_proj="gated-gelu",
                       is_encoder_decoder=False))
    hf.eval()
    ids = np.asarray([[3, 14, 15, 92, 65, 1]], np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    from followmyhold_tpu.convert.flux_text import convert_t5_encoder
    from followmyhold_tpu.models.t5 import T5_TINY_TEST, T5Encoder

    params, report = convert_t5_encoder(
        {k: v.numpy() for k, v in hf.state_dict().items()}, T5_TINY_TEST)
    assert not report.missing_src, report.missing_src[:6]
    assert not report.unused_src, report.unused_src[:6]
    h = T5Encoder(T5_TINY_TEST).apply(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(h), ref, atol=3e-4)


# --------------------------------------------------------------------------- #
# MoGe DINOv2 encoder (cls token, LayerScale, normed intermediates,
# offset pos-embed interpolation)
# --------------------------------------------------------------------------- #

def test_moge_dinov2_encoder_matches_reference(torch):
    """get_intermediate_layers parity: DINOv2 applies the FINAL norm to every
    collected layer (norm=True default, relied on by MoGe's DINOv2Encoder)
    and interpolates pos embeds with the interpolate_offset=0.1 quirk — both
    reproduced in models/vit.ViT."""
    vt = oracles.import_dinov2_oracle()

    D, depth, heads = 32, 2, 2
    m = vt.DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=D, depth=depth,
        num_heads=heads, mlp_ratio=4.0, init_values=1e-5, block_chunks=0)
    m.eval()
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(0, 0.05)

    from followmyhold_tpu.convert.common import ConversionReport, to_mutable
    from followmyhold_tpu.convert.vit_torch import convert_vit
    from followmyhold_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(img_size=(518, 518), patch_size=14, embed_dim=D,
                    depth=depth, num_heads=heads, use_cls_token=True,
                    layerscale_init=1e-5, pos_interp_offset=0.1,
                    dtype=jnp.float32)
    model = ViT(cfg)

    # MoGe-style non-square input -> pos interpolation path is ACTIVE
    bh, bw = 6, 8
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, 3, bh * 14, bw * 14)).astype(np.float32)
    with torch.no_grad():
        feats = m.get_intermediate_layers(torch.from_numpy(x), n=[0, 1],
                                          return_class_token=True)

    xf = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = to_mutable(model.init(jax.random.key(0), xf, out_layers=[0, 1]))
    report = ConversionReport()
    convert_vit({k: v.numpy() for k, v in m.state_dict().items()},
                params, prefix="", flax_prefix="params", depth=depth,
                report=report)
    assert not report.missing_src, report.missing_src
    # dinov2's mask_token is inference-unused
    assert set(report.unused_src) <= {"mask_token"}, report.unused_src

    inter, _final, cls = model.apply(params, xf, out_layers=[0, 1])

    for ours, (ref_tok, ref_cls) in zip(inter, feats):
        np.testing.assert_allclose(np.asarray(ours), ref_tok.numpy(),
                                   atol=3e-4)
    np.testing.assert_allclose(np.asarray(cls), feats[-1][1].numpy(),
                               atol=3e-4)

    # matched square grid -> interpolation inactive -> tight tolerance
    xs = rng.normal(0, 1, (1, 3, 518, 518)).astype(np.float32)
    with torch.no_grad():
        feats_s = m.get_intermediate_layers(torch.from_numpy(xs), n=[1],
                                            return_class_token=True)
    ours_s, _, _ = model.apply(
        params, jnp.asarray(np.transpose(xs, (0, 2, 3, 1))), out_layers=[1])
    np.testing.assert_allclose(np.asarray(ours_s[0]), feats_s[0][0].numpy(),
                               atol=3e-4)


def test_dinov2_swiglu_cls_sequence_matches_reference(torch):
    """The Hunyuan conditioner path: DINOv2-giant-style SwiGLU FFN, full
    cls+patch output sequence (keep_prefix=True == HF last_hidden_state)."""
    vt = oracles.import_dinov2_oracle()

    D, depth, heads = 32, 2, 2
    m = vt.DinoVisionTransformer(
        img_size=28, patch_size=14, embed_dim=D, depth=depth,
        num_heads=heads, mlp_ratio=4.0, init_values=1e-5,
        ffn_layer="swiglufused", block_chunks=0)
    m.eval()
    with torch.no_grad():
        for p in m.parameters():
            p.normal_(0, 0.05)

    from followmyhold_tpu.convert.common import ConversionReport, to_mutable
    from followmyhold_tpu.convert.vit_torch import convert_vit
    from followmyhold_tpu.models.vit import ViT, ViTConfig

    cfg = ViTConfig(img_size=(28, 28), patch_size=14, embed_dim=D,
                    depth=depth, num_heads=heads, use_cls_token=True,
                    layerscale_init=1e-5, ffn="swiglu", dtype=jnp.float32)
    model = ViT(cfg)

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        feats = m.get_intermediate_layers(torch.from_numpy(x), n=[depth - 1],
                                          return_class_token=True)
    ref_patches, ref_cls = feats[0][0].numpy(), feats[0][1].numpy()

    xf = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = to_mutable(model.init(jax.random.key(0), xf))
    report = ConversionReport()
    convert_vit({k: v.numpy() for k, v in m.state_dict().items()},
                params, prefix="", flax_prefix="params", depth=depth,
                report=report)
    assert not report.missing_src, report.missing_src
    assert set(report.unused_src) <= {"mask_token"}, report.unused_src

    seq = model.apply(params, xf, keep_prefix=True)     # [B, 1+N, D]
    np.testing.assert_allclose(np.asarray(seq[:, 0]), ref_cls, atol=3e-4)
    np.testing.assert_allclose(np.asarray(seq[:, 1:]), ref_patches, atol=3e-4)


def test_moge_focal_shift_solver_matches_reference(torch):
    """recover_focal_shift vs the reference scipy solver (geometry_numpy.
    solve_optimal_focal_shift — the torch production path defers to it per
    batch item, geometry_torch.py:115-169) on a synthetic affine point map
    with known ground truth."""
    import importlib

    oracles._install_stubs()
    sys.path.insert(0, os.path.join(oracles.REFERENCE, "third_party/MoGe"))
    gnp = importlib.import_module("moge.utils.geometry_numpy")

    from followmyhold_tpu.models.moge import (
        normalized_view_plane_uv,
        recover_focal_shift,
    )

    H, W = 48, 64
    f_gt, s_gt = 1.7, 0.8
    uv = np.asarray(normalized_view_plane_uv(H, W))            # [H,W,2]
    rng = np.random.default_rng(2)
    # well-spread depths: the reference's UNCONSTRAINED scipy LM (x0=0) can
    # wander into z + shift < 0 on harder instances and return a bogus
    # optimum our bracketed golden-section solver correctly avoids — the
    # cross-check uses a benign instance; ground truth is asserted for both
    z = rng.uniform(1.0, 3.0, (H, W))
    xy = uv * (z / f_gt)[..., None]
    pts = np.concatenate([xy, (z - s_gt)[..., None]], -1).astype(np.float32)

    # reference (correct unpack order: solve returns (shift, focal))
    ref_shift, ref_focal = gnp.solve_optimal_focal_shift(
        uv.reshape(-1, 2), pts.reshape(-1, 3))

    f, s = recover_focal_shift(jnp.asarray(pts)[None])
    np.testing.assert_allclose(float(f[0]), float(ref_focal), rtol=2e-3)
    np.testing.assert_allclose(float(s[0]), float(ref_shift), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(float(f[0]), f_gt, rtol=5e-3)
    np.testing.assert_allclose(float(s[0]), s_gt, rtol=5e-3, atol=5e-3)

    # known-focal variant (fov from MoGe fov.json drives this path)
    s_only = recover_focal_shift(jnp.asarray(pts)[None],
                                 focal=jnp.asarray([f_gt]))[1]
    ref_s_only = gnp.solve_optimal_shift(uv.reshape(-1, 2),
                                         pts.reshape(-1, 3), f_gt)
    np.testing.assert_allclose(float(s_only[0]), float(ref_s_only),
                               rtol=2e-3, atol=2e-3)


def test_hamer_camera_math_matches_reference(torch):
    """cam_crop_to_full (renderer.py:12-22) and perspective_projection
    (geometry.py:64) vs the reference torch implementations on random
    inputs — the weak-persp -> full-image translation feeds every exported
    keypoint/overlay artifact."""
    import importlib

    oracles._install_stubs()
    sys.path.insert(0, os.path.join(oracles.REFERENCE,
                                    "third_party/estimator/hamer"))
    ref_r = importlib.import_module("hamer.utils.renderer")
    ref_g = importlib.import_module("hamer.utils.geometry")

    from followmyhold_tpu.ops.camera import cam_crop_to_full, perspective_projection

    rng = np.random.default_rng(4)
    B = 5
    cam_bbox = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    cam_bbox[:, 0] += 1.0                         # s > 0
    box_center = rng.uniform(100, 400, (B, 2)).astype(np.float32)
    box_size = rng.uniform(80, 250, B).astype(np.float32)
    img_size = np.tile(np.asarray([[640.0, 480.0]], np.float32), (B, 1))
    focal = 5000.0

    ref = ref_r.cam_crop_to_full(
        torch.from_numpy(cam_bbox), torch.from_numpy(box_center),
        torch.from_numpy(box_size), torch.from_numpy(img_size), focal).numpy()
    ours = np.asarray(cam_crop_to_full(
        jnp.asarray(cam_bbox), jnp.asarray(box_center), jnp.asarray(box_size),
        jnp.asarray(img_size), focal))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    pts = rng.normal(0, 0.2, (B, 21, 3)).astype(np.float32)
    trans = ref + 0.0
    f2 = np.tile(np.asarray([[focal, focal]], np.float32), (B, 1))
    cc = img_size / 2
    ref_uv = ref_g.perspective_projection(
        torch.from_numpy(pts),
        translation=torch.from_numpy(trans),
        focal_length=torch.from_numpy(f2) ,
        camera_center=torch.from_numpy(cc)).numpy()
    ours_uv = np.asarray(perspective_projection(
        jnp.asarray(pts), jnp.asarray(trans), jnp.asarray(f2),
        jnp.asarray(cc)))
    np.testing.assert_allclose(ours_uv, ref_uv, rtol=1e-4, atol=1e-4)


def test_frcnn_bbox_transform_matches_reference(torch):
    """decode_deltas vs the reference's bbox_transform_inv
    (lib/model/rpn/bbox_transform.py) — the box-decode math every detector
    output passes through."""
    import importlib.util

    oracles._install_stubs()
    path = os.path.join(
        oracles.REFERENCE,
        "third_party/estimator/hand_object_detector/lib/model/rpn/"
        "bbox_transform.py")
    spec = importlib.util.spec_from_file_location("ref_bbox", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from followmyhold_tpu.models.hand_object_detector import decode_deltas

    rng = np.random.default_rng(6)
    n = 64
    x1 = rng.uniform(0, 500, n)
    y1 = rng.uniform(0, 400, n)
    boxes = np.stack([x1, y1, x1 + rng.uniform(5, 200, n),
                      y1 + rng.uniform(5, 200, n)], -1).astype(np.float32)
    deltas = rng.normal(0, 0.3, (n, 4)).astype(np.float32)

    ref_out = ref.bbox_transform_inv(torch.from_numpy(boxes)[None],
                                     torch.from_numpy(deltas)[None], 1)
    ours = np.asarray(decode_deltas(jnp.asarray(boxes), jnp.asarray(deltas)))
    np.testing.assert_allclose(ours, ref_out[0].numpy(), rtol=1e-4, atol=1e-3)


def test_frcnn_generate_anchors_matches_reference(torch):
    """generate_anchors vs the reference's numpy implementation at the
    detector's configured scales/ratios."""
    import importlib.util

    path = os.path.join(
        oracles.REFERENCE,
        "third_party/estimator/hand_object_detector/lib/model/rpn/"
        "generate_anchors.py")
    spec = importlib.util.spec_from_file_location("ref_anchors", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    from followmyhold_tpu.models.hand_object_detector import generate_anchors

    ref_a = ref.generate_anchors(base_size=16, ratios=[0.5, 1, 2],
                                 scales=np.asarray([4, 8, 16, 32]))
    ours = np.asarray(generate_anchors(16, (0.5, 1.0, 2.0), (4, 8, 16, 32)))
    np.testing.assert_allclose(ours, ref_a, atol=1e-5)


def test_guidance_math_matches_reference_pipelines(torch):
    """Core guidance math vs the reference's patched pipelines.py, imported
    directly: grid convention, MANO->OpenPose keypoints, normal-alignment
    loss, and the around-center scale/rotate/translate transform."""
    ref = oracles.import_reference_pipelines()

    from followmyhold_tpu.models.mano import mano_vert_to_3dkps
    from followmyhold_tpu.ops.grid import generate_dense_grid_points
    from followmyhold_tpu.ops.losses import normal_alignment_loss
    from followmyhold_tpu.ops.transforms import transform_around_center_w_scale

    rng = np.random.default_rng(8)

    # grid convention (pipelines.py:341-360)
    xyz_r, size_r, length_r = ref.generate_dense_grid_points(
        np.asarray([-1.1] * 3), np.asarray([1.1] * 3), octree_depth=6,
        octree_resolution=16)
    xyz_o, size_o, length_o = generate_dense_grid_points(
        [-1.1] * 3, [1.1] * 3, 16)
    np.testing.assert_allclose(np.asarray(xyz_o), xyz_r, atol=1e-6)
    assert list(size_o) == list(size_r)

    # MANO keypoints (pipelines.py:121-135)
    verts = rng.normal(0, 0.1, (778, 3)).astype(np.float32)
    jreg = rng.uniform(0, 1, (16, 778)).astype(np.float32)
    jreg /= jreg.sum(1, keepdims=True)

    class _Mesh:
        def verts_packed(self):
            return torch.from_numpy(verts)

        def verts_padded(self):
            return torch.from_numpy(verts)[None]

        def update_padded(self, v):
            return v[0]

    ref_kps = ref.mano_vert_to_3dkps(_Mesh(), torch.from_numpy(jreg),
                                     "cpu").numpy()
    ours_kps = np.asarray(mano_vert_to_3dkps(jnp.asarray(verts),
                                             jnp.asarray(jreg)))
    np.testing.assert_allclose(ours_kps, ref_kps, atol=1e-6)

    # normal alignment loss (pipelines.py:178-186)
    n1 = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    n2 = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    mask = rng.uniform(size=(32, 32)) > 0.5
    ref_l = float(ref.normal_alignment_loss(torch.from_numpy(n1),
                                            torch.from_numpy(n2),
                                            torch.from_numpy(mask)))
    ours_l = float(normal_alignment_loss(jnp.asarray(n1), jnp.asarray(n2),
                                         jnp.asarray(mask)))
    np.testing.assert_allclose(ours_l, ref_l, rtol=1e-5)

    # around-center transform (pipelines.py:108-118)
    T = np.eye(4, dtype=np.float32)
    ang = 0.7
    T[:3, :3] = np.asarray([[np.cos(ang), -np.sin(ang), 0],
                            [np.sin(ang), np.cos(ang), 0],
                            [0, 0, 1]], np.float32)
    T[:3, 3] = [0.1, -0.2, 0.05]
    ref_v = ref.transform_mesh_around_center_w_scale(
        _Mesh(), torch.from_numpy(T), 1.3).numpy()
    ours_v = np.asarray(transform_around_center_w_scale(
        jnp.asarray(verts), jnp.asarray(T), jnp.asarray(1.3)))
    np.testing.assert_allclose(ours_v, ref_v, atol=1e-5)
