"""SAM-2 model + converter tests (tiny config).

No sam2 source is available offline, so the converter is validated for
LAYOUT COMPLETENESS: a synthetic state dict with the exact
facebookresearch/sam2 tensor names/shapes must map 100% (no missing, no
unused) and drive a working forward pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followmyhold_tpu.models.sam2 import SAM2_TINY_TEST, Sam2, segment_box


def _synth_sam2_sd(cfg, rng):
    """Exact sam2.1 checkpoint names/shapes for the given config."""
    sd = {}

    def add(name, *shape):
        sd[name] = rng.normal(0, 0.05, shape).astype(np.float32)

    e = cfg.embed_dim
    tr = "image_encoder.trunk"
    add(f"{tr}.patch_embed.proj.weight", e, 3, 7, 7)
    add(f"{tr}.patch_embed.proj.bias", e)
    add(f"{tr}.pos_embed", 1, e, *cfg.window_pos_embed_bkg_spatial_size)
    add(f"{tr}.pos_embed_window", 1, e, cfg.window_spec[0], cfg.window_spec[0])

    total = int(np.sum(cfg.stages))
    q_pool = set(np.cumsum(cfg.stages)[:-1].tolist())
    dim = e
    for i in range(total):
        dim_out = dim * 2 if i in q_pool else dim
        b = f"{tr}.blocks.{i}"
        add(f"{b}.norm1.weight", dim)
        add(f"{b}.norm1.bias", dim)
        add(f"{b}.attn.qkv.weight", 3 * dim_out, dim)
        add(f"{b}.attn.qkv.bias", 3 * dim_out)
        add(f"{b}.attn.proj.weight", dim_out, dim_out)
        add(f"{b}.attn.proj.bias", dim_out)
        add(f"{b}.norm2.weight", dim_out)
        add(f"{b}.norm2.bias", dim_out)
        add(f"{b}.mlp.layers.0.weight", 4 * dim_out, dim_out)
        add(f"{b}.mlp.layers.0.bias", 4 * dim_out)
        add(f"{b}.mlp.layers.1.weight", dim_out, 4 * dim_out)
        add(f"{b}.mlp.layers.1.bias", dim_out)
        if i in q_pool:
            add(f"{b}.proj.weight", dim_out, dim)
            add(f"{b}.proj.bias", dim_out)
        dim = dim_out

    d = cfg.d_model
    for i, ch in enumerate(cfg.backbone_channel_list):
        add(f"image_encoder.neck.convs.{i}.conv.weight", d, ch, 1, 1)
        add(f"image_encoder.neck.convs.{i}.conv.bias", d)

    pe = "sam_prompt_encoder"
    add(f"{pe}.pe_layer.positional_encoding_gaussian_matrix", 2, d // 2)
    for i in range(4):
        add(f"{pe}.point_embeddings.{i}.weight", 1, d)
    add(f"{pe}.not_a_point_embed.weight", 1, d)
    add(f"{pe}.no_mask_embed.weight", 1, d)
    # unused prompt-encoder mask path (skipped by the converter)
    add(f"{pe}.mask_downscaling.0.weight", 4, 1, 2, 2)

    md = "sam_mask_decoder"
    add(f"{md}.iou_token.weight", 1, d)
    add(f"{md}.mask_tokens.weight", cfg.num_mask_tokens, d)
    add(f"{md}.obj_score_token.weight", 1, d)
    for i in range(cfg.decoder_depth):
        b = f"{md}.transformer.layers.{i}"
        for attn, inner in (("self_attn", d),
                            ("cross_attn_token_to_image", d // 2),
                            ("cross_attn_image_to_token", d // 2)):
            for proj in ("q_proj", "k_proj", "v_proj"):
                add(f"{b}.{attn}.{proj}.weight", inner, d)
                add(f"{b}.{attn}.{proj}.bias", inner)
            add(f"{b}.{attn}.out_proj.weight", d, inner)
            add(f"{b}.{attn}.out_proj.bias", d)
        for k in range(1, 5):
            add(f"{b}.norm{k}.weight", d)
            add(f"{b}.norm{k}.bias", d)
        add(f"{b}.mlp.lin1.weight", cfg.decoder_mlp_dim, d)
        add(f"{b}.mlp.lin1.bias", cfg.decoder_mlp_dim)
        add(f"{b}.mlp.lin2.weight", d, cfg.decoder_mlp_dim)
        add(f"{b}.mlp.lin2.bias", d)
    for proj in ("q_proj", "k_proj", "v_proj"):
        add(f"{md}.transformer.final_attn_token_to_image.{proj}.weight",
            d // 2, d)
        add(f"{md}.transformer.final_attn_token_to_image.{proj}.bias", d // 2)
    add(f"{md}.transformer.final_attn_token_to_image.out_proj.weight", d, d // 2)
    add(f"{md}.transformer.final_attn_token_to_image.out_proj.bias", d)
    add(f"{md}.transformer.norm_final_attn.weight", d)
    add(f"{md}.transformer.norm_final_attn.bias", d)

    add(f"{md}.output_upscaling.0.weight", d, d // 4, 2, 2)   # ConvTranspose
    add(f"{md}.output_upscaling.0.bias", d // 4)
    add(f"{md}.output_upscaling.1.weight", d // 4)
    add(f"{md}.output_upscaling.1.bias", d // 4)
    add(f"{md}.output_upscaling.3.weight", d // 4, d // 8, 2, 2)
    add(f"{md}.output_upscaling.3.bias", d // 8)
    add(f"{md}.conv_s0.weight", d // 8, d, 1, 1)
    add(f"{md}.conv_s0.bias", d // 8)
    add(f"{md}.conv_s1.weight", d // 4, d, 1, 1)
    add(f"{md}.conv_s1.bias", d // 4)
    for t in range(cfg.num_mask_tokens):
        dims = [(d, d), (d, d), (d // 8, d)]
        for li, (o, i_) in enumerate(dims):
            add(f"{md}.output_hypernetworks_mlps.{t}.layers.{li}.weight", o, i_)
            add(f"{md}.output_hypernetworks_mlps.{t}.layers.{li}.bias", o)
    for li, (o, i_) in enumerate([(d, d), (d, d), (cfg.num_mask_tokens, d)]):
        add(f"{md}.iou_prediction_head.layers.{li}.weight", o, i_)
        add(f"{md}.iou_prediction_head.layers.{li}.bias", o)

    # video-memory tensors the converter must skip
    add("memory_attention.layers.0.self_attn.q_proj.weight", 8, 8)
    add("no_mem_embed", 1, 1, d)
    return sd


def test_sam2_forward_and_segment_box():
    m = Sam2(SAM2_TINY_TEST)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    boxes = jnp.asarray([[0.2, 0.2, 0.8, 0.8]], jnp.float32)
    params = m.init(jax.random.key(0), img, boxes)
    logits, iou = m.apply(params, img, boxes)
    assert logits.shape == (1, 128, 128)
    assert iou.shape == (1,)
    assert np.isfinite(np.asarray(logits)).all()
    mask = segment_box(m, params, np.full((90, 70, 3), 128, np.uint8),
                       np.array([10, 10, 60, 80]))
    assert mask.shape == (90, 70) and mask.dtype == bool


def test_sam2_converter_layout_complete():
    from followmyhold_tpu.convert.sam2 import convert_sam2

    cfg = SAM2_TINY_TEST
    rng = np.random.default_rng(5)
    sd = _synth_sam2_sd(cfg, rng)
    params, report = convert_sam2(sd, cfg)
    assert not report.missing_src, report.missing_src[:10]
    assert not report.unused_src, report.unused_src[:10]

    # hypernetwork shapes differ per layer; a wrong mapping would have thrown
    # in put(); converted params drive a working forward
    m = Sam2(cfg)
    img = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (1, 128, 128, 3)).astype(np.float32))
    logits, iou = m.apply(params, img, jnp.asarray([[0.1, 0.1, 0.9, 0.9]]))
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(iou)).all()
