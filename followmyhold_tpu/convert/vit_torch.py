"""Generic timm/ViTPose/DINOv2-style torch ViT -> followmyhold_tpu.models.vit
conversion.

Covers the encoder layout shared by HaMeR's backbone
(hamer/models/backbones/vit.py), DINOv2 (MoGe/moge/model/dinov2), and the
Hunyuan conditioner encoder: patch_embed.proj conv, pos_embed, optional
cls_token/register_tokens, blocks[i].{norm1, attn.qkv, attn.proj, norm2,
mlp.fc1, mlp.fc2, ls1.gamma, ls2.gamma}, final norm.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from followmyhold_tpu.convert.common import (
    ConversionReport,
    conv_kernel,
    dense_kernel,
    put,
)


def convert_vit(
    torch_sd: Dict[str, np.ndarray],
    flax_params: Dict[str, Any],
    prefix: str = "",
    flax_prefix: str = "params",
    depth: int | None = None,
    report: ConversionReport | None = None,
) -> ConversionReport:
    """Map a torch ViT state dict (keys under `prefix`) onto a ViT param tree
    rooted at flax_params[flax_prefix]."""
    report = report or ConversionReport()
    sd = {k[len(prefix):]: np.asarray(v) for k, v in torch_sd.items()
          if k.startswith(prefix)}

    def grab(key):
        if key in sd:
            v = sd.pop(key)
            return v
        report.missing_src.append(prefix + key)
        return None

    root = flax_prefix

    v = grab("patch_embed.proj.weight")
    if v is not None:
        put(flax_params, f"{root}/patch_embed/kernel", conv_kernel(v), report)
    v = grab("patch_embed.proj.bias")
    if v is not None:
        put(flax_params, f"{root}/patch_embed/bias", v, report)
    v = grab("pos_embed")
    if v is not None:
        put(flax_params, f"{root}/pos_embed", v, report)
    for src, dst in (("cls_token", "cls_token"),
                     ("register_tokens", "register_tokens")):
        if src in sd:
            put(flax_params, f"{root}/{dst}", sd.pop(src), report)

    if depth is None:
        depth = 1 + max(
            (int(k.split(".")[1]) for k in sd if k.startswith("blocks.")),
            default=-1)

    for i in range(depth):
        b = f"blocks.{i}."
        blk = f"{root}/block{i}"
        pairs = [
            (b + "norm1.weight", f"{blk}/norm1/scale", None),
            (b + "norm1.bias", f"{blk}/norm1/bias", None),
            (b + "attn.qkv.weight", f"{blk}/attn/qkv/kernel", dense_kernel),
            (b + "attn.qkv.bias", f"{blk}/attn/qkv/bias", None),
            (b + "attn.proj.weight", f"{blk}/attn/proj/kernel", dense_kernel),
            (b + "attn.proj.bias", f"{blk}/attn/proj/bias", None),
            (b + "norm2.weight", f"{blk}/norm2/scale", None),
            (b + "norm2.bias", f"{blk}/norm2/bias", None),
            (b + "mlp.fc1.weight", f"{blk}/mlp/fc1/kernel", dense_kernel),
            (b + "mlp.fc1.bias", f"{blk}/mlp/fc1/bias", None),
            (b + "mlp.fc2.weight", f"{blk}/mlp/fc2/kernel", dense_kernel),
            (b + "mlp.fc2.bias", f"{blk}/mlp/fc2/bias", None),
        ]
        for src, dst, tf in pairs:
            v = grab(src)
            if v is not None:
                put(flax_params, dst, tf(v) if tf else v, report)
        # DINOv2 LayerScale
        for src, dst in ((b + "ls1.gamma", f"{blk}/ls1"),
                         (b + "ls2.gamma", f"{blk}/ls2")):
            if src in sd:
                put(flax_params, dst, sd.pop(src), report)

    for src, dst in (("norm.weight", f"{root}/norm/scale"),
                     ("norm.bias", f"{root}/norm/bias"),
                     ("last_norm.weight", f"{root}/norm/scale"),
                     ("last_norm.bias", f"{root}/norm/bias")):
        if src in sd:
            put(flax_params, dst, sd.pop(src), report)

    report.unused_src.extend(prefix + k for k in sd)
    return report
