"""ViTPose(+-H wholebody) torch checkpoint -> Flax params.

The reference wraps the official ViTPose repo via mmpose (vendored at
third_party/estimator/hamer/third-party/ViTPose/; entry
vitpose_model.py:17-72). Its ViT backbone uses timm naming
(backbone.blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
backbone.last_norm) — handled by convert_vit — and the classic top-down
head: keypoint_head.deconv_layers.{0,3} ConvTranspose2d with BatchNorms at
{1,4}, then keypoint_head.final_layer. Inference-mode BatchNorm is a
per-channel affine, folded here into the model's bn{i}_scale/bias params.

    python -m followmyhold_tpu.convert.vitpose --ckpt vitpose_huge_wholebody.pth
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.common import ConversionReport, conv_kernel, put, to_mutable
from followmyhold_tpu.convert.vit_torch import convert_vit
from followmyhold_tpu.models.vitpose import ViTPose, ViTPoseConfig
from followmyhold_tpu.utils.params import save_params


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax [kh, kw, in, out],
    spatially flipped (flax ConvTranspose correlates; torch's transposed
    conv convolves)."""
    return np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1]


def convert_vitpose(torch_sd: Dict[str, np.ndarray],
                    cfg: ViTPoseConfig | None = None, eps: float = 1e-5):
    cfg = cfg or ViTPoseConfig()
    model = ViTPose(cfg)
    ih, iw = cfg.backbone.img_size
    params = to_mutable(model.init(jax.random.key(0),
                                   jnp.zeros((1, ih, iw, 3))))
    report = ConversionReport()
    sd = {k: np.asarray(v) for k, v in torch_sd.items()}

    # convert_vit sees only backbone.* (it prefix-filters a copy) and reports
    # leftover backbone keys as unused itself
    convert_vit(sd, params, prefix="backbone.", flax_prefix="params/backbone",
                depth=cfg.backbone.depth, report=report)
    head = {k: v for k, v in sd.items() if k.startswith("keypoint_head.")}
    report.unused_src.extend(
        k for k in sd if not k.startswith(("backbone.", "keypoint_head.")))

    def take(src, dst, tf=None):
        if src in head:
            put(params, f"params/{dst}", tf(head.pop(src)) if tf else head.pop(src),
                report)
        else:
            report.missing_src.append(src)

    for i in range(cfg.num_deconv):
        dl = 3 * i           # ConvTranspose at indices 0, 3; BN at 1, 4
        take(f"keypoint_head.deconv_layers.{dl}.weight",
             f"deconv{i}/kernel", _deconv_kernel)
        bn = f"keypoint_head.deconv_layers.{dl + 1}"
        if all(f"{bn}.{p}" in head for p in
               ("weight", "bias", "running_mean", "running_var")):
            gamma = head.pop(f"{bn}.weight")
            beta = head.pop(f"{bn}.bias")
            mean = head.pop(f"{bn}.running_mean")
            var = head.pop(f"{bn}.running_var")
            head.pop(f"{bn}.num_batches_tracked", None)
            scale = gamma / np.sqrt(var + eps)
            put(params, f"params/bn{i}_scale", scale, report)
            put(params, f"params/bn{i}_bias", beta - mean * scale, report)
        else:
            report.missing_src.append(f"{bn}.*")
    take("keypoint_head.final_layer.weight", "final/kernel", conv_kernel)
    take("keypoint_head.final_layer.bias", "final/bias")

    report.unused_src.extend(head.keys())
    return params, report


def main() -> None:
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    args = parser.parse_args()
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    params, report = convert_vitpose(
        {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")})
    print(report.summary())
    print("saved ->", save_params("vitpose", params))
    if report.missing_src or report.unused_src:
        print("naming drift:", report.missing_src[:8], report.unused_src[:8])


if __name__ == "__main__":
    main()
