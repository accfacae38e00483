"""MoGe-2 torch checkpoint -> Flax params.

Maps the reference checkpoint layout (moge/model/v2.py state dict:
encoder.backbone.* = DINOv2, encoder.output_projections.*, neck.*,
points_head.*, normal_head.*, mask_head.*, scale_head.*) onto models/moge.MoGe.

    python -m followmyhold_tpu.convert.moge --ckpt model.pt
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.common import (
    ConversionReport,
    conv_kernel,
    dense_kernel,
    put,
    to_mutable,
)
from followmyhold_tpu.convert.vit_torch import convert_vit
from followmyhold_tpu.models.moge import MoGe, MoGeConfig
from followmyhold_tpu.utils.params import save_params


def convert_moge(torch_sd: Dict[str, np.ndarray], cfg: MoGeConfig | None = None):
    cfg = cfg or MoGeConfig()
    model = MoGe(cfg)
    params = to_mutable(model.init(jax.random.key(0),
                                   jnp.zeros((1, 70, 70, 3)), 25))
    report = ConversionReport()
    sd = dict(torch_sd)

    # DINOv2 backbone
    convert_vit(sd, params, prefix="encoder.backbone.",
                flax_prefix="params/backbone", depth=cfg.encoder.depth,
                report=report)
    sd = {k: v for k, v in sd.items() if not k.startswith("encoder.backbone.")}

    def take(src, dst, tf=None):
        if src in sd:
            put(params, dst, tf(sd.pop(src)) if tf else sd.pop(src), report)
        else:
            report.missing_src.append(src)

    for i in range(len(cfg.intermediate_layers)):
        take(f"encoder.output_projections.{i}.weight",
             f"params/proj{i}/kernel", conv_kernel)
        take(f"encoder.output_projections.{i}.bias", f"params/proj{i}/bias")

    # conv stacks: torch ConvStack layout -> our neck/head trees. Exact
    # sublayer names depend on checkpoint revision; the report surfaces
    # unmapped tensors for adjustment on first real conversion.
    def conv_stack(prefix, flax_root, dims):
        for lvl in range(len(dims)):
            take(f"{prefix}.input_blocks.{lvl}.weight",
                 f"{flax_root}/in{lvl}/kernel", conv_kernel)
            take(f"{prefix}.input_blocks.{lvl}.bias", f"{flax_root}/in{lvl}/bias")

    conv_stack("neck", "params/neck", cfg.neck_dims)
    for head in ("points_head", "mask_head", "normal_head"):
        if head == "normal_head" and not cfg.use_normal_head:
            continue
        conv_stack(head, f"params/{head}", cfg.head_dims)

    # scale head MLP
    n_scale = len(cfg.scale_head_dims)
    for i in range(n_scale - 1):
        take(f"scale_head.{2 * i}.weight", f"params/scale{i}/kernel", dense_kernel)
        take(f"scale_head.{2 * i}.bias", f"params/scale{i}/bias")
    take(f"scale_head.{2 * (n_scale - 1)}.weight", "params/scale_out/kernel",
         dense_kernel)
    take(f"scale_head.{2 * (n_scale - 1)}.bias", "params/scale_out/bias")

    report.unused_src.extend(
        k for k in sd if not k.startswith("encoder.backbone."))
    return params, report


def main() -> None:
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    args = parser.parse_args()
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in ckpt["model"].items()}
    params, report = convert_moge(sd)
    print(report.summary())
    print("saved ->", save_params("moge", params))
    if report.missing_src or report.unused_src:
        print("inspect naming drift:",
              report.missing_src[:10], report.unused_src[:10])


if __name__ == "__main__":
    main()
