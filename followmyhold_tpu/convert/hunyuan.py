"""Hunyuan3D-2 torch checkpoint -> Flax params (DiT + ShapeVAE + conditioner).

The reference loads ckpt['model'] / ckpt['vae'] / ckpt['conditioner'] from
model.ckpt (pipelines.py:477-499). The DiT is FLUX-style (double_blocks.N /
single_blocks.N with img/txt streams), the VAE a vecset transformer with a
cross-attention geo decoder. This maps those layouts onto models/hunyuan.*;
the ConversionReport surfaces any naming drift in a given checkpoint revision
so mappings can be adjusted without guessing.

    python -m followmyhold_tpu.convert.hunyuan --ckpt model.ckpt
"""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.common import ConversionReport, dense_kernel, put, to_mutable
from followmyhold_tpu.models.hunyuan import (
    DiTConfig,
    HunyuanDiT,
    ShapeVAE,
    ShapeVAEConfig,
)
from followmyhold_tpu.utils.params import save_params


def convert_dit(sd: Dict[str, np.ndarray], cfg: DiTConfig | None = None,
                cond_tokens: int = 1370):
    cfg = cfg or DiTConfig()
    model = HunyuanDiT(cfg)
    params = to_mutable(model.init(
        jax.random.key(0), jnp.zeros((1, 8, cfg.in_channels)), jnp.zeros(1),
        jnp.zeros((1, 4, cfg.context_dim))))
    report = ConversionReport()
    sd = dict(sd)

    def take(src, dst, tf=None):
        if src in sd:
            v = sd.pop(src)
            put(params, dst, tf(v) if tf else v, report)
        else:
            report.missing_src.append(src)

    take("latent_in.weight", "params/latent_in/kernel", dense_kernel)
    take("latent_in.bias", "params/latent_in/bias")
    take("cond_in.weight", "params/cond_in/kernel", dense_kernel)
    take("cond_in.bias", "params/cond_in/bias")
    for n, fl in (("time_in.in_layer", "time_in/in_layer"),
                  ("time_in.out_layer", "time_in/out_layer")):
        take(f"{n}.weight", f"params/{fl}/kernel", dense_kernel)
        take(f"{n}.bias", f"params/{fl}/bias")

    def take_stacked(depth, src_fmt, dst, tf=None):
        stacked = []
        ok = True
        for i in range(depth):
            key = src_fmt.format(i=i)
            if key in sd:
                v = sd.pop(key)
                stacked.append(tf(v) if tf else v)
            else:
                report.missing_src.append(key)
                ok = False
        if ok and stacked:
            put(params, dst, np.stack(stacked), report)

    # nn.scan layout: per-layer tensors stacked along a leading depth axis
    for stream in ("img", "txt"):
        for src_rel, dst_rel, tf in (
            (f"{stream}_mod.lin.weight", f"{stream}_mod/lin/kernel", dense_kernel),
            (f"{stream}_mod.lin.bias", f"{stream}_mod/lin/bias", None),
            (f"{stream}_attn.qkv.weight", f"{stream}_qkv/kernel", dense_kernel),
            (f"{stream}_attn.qkv.bias", f"{stream}_qkv/bias", None),
            (f"{stream}_attn.proj.weight", f"{stream}_proj/kernel", dense_kernel),
            (f"{stream}_attn.proj.bias", f"{stream}_proj/bias", None),
            (f"{stream}_mlp.0.weight", f"{stream}_mlp1/kernel", dense_kernel),
            (f"{stream}_mlp.0.bias", f"{stream}_mlp1/bias", None),
            (f"{stream}_mlp.2.weight", f"{stream}_mlp2/kernel", dense_kernel),
            (f"{stream}_mlp.2.bias", f"{stream}_mlp2/bias", None),
        ):
            take_stacked(cfg.depth_double, "double_blocks.{i}." + src_rel,
                         f"params/double_blocks/block/{dst_rel}", tf)

    for src_rel, dst_rel, tf in (
        ("modulation.lin.weight", "mod/lin/kernel", dense_kernel),
        ("modulation.lin.bias", "mod/lin/bias", None),
        ("linear1.weight", "linear1/kernel", dense_kernel),
        ("linear1.bias", "linear1/bias", None),
        ("linear2.weight", "linear2/kernel", dense_kernel),
        ("linear2.bias", "linear2/bias", None),
    ):
        take_stacked(cfg.depth_single, "single_blocks.{i}." + src_rel,
                     f"params/single_blocks/block/{dst_rel}", tf)

    take("final_layer.adaLN_modulation.1.weight", "params/final_mod/lin/kernel",
         dense_kernel)
    take("final_layer.adaLN_modulation.1.bias", "params/final_mod/lin/bias")
    take("final_layer.linear.weight", "params/final_proj/kernel", dense_kernel)
    take("final_layer.linear.bias", "params/final_proj/bias")

    report.unused_src.extend(sd.keys())
    return params, report


def convert_vae(sd: Dict[str, np.ndarray], cfg: ShapeVAEConfig | None = None):
    cfg = cfg or ShapeVAEConfig()
    model = ShapeVAE(cfg)
    params = to_mutable(model.init(
        jax.random.key(0), jnp.zeros((1, 8, cfg.embed_dim)),
        jnp.zeros((1, 4, 3))))
    report = ConversionReport()
    sd = dict(sd)

    def take(src, dst, tf=None):
        if src in sd:
            put(params, dst, tf(sd.pop(src)) if tf else sd.pop(src), report)
        else:
            report.missing_src.append(src)

    take("post_kl.weight", "params/decoder/post_kl/kernel", dense_kernel)
    take("post_kl.bias", "params/decoder/post_kl/bias")

    def take_stacked(depth, src_fmt, dst, tf=None):
        stacked = []
        ok = True
        for i in range(depth):
            key = src_fmt.format(i=i)
            if key in sd:
                v = sd.pop(key)
                stacked.append(tf(v) if tf else v)
            else:
                report.missing_src.append(key)
                ok = False
        if ok and stacked:
            put(params, dst, np.stack(stacked), report)

    for src_rel, dst_rel, tf in (
        ("ln_1.weight", "ln1/scale", None),
        ("ln_1.bias", "ln1/bias", None),
        ("attn.c_qkv.weight", "qkv/kernel", dense_kernel),
        ("attn.c_qkv.bias", "qkv/bias", None),
        ("attn.c_proj.weight", "proj/kernel", dense_kernel),
        ("attn.c_proj.bias", "proj/bias", None),
        ("ln_2.weight", "ln2/scale", None),
        ("ln_2.bias", "ln2/bias", None),
        ("mlp.c_fc.weight", "fc1/kernel", dense_kernel),
        ("mlp.c_fc.bias", "fc1/bias", None),
        ("mlp.c_proj.weight", "fc2/kernel", dense_kernel),
        ("mlp.c_proj.bias", "fc2/bias", None),
    ):
        take_stacked(cfg.depth, "transformer.resblocks.{i}." + src_rel,
                     f"params/decoder/blocks/block/{dst_rel}", tf)
    take("ln_post.weight", "params/decoder/ln_post/scale")
    take("ln_post.bias", "params/decoder/ln_post/bias")

    # geo decoder (cross-attention query head)
    take("geo_decoder.query_proj.weight", "params/geo/query_in/kernel", dense_kernel)
    take("geo_decoder.query_proj.bias", "params/geo/query_in/bias")
    take("geo_decoder.attn.c_q.weight", "params/geo/q/kernel", dense_kernel)
    take("geo_decoder.attn.c_kv.weight", "params/geo/kv/kernel", dense_kernel)
    take("geo_decoder.attn.c_proj.weight", "params/geo/proj/kernel", dense_kernel)
    take("geo_decoder.ln_post.weight", "params/geo/ln_out/scale")
    take("geo_decoder.ln_post.bias", "params/geo/ln_out/bias")
    take("geo_decoder.output_proj.weight", "params/geo/logit/kernel", dense_kernel)
    take("geo_decoder.output_proj.bias", "params/geo/logit/bias")

    report.unused_src.extend(sd.keys())
    return params, report


def main() -> None:
    import torch

    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    args = parser.parse_args()
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    dit_params, r1 = convert_dit({k: v.numpy() for k, v in ckpt["model"].items()})
    print("dit:", r1.summary())
    vae_params, r2 = convert_vae({k: v.numpy() for k, v in ckpt["vae"].items()})
    print("vae:", r2.summary())
    print("saved ->", save_params("hunyuan_dit", dit_params))
    print("saved ->", save_params("hunyuan_vae", vae_params))
    for r, name in ((r1, "dit"), (r2, "vae")):
        if r.missing_src or r.unused_src:
            print(f"[{name}] inspect naming drift: missing={r.missing_src[:10]} "
                  f"unused={r.unused_src[:10]}")


if __name__ == "__main__":
    main()
