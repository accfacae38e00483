"""FLUX text towers: CLIP-L and T5 encoder checkpoint -> Flax params."""

from __future__ import annotations

import argparse
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.convert.common import (
    ConversionReport,
    dense_kernel,
    put,
    to_mutable,
)
from followmyhold_tpu.models.clip_text import CLIP_L, ClipTextConfig, ClipTextModel
from followmyhold_tpu.models.t5 import T5_XXL, T5Config, T5Encoder
from followmyhold_tpu.utils.params import save_params


def convert_clip_text(torch_sd: Dict[str, np.ndarray],
                      cfg: ClipTextConfig | None = None):
    cfg = cfg or CLIP_L
    model = ClipTextModel(cfg)
    params = to_mutable(model.init(jax.random.key(0),
                                   jnp.zeros((1, 8), jnp.int32)))
    report = ConversionReport()
    sd = {k: np.asarray(v) for k, v in torch_sd.items()
          if not k.endswith("position_ids")}

    def take(src, dst, tf=None):
        if src in sd:
            put(params, f"params/{dst}", tf(sd.pop(src)) if tf else sd.pop(src),
                report)
        else:
            report.missing_src.append(src)

    tm = "text_model"
    take(f"{tm}.embeddings.token_embedding.weight",
         "token_embedding/embedding")
    take(f"{tm}.embeddings.position_embedding.weight", "position_embedding")
    for i in range(cfg.num_layers):
        src = f"{tm}.encoder.layers.{i}"
        dst = f"layer{i}"
        for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
            take(f"{src}.self_attn.{p}.weight", f"{dst}/{p}/kernel",
                 dense_kernel)
            take(f"{src}.self_attn.{p}.bias", f"{dst}/{p}/bias")
        for ln in ("layer_norm1", "layer_norm2"):
            take(f"{src}.{ln}.weight", f"{dst}/{ln}/scale")
            take(f"{src}.{ln}.bias", f"{dst}/{ln}/bias")
        take(f"{src}.mlp.fc1.weight", f"{dst}/fc1/kernel", dense_kernel)
        take(f"{src}.mlp.fc1.bias", f"{dst}/fc1/bias")
        take(f"{src}.mlp.fc2.weight", f"{dst}/fc2/kernel", dense_kernel)
        take(f"{src}.mlp.fc2.bias", f"{dst}/fc2/bias")
    take(f"{tm}.final_layer_norm.weight", "final_layer_norm/scale")
    take(f"{tm}.final_layer_norm.bias", "final_layer_norm/bias")

    report.unused_src.extend(sd.keys())
    return params, report


def convert_t5_encoder(torch_sd: Dict[str, np.ndarray],
                       cfg: T5Config | None = None):
    cfg = cfg or T5_XXL
    model = T5Encoder(cfg)
    params = to_mutable(model.init(jax.random.key(0),
                                   jnp.zeros((1, 8), jnp.int32)))
    report = ConversionReport()
    sd = {k: np.asarray(v) for k, v in torch_sd.items()}
    sd.pop("encoder.embed_tokens.weight", None)   # tied to shared

    def take(src, dst, tf=None):
        if src in sd:
            put(params, f"params/{dst}", tf(sd.pop(src)) if tf else sd.pop(src),
                report)
        else:
            report.missing_src.append(src)

    take("shared.weight", "shared/embedding")
    for i in range(cfg.num_layers):
        src = f"encoder.block.{i}.layer"
        dst = f"block{i}"
        for p in ("q", "k", "v", "o"):
            take(f"{src}.0.SelfAttention.{p}.weight", f"{dst}/attn/{p}/kernel",
                 dense_kernel)
        if i == 0:
            take(f"{src}.0.SelfAttention.relative_attention_bias.weight",
                 f"{dst}/attn/relative_attention_bias")
        take(f"{src}.0.layer_norm.weight", f"{dst}/ln1/scale")
        for p in ("wi_0", "wi_1", "wo"):
            take(f"{src}.1.DenseReluDense.{p}.weight", f"{dst}/{p}/kernel",
                 dense_kernel)
        take(f"{src}.1.layer_norm.weight", f"{dst}/ln2/scale")
    take("encoder.final_layer_norm.weight", "final_norm/scale")

    report.unused_src.extend(sd.keys())
    return params, report


def main() -> None:
    import torch

    import os

    from followmyhold_tpu.text.tokenizers import install_tokenizer_files

    parser = argparse.ArgumentParser()
    parser.add_argument("--clip_ckpt", default=None)
    parser.add_argument("--t5_ckpt", default=None)
    parser.add_argument("--clip_tokenizer_dir", default=None,
                        help="dir with vocab.json+merges.txt (default: the "
                             "FLUX repo's tokenizer/ next to --clip_ckpt)")
    parser.add_argument("--t5_tokenizer_dir", default=None,
                        help="dir with tokenizer.json or spiece.model "
                             "(default: tokenizer_2/ next to --t5_ckpt)")
    args = parser.parse_args()
    if args.clip_ckpt:
        sd = torch.load(args.clip_ckpt, map_location="cpu", weights_only=True)
        params, report = convert_clip_text(
            {k: v.numpy() for k, v in sd.items()})
        print("clip:", report.summary())
        print("saved ->", save_params("flux_clip", params))
        tdir = args.clip_tokenizer_dir or os.path.join(
            os.path.dirname(os.path.dirname(args.clip_ckpt)), "tokenizer")
        files = {n: os.path.join(tdir, n) for n in ("vocab.json", "merges.txt")
                 if os.path.exists(os.path.join(tdir, n))}
        if len(files) == 2:
            print("clip tokenizer ->",
                  install_tokenizer_files("flux_clip", files))
        else:
            print(f"WARNING: no CLIP vocab.json+merges.txt under {tdir} — "
                  "inpainting will refuse to run with these params")
    if args.t5_ckpt:
        sd = torch.load(args.t5_ckpt, map_location="cpu", weights_only=True)
        params, report = convert_t5_encoder(
            {k: v.numpy() for k, v in sd.items()})
        print("t5:", report.summary())
        print("saved ->", save_params("flux_t5", params))
        tdir = args.t5_tokenizer_dir or os.path.join(
            os.path.dirname(os.path.dirname(args.t5_ckpt)), "tokenizer_2")
        files = {n: os.path.join(tdir, n)
                 for n in ("tokenizer.json", "spiece.model")
                 if os.path.exists(os.path.join(tdir, n))}
        if files:
            print("t5 tokenizer ->",
                  install_tokenizer_files("flux_t5", files))
        else:
            print(f"WARNING: no T5 tokenizer.json/spiece.model under {tdir} — "
                  "inpainting will refuse to run with these params")


if __name__ == "__main__":
    main()
