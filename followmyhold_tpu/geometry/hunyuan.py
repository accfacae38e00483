"""Hunyuan HOI mesh stage: un-guided flow-matching shape generation.

Public surface mirrors src/foho/geometry/hunyuan.py:30-122: per HOI crop
(white background treated as transparent, hunyuan.py:52-60), run the plain
flow-matching pipeline (30 steps, seed 2025) and export {id}_hoi_mesh.ply.
Post-processing (floater removal, degenerate-face removal) runs on host.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from followmyhold_tpu.diffusion.pipeline import denoise_latents, latents_to_mesh
from followmyhold_tpu.models.hunyuan import (
    ConditionerConfig,
    Conditioner,
    DiTConfig,
    HunyuanDiT,
    ShapeVAE,
    ShapeVAEConfig,
)
from followmyhold_tpu.utils.mesh_io import write_ply
from followmyhold_tpu.utils.params import load_or_init
from followmyhold_tpu.utils.prng import SEED_HUNYUAN, stage_key
from followmyhold_tpu.geometry.postprocess import (
    reduce_faces,
    remove_degenerate_faces,
    remove_floaters,
)


def white_to_alpha(image_rgb: np.ndarray) -> np.ndarray:
    """RGB [H,W,3] uint8 -> RGBA with pure-white pixels transparent
    (reference hunyuan.py:52-60)."""
    white = np.all(image_rgb == 255, axis=-1)
    alpha = np.where(white, 0, 255).astype(np.uint8)
    return np.concatenate([image_rgb, alpha[..., None]], axis=-1)


def _profile() -> str:
    """Model-size profile: 'full' (production) or 'tiny' (CPU smoke runs /
    integration tests). Set FOHO_TPU_PROFILE=tiny."""
    return os.environ.get("FOHO_TPU_PROFILE", "full")


def build_models(dit_cfg: DiTConfig | None = None,
                 vae_cfg: ShapeVAEConfig | None = None,
                 cond_cfg: ConditionerConfig | None = None):
    if _profile() == "tiny":
        from followmyhold_tpu.models.hunyuan import COND_TINY, VAE_TINY
        import jax.numpy as _jnp

        dit_cfg = dit_cfg or DiTConfig(
            in_channels=VAE_TINY.embed_dim, hidden=64, heads=4, depth_double=1,
            depth_single=1, context_dim=COND_TINY.embed_dim, time_dim=32,
            dtype=_jnp.float32)
        vae_cfg = vae_cfg or VAE_TINY
        cond_cfg = cond_cfg or COND_TINY
    dit_cfg = dit_cfg or DiTConfig()
    vae_cfg = vae_cfg or ShapeVAEConfig()
    cond_cfg = cond_cfg or ConditionerConfig()
    dit = HunyuanDiT(dit_cfg)
    vae = ShapeVAE(vae_cfg)
    cond = Conditioner(cond_cfg)

    lat = jnp.zeros((1, vae_cfg.num_latents, vae_cfg.embed_dim))
    n_cond = cond_cfg.n_tokens
    dit_params = load_or_init(
        "hunyuan_dit",
        lambda k: dit.init(k, lat, jnp.zeros(1),
                           jnp.zeros((1, n_cond, dit_cfg.context_dim))))
    vae_params = load_or_init(
        "hunyuan_vae", lambda k: vae.init(k, lat, jnp.zeros((1, 8, 3))))
    cond_params = load_or_init(
        "hunyuan_cond",
        lambda k: cond.init(k, jnp.zeros((1, cond_cfg.image_size,
                                          cond_cfg.image_size, 3))))
    return (dit, dit_params), (vae, vae_params), (cond, cond_params)


def encode_condition(cond, cond_params, image_rgba: np.ndarray):
    """RGBA image -> (cond_main, uncond_main) token pairs."""
    rgb = jnp.asarray(image_rgba[..., :3], jnp.float32) / 255.0
    tokens = cond.apply(cond_params, rgb[None])["main"]
    uncond = cond.apply(cond_params, 1, method=Conditioner.unconditional_embedding)["main"]
    return tokens, uncond


def run(
    image_dir: str,
    save_dir: str,
    num_inference_steps: int = 30,
    octree_resolution: int | None = None,
    guidance_scale: float = 7.5,
    project_root: str | None = None,  # CLI parity
    scheduler_shift: float | None = None,  # None -> checkpoint scheduler cfg
) -> None:
    if scheduler_shift is None:
        from followmyhold_tpu.utils.params import scheduler_shift as _shift

        scheduler_shift = _shift()
    if octree_resolution is None:
        from followmyhold_tpu.configs.profiles import hunyuan_octree_resolution

        octree_resolution = hunyuan_octree_resolution()
    os.makedirs(save_dir, exist_ok=True)
    (dit, dit_params), (vae, vae_params), (cond, cond_params) = build_models()

    images = sorted(
        glob.glob(os.path.join(image_dir, "*.png"))
        + glob.glob(os.path.join(image_dir, "*.jpg"))
    )
    if not images:
        print(f"No images found in {image_dir}")
        return

    # reference batches 5 images through the diffusion loop
    # (geometry/hunyuan.py:89-95); decode/export stay per image
    batch = 5
    pending = []
    for img_path in images:
        image_id = os.path.basename(img_path).split("_")[0]
        out_path = os.path.join(save_dir, f"{image_id}_hoi_mesh.ply")
        if os.path.exists(out_path):
            print(f"{image_id} exists, skipping")
            continue
        pending.append((img_path, image_id, out_path))

    for i in range(0, len(pending), batch):
        group = pending[i:i + batch]
        conds, unconds, keys = [], [], []
        for img_path, image_id, _ in group:
            rgb = np.asarray(Image.open(img_path).convert("RGB"))
            rgba = white_to_alpha(rgb)
            cm, um = encode_condition(cond, cond_params, rgba)
            conds.append(cm[0])
            unconds.append(um[0])
            keys.append(stage_key(SEED_HUNYUAN, "hunyuan", image_id))

        # per-image keys keep exports identical to single-image runs
        shape = (1, vae.cfg.num_latents, vae.cfg.embed_dim)
        noise = jnp.concatenate(
            [jax.random.normal(k, shape) for k in keys], axis=0)
        latents = denoise_latents(
            dit, dit_params, jnp.stack(conds), jnp.stack(unconds), keys[0],
            latent_shape=(vae.cfg.num_latents, vae.cfg.embed_dim),
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale, initial_noise=noise,
            scheduler_shift=scheduler_shift)

        for b, (_, image_id, out_path) in enumerate(group):
            mesh = latents_to_mesh(vae, vae_params, latents[b:b + 1],
                                   octree_resolution=octree_resolution,
                                   box_v=1.01,
                                   max_verts=196608, max_faces=393216)
            nv = int(mesh.num_verts)
            nf = int(mesh.num_faces)
            verts = np.asarray(mesh.verts)[:nv]
            faces = np.asarray(mesh.faces)[:nf]
            # FloaterRemover -> DegenerateFaceRemover -> FaceReducer, the
            # full reference chain (geometry/hunyuan.py:96-100)
            verts, faces = remove_floaters(verts, faces)
            verts, faces = remove_degenerate_faces(verts, faces)
            verts, faces = reduce_faces(verts, faces)
            write_ply(out_path, verts, faces)
            print(f"Exported {out_path} ({len(verts)} verts, {len(faces)} faces)")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--project_root", default=None)
    parser.add_argument("--num_inference_steps", type=int, default=30)
    parser.add_argument("--scheduler_shift", type=float, default=None,
                        help="override the checkpoint scheduler_config shift")
    parser.add_argument("--octree_resolution", type=int, default=None)
    args = parser.parse_args()
    run(args.image_dir, args.save_dir, args.num_inference_steps,
        args.octree_resolution, project_root=args.project_root,
        scheduler_shift=args.scheduler_shift)


if __name__ == "__main__":
    main()
