"""Plain flow-matching shape sampling (stage-11 parity) as one jitted scan.

Replaces Hunyuan3DDiTFlowMatchingPipeline.__call__ (pipelines.py:896-998):
CFG double-batch DiT forwards over the reversed-sigma schedule, then VAE grid
decode -> (negated) SDF -> marching-tets mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.diffusion.scheduler import make_schedule, step
from followmyhold_tpu.models.hunyuan import HunyuanDiT, ShapeVAE, vae_query_logits
from followmyhold_tpu.ops.grid import generate_dense_grid_points
from followmyhold_tpu.ops.surface import PaddedMesh, marching_tets


class SampleConfig(NamedTuple):
    num_inference_steps: int = 30
    guidance_scale: float = 7.5
    box_v: float = 1.01
    octree_resolution: int = 384
    max_verts: int = 196608
    max_faces: int = 393216


def denoise_latents(
    dit: HunyuanDiT,
    dit_params,
    cond_main: jnp.ndarray,      # [B, M, C]
    uncond_main: jnp.ndarray,    # [B, M, C]
    key: jax.Array,
    latent_shape: Tuple[int, int],
    num_inference_steps: int = 30,
    guidance_scale: float = 7.5,
    initial_noise: Optional[jnp.ndarray] = None,  # [B, *latent_shape]
    scheduler_shift: float = 1.0,
) -> jnp.ndarray:
    """The 30-step CFG sampling loop (pipelines.py:961-984) as lax.scan.

    scheduler_shift is the checkpoint scheduler_config's shift, applied to
    the linspace sigmas exactly as the reference's set_timesteps does
    (schedulers.py:199-202)."""
    B = cond_main.shape[0]
    sched = make_schedule(sigmas=np.linspace(0, 1, num_inference_steps),
                          shift=scheduler_shift)
    if initial_noise is not None:
        latents = initial_noise
    else:
        latents = jax.random.normal(key, (B, *latent_shape), jnp.float32)
    cond_cat = jnp.concatenate([cond_main, uncond_main], axis=0)

    def body(lat, i):
        t = sched.timesteps[i] / sched.num_train_timesteps
        lat_in = jnp.concatenate([lat, lat], axis=0)
        tt = jnp.full((2 * B,), t, lat.dtype)
        eps = dit.apply(dit_params, lat_in, tt, cond_cat)
        eps_c, eps_u = jnp.split(eps, 2, axis=0)
        eps_cfg = eps_u + guidance_scale * (eps_c - eps_u)
        lat, _ = step(sched, i, eps_cfg, lat)
        return lat, None

    latents, _ = jax.lax.scan(body, latents, jnp.arange(num_inference_steps))
    return latents


def latents_to_mesh(
    vae: ShapeVAE,
    vae_params,
    latents: jnp.ndarray,        # [1, L, E]
    octree_resolution: int = 64,
    box_v: float = 1.10,
    max_verts: int = 32768,
    max_faces: int = 65536,
    chunk: int = 8192,
    device_res_limit: int = 256,
) -> PaddedMesh:
    """VAE grid decode -> negated logits -> surface (latent2sdf semantics,
    pipelines.py:292-338: sdf = -logits so inside < 0).

    Above device_res_limit (reference exports at 384^3, hunyuan.py:70) the SDF
    is still decoded on device in chunks but the one-off extraction runs on
    host with exact shapes — 385^3 static edge buffers would not fit HBM.
    On the device path, true pre-truncation counts are checked so capacity
    overruns warn instead of silently emitting degenerate faces."""
    if octree_resolution > device_res_limit:
        import numpy as np

        from followmyhold_tpu.models.hunyuan import hierarchical_export_logits
        from followmyhold_tpu.ops.surface import marching_tets_host

        # two-level decode: only surface cells are evaluated at full
        # resolution (the dense 385^3 decode is ~38 s/image; this is ~10x,
        # with refine points deduped across adjacent cells for another ~1.8x)
        sdf = -hierarchical_export_logits(vae, vae_params, latents, box_v,
                                          octree_resolution, chunk=chunk)
        hv, hf = marching_tets_host(np.asarray(sdf), [-box_v] * 3,
                                    [box_v] * 3, octree_resolution)
        verts = jnp.asarray(hv if len(hv) else np.zeros((1, 3), np.float32))
        faces = jnp.asarray(hf if len(hf) else np.zeros((1, 3), np.int32))
        ones_v = jnp.ones(verts.shape[0]) * (1.0 if len(hv) else 0.0)
        ones_f = jnp.ones(faces.shape[0]) * (1.0 if len(hf) else 0.0)
        return PaddedMesh(verts=verts, faces=faces,
                          vert_mask=ones_v, face_mask=ones_f)
    xyz, grid_size, _ = generate_dense_grid_points(
        [-box_v] * 3, [box_v] * 3, octree_resolution)
    logits = vae_query_logits(vae, vae_params, latents, xyz[None], chunk)[0]
    sdf = -logits
    mesh = marching_tets(
        sdf, jnp.asarray([-box_v] * 3), jnp.asarray([box_v] * 3),
        octree_resolution, max_verts=max_verts, max_faces=max_faces)
    check_surface_capacity(sdf, octree_resolution, max_verts, max_faces)
    return mesh


def check_surface_capacity(sdf: jnp.ndarray, resolution: int,
                           max_verts: int, max_faces: int) -> None:
    """Warn when the true surface exceeds the padded-buffer capacities
    (overflow silently drops geometry otherwise — ADVICE r1)."""
    from followmyhold_tpu.ops.surface import surface_capacity_counts

    n_active, n_faces = surface_capacity_counts(sdf, resolution)
    na, nf = int(n_active), int(n_faces)
    if na > max_verts or nf > max_faces:
        print(f"WARNING: marching_tets capacity overflow: "
              f"{na}/{max_verts} verts, {nf}/{max_faces} faces — "
              f"geometry was truncated; raise max_verts/max_faces")


def latent_to_sdf_grid(
    vae: ShapeVAE,
    vae_params,
    latents: jnp.ndarray,
    xyz: jnp.ndarray,            # [N,3] flattened grid
    chunk: int = 8192,
) -> jnp.ndarray:
    """Differentiable latent -> SDF values at xyz (negated logits)."""
    logits = vae_query_logits(vae, vae_params, latents, xyz[None], chunk)[0]
    return -logits
