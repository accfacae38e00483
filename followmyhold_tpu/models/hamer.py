"""HaMeR hand-mesh recovery in Flax: ViT-H backbone + cross-attention MANO
transformer-decoder head with iterative error feedback.

Reference: hamer/models/hamer.py:89-140 (forward_step),
hamer/models/heads/mano_head.py:17-111 (MANOTransformerDecoderHead),
hamer/models/components/pose_transformer.py (TransformerCrossAttn: per layer
self-attn + cross-attn + FF with pre-LN, dim 1024, 6 layers, 8 heads,
dim_head 64, context 1280 — hamer_vit_transformer.yaml:35-43).

Output contract matches the reference forward_step: pred pose (16x 3x3),
betas(10), cam(3 weak-persp) -> cam_t via 2f/(s*b); MANO forward gives verts +
21 OpenPose keypoints; perspective projection with normalized focal
(f / IMAGE_SIZE) gives 2D keypoints in crop space.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from followmyhold_tpu.models.mano import ManoModel, mano_forward
from followmyhold_tpu.models.vit import HAMER_VIT_H, ViTConfig, ViTFeatureMap
from followmyhold_tpu.ops.attention import multi_head_attention
from followmyhold_tpu.ops.camera import perspective_projection
from followmyhold_tpu.ops.rotations import rot6d_to_matrix


@dataclasses.dataclass(frozen=True)
class HamerConfig:
    backbone: ViTConfig = HAMER_VIT_H
    # head (hamer_vit_transformer.yaml:35-43)
    head_dim: int = 1024
    head_depth: int = 6
    head_heads: int = 8
    head_dim_head: int = 64
    head_mlp_dim: int = 1024
    context_dim: int = 1280
    ief_iters: int = 1          # cfg.MODEL.MANO_HEAD.IEF_ITERS default (mano_head.py:79)
    num_hand_joints: int = 15
    image_size: int = 256       # MODEL.IMAGE_SIZE
    focal_length: float = 5000.0  # EXTRA.FOCAL_LENGTH
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def npose(self) -> int:
        return 6 * (self.num_hand_joints + 1)


class HamerOutput(NamedTuple):
    global_orient: jnp.ndarray    # [B,1,3,3]
    hand_pose: jnp.ndarray        # [B,15,3,3]
    betas: jnp.ndarray            # [B,10]
    pred_cam: jnp.ndarray         # [B,3] weak-persp (s, tx, ty)
    pred_cam_t: jnp.ndarray       # [B,3] crop-cam translation
    vertices: jnp.ndarray         # [B,778,3]
    keypoints_3d: jnp.ndarray     # [B,21,3]
    keypoints_2d: jnp.ndarray     # [B,21,2] normalized crop coords
    focal_length: jnp.ndarray     # [B,2]


class CrossAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = multi_head_attention(heads_first(q), heads_first(k), heads_first(v))
        B, H, N, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class SelfAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            B, N, _ = t.shape
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        out = multi_head_attention(heads_first(q), heads_first(k), heads_first(v))
        B, H, N, D = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(B, N, H * D)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class DecoderLayer(nn.Module):
    cfg: HamerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_sa")(x).astype(c.dtype)
        x = x + SelfAttention(c.head_heads, c.head_dim_head, c.dtype, name="sa")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_ca")(x).astype(c.dtype)
        x = x + CrossAttention(c.head_heads, c.head_dim_head, c.dtype, name="ca")(h, context)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm_ff")(x).astype(c.dtype)
        h = nn.Dense(c.head_mlp_dim, dtype=c.dtype, name="ff1")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c.head_dim, dtype=c.dtype, name="ff2")(h)
        return x


class ManoHead(nn.Module):
    """MANOTransformerDecoderHead (mano_head.py:17-111): zero input token,
    cross-attend to backbone tokens, IEF readout of pose/betas/cam."""

    cfg: HamerConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray):
        c = self.cfg
        B = tokens.shape[0]

        # The reference loads these from mano_mean_params.npz
        # (mano_head.py:49-55); defaults here are the mean-pose analogues —
        # identity 6d rotations for all 16 joints and a ~unit weak-persp
        # scale — and converted checkpoints overwrite them.
        def _mean_pose_init(key, shape, dtype=jnp.float32):
            ident6d = jnp.tile(jnp.asarray([1, 0, 0, 0, 1, 0], dtype), (16,))
            return jnp.broadcast_to(ident6d, shape).astype(dtype)

        def _mean_cam_init(key, shape, dtype=jnp.float32):
            return jnp.broadcast_to(jnp.asarray([0.9, 0.0, 0.0], dtype), shape)

        init_pose = self.param("init_hand_pose", _mean_pose_init,
                               (1, c.npose), jnp.float32)
        init_betas = self.param("init_betas", nn.initializers.zeros,
                                (1, 10), jnp.float32)
        init_cam = self.param("init_cam", _mean_cam_init,
                              (1, 3), jnp.float32)

        pred_pose = jnp.tile(init_pose, (B, 1))
        pred_betas = jnp.tile(init_betas, (B, 1))
        pred_cam = jnp.tile(init_cam, (B, 1))

        # TransformerDecoder embeds the zero token and adds a learned pos
        # embedding; there is NO final norm after the layers
        # (pose_transformer.py:301-355).
        pos_embedding = self.param("pos_embedding", nn.initializers.normal(1.0),
                                   (1, 1, c.head_dim), jnp.float32)

        for _ in range(c.ief_iters):
            token = jnp.zeros((B, 1, 1), c.dtype)
            x = nn.Dense(c.head_dim, dtype=c.dtype, name="input_proj")(token)
            x = x + pos_embedding.astype(c.dtype)

            class _LayerScan(nn.Module):
                cfg: HamerConfig

                @nn.compact
                def __call__(self, carry, _):
                    x, ctx = carry
                    x = DecoderLayer(self.cfg, name="layer")(x, ctx)
                    return (x, ctx), None

            lscan = nn.scan(_LayerScan, variable_axes={"params": 0},
                            split_rngs={"params": True}, length=c.head_depth)
            (x, _), _ = lscan(c, name="layers")((x, tokens), None)
            token_out = x[:, 0].astype(jnp.float32)

            pred_pose = nn.Dense(c.npose, dtype=jnp.float32, name="decpose")(token_out) + pred_pose
            pred_betas = nn.Dense(10, dtype=jnp.float32, name="decshape")(token_out) + pred_betas
            pred_cam = nn.Dense(3, dtype=jnp.float32, name="deccam")(token_out) + pred_cam

        rotmats = rot6d_to_matrix(pred_pose.reshape(B, c.num_hand_joints + 1, 6))
        return rotmats[:, :1], rotmats[:, 1:], pred_betas, pred_cam


class Hamer(nn.Module):
    cfg: HamerConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray):
        """images: [B, 256, 256, 3] normalized crops. Returns raw head outputs;
        use hamer_forward for the full forward_step contract."""
        c = self.cfg
        # the reference center-crops 256x256 -> 256x192 (hamer.py:105)
        x = images[:, :, 32:-32, :]
        feats = ViTFeatureMap(c.backbone, name="backbone")(x)
        B, gh, gw, C = feats.shape
        tokens = feats.reshape(B, gh * gw, C)
        return ManoHead(c, name="mano_head")(tokens)


def hamer_forward(
    model: Hamer,
    params,
    mano_model: ManoModel,
    images: jnp.ndarray,
) -> HamerOutput:
    """Full forward_step (hamer.py:89-140): network + MANO + projection."""
    c = model.cfg
    B = images.shape[0]
    global_orient, hand_pose, betas, pred_cam = model.apply(params, images)

    focal = jnp.full((B, 2), c.focal_length, jnp.float32)
    pred_cam_t = jnp.stack(
        [
            pred_cam[:, 1],
            pred_cam[:, 2],
            2.0 * focal[:, 0] / (c.image_size * pred_cam[:, 0] + 1e-9),
        ],
        axis=-1,
    )

    mano_out = mano_forward(mano_model, global_orient, hand_pose, betas)
    kps2d = perspective_projection(
        mano_out.joints, translation=pred_cam_t,
        focal_length=focal / c.image_size,
    )
    return HamerOutput(
        global_orient=global_orient,
        hand_pose=hand_pose,
        betas=betas,
        pred_cam=pred_cam,
        pred_cam_t=pred_cam_t,
        vertices=mano_out.vertices,
        keypoints_3d=mano_out.joints,
        keypoints_2d=kps2d,
        focal_length=focal,
    )
