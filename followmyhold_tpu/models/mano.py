"""MANO hand model: linear blend skinning forward in pure JAX.

TPU-native replacement for smplx.MANOLayer + HaMeR's MANO wrapper
(hamer/models/mano_wrapper.py:11-40): pose is given as rotation MATRICES
(global_orient [B,1,3,3] + hand_pose [B,15,3,3]), betas [B,10]; the output
joints are the 16 regressed joints + 5 fingertip vertices
(thumb 744, index 320, middle 443, ring 554, pinky 671 — smplx
vertex_ids['mano'], also pipelines.py:127) reordered to the 21-joint OpenPose
convention via mano_to_openpose (mano_wrapper.py:21).

Weights load from the official MANO_RIGHT.pkl when present under
``assets_root()``; otherwise a deterministic synthetic model with identical
structure (778 verts / 16 joints / 1538 faces) keeps the stack runnable.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.configs.paths import assets_root
from followmyhold_tpu.ops.precision import einsum_f32, matmul_f32

NUM_VERTS = 778
NUM_JOINTS = 16
NUM_BETAS = 10

# MANO kinematic tree (wrist, then index/middle/pinky/ring/thumb chains).
PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], np.int32)

# smplx vertex_ids['mano']: thumb, index, middle, ring, pinky fingertips.
FINGERTIP_VERTEX_IDS = np.array([744, 320, 443, 554, 671], np.int32)

# 16 regressed + 5 fingertips -> OpenPose 21 ordering (mano_wrapper.py:21).
MANO_TO_OPENPOSE = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20],
    np.int32,
)


class ManoModel(NamedTuple):
    v_template: jnp.ndarray    # [778, 3]
    shapedirs: jnp.ndarray     # [778, 3, 10]
    posedirs: jnp.ndarray      # [135, 778*3] (pose-blend basis, smplx layout)
    j_regressor: jnp.ndarray   # [16, 778]
    lbs_weights: jnp.ndarray   # [778, 16]
    faces: jnp.ndarray         # [1538, 3] int32


class ManoOutput(NamedTuple):
    vertices: jnp.ndarray      # [B, 778, 3]
    joints: jnp.ndarray        # [B, 21, 3] OpenPose order


class _ChumpyStub:
    """Unpickles chumpy arrays from the official pkl without chumpy installed."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy") or module == "scipy.sparse.csc":
            if name in ("Ch", "ch"):
                return _ChumpyStub
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    for attr in ("r", "x", "data"):
        v = getattr(x, attr, None)
        if isinstance(v, np.ndarray):
            return v
    if hasattr(x, "toarray"):
        return x.toarray()
    d = getattr(x, "__dict__", {})
    for attr in ("x", "r", "a"):
        if attr in d and isinstance(d[attr], np.ndarray):
            return d[attr]
    raise TypeError(f"Cannot convert {type(x)} to ndarray")


def load_mano(path: Optional[str] = None) -> ManoModel:
    """Load MANO_RIGHT.pkl (official layout) or fall back to synthetic_mano."""
    if path is None:
        path = os.path.join(assets_root(), "mano", "MANO_RIGHT.pkl")
    if not os.path.exists(path):
        return synthetic_mano()
    with open(path, "rb") as f:
        data = _TolerantUnpickler(io.BytesIO(f.read()), encoding="latin1").load()

    v_template = _to_np(data["v_template"]).astype(np.float32)
    shapedirs = _to_np(data["shapedirs"]).astype(np.float32)[..., :NUM_BETAS]
    posedirs = _to_np(data["posedirs"]).astype(np.float32)
    # smplx stores posedirs as [V,3,P] then reshapes to [P, V*3]
    posedirs = posedirs.reshape(NUM_VERTS * 3, -1).T
    j_reg = _to_np(data["J_regressor"]).astype(np.float32)
    weights = _to_np(data["weights"]).astype(np.float32)
    faces = _to_np(data["f"]).astype(np.int32)
    return ManoModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(weights),
        faces=jnp.asarray(faces),
    )


def synthetic_mano(seed: int = 0) -> ManoModel:
    """Deterministic hand-shaped stand-in with real MANO structure.

    Geometry: a palm box + 5 finger chains sampled to 778 verts, triangulated
    by nearest-neighbor fans; joints placed along fingers; skinning weights by
    softmin distance to bones. Good enough to exercise LBS, rendering, SDF,
    keypoints, and weight-conversion plumbing in tests.
    """
    rng = np.random.default_rng(seed)

    # joint positions: wrist at origin; 5 fingers of 3 joints each
    finger_dirs = np.array(
        [[1.0, 0.25, 0], [1.0, 0.1, 0], [1.0, -0.05, 0], [1.0, -0.2, 0],
         [0.7, 0.45, 0.1]], np.float32)  # index, middle, ring, pinky, thumb-ish
    finger_dirs /= np.linalg.norm(finger_dirs, axis=-1, keepdims=True)
    joints = [np.zeros(3, np.float32)]
    for fd in finger_dirs:
        base = fd * 0.09
        for seg in range(3):
            joints.append((base + fd * 0.025 * (seg + 1)).astype(np.float32))
    joints = np.stack(joints)  # [16,3]

    # vertices: gaussian blobs around bones
    verts = []
    counts = [178] + [120] * 5
    centers = [np.zeros(3)] + [joints[1 + 3 * i + 1] for i in range(5)]
    spreads = [0.05] + [0.035] * 5
    for c, n, sp in zip(centers, counts, spreads):
        verts.append(c + rng.normal(scale=sp, size=(n, 3)))
    verts = np.concatenate(verts).astype(np.float32)[:NUM_VERTS]

    # faces: greedy fan triangulation over random triples with small extent
    tri = rng.integers(0, NUM_VERTS, size=(1538, 3)).astype(np.int32)
    bad = (tri[:, 0] == tri[:, 1]) | (tri[:, 1] == tri[:, 2]) | (tri[:, 0] == tri[:, 2])
    tri[bad] = np.array([[0, 1, 2]], np.int32)

    # J_regressor: gaussian weights to nearest verts
    d = np.linalg.norm(verts[None] - joints[:, None], axis=-1)  # [16,778]
    jr = np.exp(-(d ** 2) / (2 * 0.02 ** 2))
    jr /= jr.sum(axis=1, keepdims=True)

    w = np.exp(-(d.T ** 2) / (2 * 0.03 ** 2)) + 1e-6  # [778,16]
    w /= w.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(scale=1e-3, size=(NUM_VERTS, 3, NUM_BETAS)).astype(np.float32)
    posedirs = rng.normal(scale=1e-4, size=(135, NUM_VERTS * 3)).astype(np.float32)

    return ManoModel(
        v_template=jnp.asarray(verts),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(jr.astype(np.float32)),
        lbs_weights=jnp.asarray(w.astype(np.float32)),
        faces=jnp.asarray(tri),
    )


def _rigid_transforms(rot_mats: jnp.ndarray, joints: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-kinematics world transforms (smplx batch_rigid_transform).

    rot_mats: [B,16,3,3]; joints: [B,16,3] rest joints.
    Returns (posed_joints [B,16,3], rel_transforms [B,16,4,4]).
    """
    B = rot_mats.shape[0]
    rel_joints = joints.at[:, 1:].add(-joints[:, PARENTS[1:]])

    def make_T(R, t):
        T = jnp.zeros((B, 4, 4), rot_mats.dtype)
        T = T.at[:, :3, :3].set(R)
        T = T.at[:, :3, 3].set(t)
        T = T.at[:, 3, 3].set(1.0)
        return T

    transforms = [make_T(rot_mats[:, 0], rel_joints[:, 0])]
    for i in range(1, NUM_JOINTS):
        T_i = make_T(rot_mats[:, i], rel_joints[:, i])
        transforms.append(matmul_f32(transforms[PARENTS[i]], T_i))
    world = jnp.stack(transforms, axis=1)  # [B,16,4,4]

    posed_joints = world[:, :, :3, 3]
    # remove rest-pose joint contribution: A = T - pack(T @ [j,0])
    joints_h = jnp.concatenate([joints, jnp.zeros((B, NUM_JOINTS, 1))], axis=-1)
    correction = einsum_f32("bjik,bjk->bji", world, joints_h)  # [B,16,4]
    rel = world.at[:, :, :3, 3].add(-correction[:, :, :3])
    return posed_joints, rel


def mano_forward(
    model: ManoModel,
    global_orient: jnp.ndarray,  # [B,1,3,3] or [B,3,3]
    hand_pose: jnp.ndarray,      # [B,15,3,3]
    betas: jnp.ndarray,          # [B,10]
    transl: Optional[jnp.ndarray] = None,
) -> ManoOutput:
    if global_orient.ndim == 3:
        global_orient = global_orient[:, None]
    B = betas.shape[0]
    rot_mats = jnp.concatenate([global_orient, hand_pose], axis=1)  # [B,16,3,3]

    # shape blendshapes
    v_shaped = model.v_template + einsum_f32("b l, v c l -> b v c", betas, model.shapedirs)
    joints = einsum_f32("j v, b v c -> b j c", model.j_regressor, v_shaped)

    # pose blendshapes from (R - I) of the 15 hand joints
    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (hand_pose - eye).reshape(B, -1)  # [B,135]
    v_posed = v_shaped + einsum_f32(
        "b p, p n -> b n", pose_feature, model.posedirs
    ).reshape(B, NUM_VERTS, 3)

    posed_joints, rel = _rigid_transforms(rot_mats, joints)

    # skinning
    T = einsum_f32("v j, b j r c -> b v r c", model.lbs_weights, rel)  # [B,V,4,4]
    v_h = jnp.concatenate([v_posed, jnp.ones((B, NUM_VERTS, 1))], axis=-1)
    verts = einsum_f32("b v r c, b v c -> b v r", T, v_h)[..., :3]

    # 21 keypoints: 16 regressed joints (posed) + 5 fingertip verts, OpenPose order
    tips = verts[:, FINGERTIP_VERTEX_IDS]
    joints21 = jnp.concatenate([posed_joints, tips], axis=1)[:, MANO_TO_OPENPOSE]

    if transl is not None:
        verts = verts + transl[:, None]
        joints21 = joints21 + transl[:, None]
    return ManoOutput(vertices=verts, joints=joints21)


def mano_vert_to_3dkps(verts: jnp.ndarray, j_regressor16: jnp.ndarray) -> jnp.ndarray:
    """Keypoints from an already-posed MANO mesh (pipelines.py:121-135):
    16 regressed joints + 5 fingertip verts, OpenPose order.

    verts: [778,3]; j_regressor16: [16,778] (HaMeR dumps this as
    J_regressor_hamer.pt, hamer.py:103-104).
    """
    regressed = matmul_f32(j_regressor16, verts)
    tips = verts[FINGERTIP_VERTEX_IDS]
    kps = jnp.concatenate([regressed, tips], axis=0)
    return kps[MANO_TO_OPENPOSE]
