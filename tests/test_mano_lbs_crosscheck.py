"""Independent numpy reimplementation of LBS as a cross-check of the JAX
MANO forward (catches einsum index mistakes that shape tests cannot)."""

import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.mano import PARENTS, mano_forward, synthetic_mano
from followmyhold_tpu.ops.rotations import axis_angle_to_matrix


def numpy_lbs(model, rot_mats, betas):
    """Straightforward per-vertex loop-free numpy LBS (smplx semantics)."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_reg = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.lbs_weights, np.float64)

    v_shaped = v_template + shapedirs @ betas
    joints = j_reg @ v_shaped

    pose_feat = (rot_mats[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feat @ posedirs).reshape(-1, 3)

    # forward kinematics
    world = [None] * 16
    for i in range(16):
        T = np.eye(4)
        T[:3, :3] = rot_mats[i]
        T[:3, 3] = joints[i] - (joints[PARENTS[i]] if PARENTS[i] >= 0 else 0)
        world[i] = T if PARENTS[i] < 0 else world[PARENTS[i]] @ T
    world = np.stack(world)

    rel = world.copy()
    for i in range(16):
        rel[i, :3, 3] -= world[i, :3, :3] @ joints[i]

    T_v = np.einsum("vj,jrc->vrc", weights, rel)
    vh = np.concatenate([v_posed, np.ones((len(v_posed), 1))], axis=1)
    verts = np.einsum("vrc,vc->vr", T_v, vh)[:, :3]
    return verts, world[:, :3, 3]


def test_lbs_matches_numpy_reference():
    model = synthetic_mano()
    rng = np.random.default_rng(0)
    aa = rng.normal(scale=0.4, size=(16, 3)).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(10,)).astype(np.float32)

    rot_mats = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)), np.float64)
    ref_verts, ref_joints16 = numpy_lbs(model, rot_mats, betas.astype(np.float64))

    out = mano_forward(
        model,
        jnp.asarray(rot_mats[None, :1], jnp.float32),
        jnp.asarray(rot_mats[None, 1:], jnp.float32),
        jnp.asarray(betas[None]),
    )
    np.testing.assert_allclose(np.asarray(out.vertices[0]), ref_verts,
                               atol=2e-5, rtol=1e-4)
