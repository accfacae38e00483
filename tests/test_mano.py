import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.mano import (
    FINGERTIP_VERTEX_IDS,
    MANO_TO_OPENPOSE,
    NUM_JOINTS,
    NUM_VERTS,
    ManoOutput,
    load_mano,
    mano_forward,
    mano_vert_to_3dkps,
    synthetic_mano,
)
from followmyhold_tpu.ops.rotations import axis_angle_to_matrix


def _identity_pose(b=1):
    go = jnp.tile(jnp.eye(3), (b, 1, 1, 1))
    hp = jnp.tile(jnp.eye(3), (b, 15, 1, 1))
    betas = jnp.zeros((b, 10))
    return go, hp, betas


def test_rest_pose_is_template():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()
    out = mano_forward(model, go, hp, betas)
    assert isinstance(out, ManoOutput)
    np.testing.assert_allclose(
        np.asarray(out.vertices[0]), np.asarray(model.v_template), atol=1e-5
    )
    assert out.joints.shape == (1, 21, 3)


def test_global_rotation_rotates_everything():
    model = synthetic_mano()
    aa = jnp.asarray([0.0, 0.0, np.pi / 2])
    R = axis_angle_to_matrix(aa)
    go = R[None, None]
    _, hp, betas = _identity_pose()
    out = mano_forward(model, go, hp, betas)
    # rest verts rotated about wrist (joint 0 at origin-ish)
    j0 = np.asarray(model.j_regressor @ model.v_template)[0]
    expected = (np.asarray(model.v_template) - j0) @ np.asarray(R).T + j0
    np.testing.assert_allclose(np.asarray(out.vertices[0]), expected, atol=1e-4)


def test_betas_move_vertices():
    model = synthetic_mano()
    go, hp, _ = _identity_pose()
    out0 = mano_forward(model, go, hp, jnp.zeros((1, 10)))
    out1 = mano_forward(model, go, hp, jnp.ones((1, 10)))
    assert float(jnp.abs(out1.vertices - out0.vertices).max()) > 1e-4


def test_finger_joint_moves_only_descendants():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()
    out0 = mano_forward(model, go, hp, betas)
    # rotate index-finger base (hand joint index 0 = model joint 1)
    R = axis_angle_to_matrix(jnp.asarray([0.0, 0.0, 0.6]))
    hp2 = hp.at[0, 0].set(R)
    out1 = mano_forward(model, go, hp2, betas)
    # posedirs add a tiny global offset; the LBS effect must dominate on
    # index-dominated verts and vanish on wrist-dominated verts
    w = np.asarray(model.lbs_weights)
    d = np.linalg.norm(np.asarray(out1.vertices - out0.vertices)[0], axis=-1)
    idx_verts = w[:, 1:4].sum(-1) > 0.5
    wrist_verts = w[:, 0] > 0.5
    assert idx_verts.any() and wrist_verts.any()
    assert d[idx_verts].mean() > 10 * max(d[wrist_verts].mean(), 1e-9)


def test_translation():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()
    t = jnp.asarray([[1.0, 2.0, 3.0]])
    out = mano_forward(model, go, hp, betas, transl=t)
    out0 = mano_forward(model, go, hp, betas)
    np.testing.assert_allclose(
        np.asarray(out.vertices - out0.vertices)[0],
        np.tile([1, 2, 3], (NUM_VERTS, 1)), atol=1e-5,
    )


def test_openpose_ordering_and_fingertips():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()
    out = mano_forward(model, go, hp, betas)
    # OpenPose idx 0 = wrist = regressed joint 0 (numpy matmul: full fp32)
    j0 = (np.asarray(model.j_regressor) @ np.asarray(model.v_template))[0]
    np.testing.assert_allclose(np.asarray(out.joints[0, 0]), j0, atol=1e-5)
    # OpenPose idx 4 = thumb tip = fingertip vertex 744 (MANO_TO_OPENPOSE[4]=16)
    assert MANO_TO_OPENPOSE[4] == 16
    np.testing.assert_allclose(
        np.asarray(out.joints[0, 4]),
        np.asarray(model.v_template[FINGERTIP_VERTEX_IDS[0]]), atol=1e-5,
    )


def test_mano_vert_to_3dkps_matches_forward():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()
    out = mano_forward(model, go, hp, betas)
    kps = mano_vert_to_3dkps(out.vertices[0], model.j_regressor)
    # identical pipeline up to the regressor being applied to posed verts
    np.testing.assert_allclose(np.asarray(kps), np.asarray(out.joints[0]), atol=1e-4)


def test_load_mano_falls_back_to_synthetic(tmp_path):
    model = load_mano(str(tmp_path / "missing.pkl"))
    assert model.v_template.shape == (NUM_VERTS, 3)
    assert model.j_regressor.shape == (NUM_JOINTS, NUM_VERTS)


def test_forward_is_jittable_and_differentiable():
    model = synthetic_mano()
    go, hp, betas = _identity_pose()

    @jax.jit
    def loss(b):
        out = mano_forward(model, go, hp, b)
        return jnp.sum(out.vertices ** 2)

    g = jax.grad(loss)(betas)
    assert np.isfinite(np.asarray(g)).all()
