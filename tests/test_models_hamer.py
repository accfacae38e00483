import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.hamer import Hamer, HamerConfig, hamer_forward
from followmyhold_tpu.models.mano import synthetic_mano
from followmyhold_tpu.models.vit import ViT, ViTConfig, interpolate_pos_embed
from followmyhold_tpu.ops.attention import attention_xla, multi_head_attention

TINY_VIT = ViTConfig(img_size=(64, 48), patch_size=16, embed_dim=32, depth=2,
                     num_heads=2, dtype=jnp.float32)
TINY_HAMER = HamerConfig(
    backbone=TINY_VIT, head_dim=32, head_depth=1, head_heads=2, head_dim_head=8,
    head_mlp_dim=32, context_dim=32, image_size=64, dtype=jnp.float32,
)


def test_attention_xla_matches_naive():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 2, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 8, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 8, 4)).astype(np.float32))
    out = np.asarray(attention_xla(q, k, v))
    s = 1 / np.sqrt(4)
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * s
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", w, np.asarray(v))
    np.testing.assert_allclose(out, expected, atol=2e-2)  # bf16-class matmuls

    out2 = np.asarray(multi_head_attention(q, k, v))  # dispatcher on CPU = xla
    np.testing.assert_allclose(out2, out, atol=1e-6)


def test_attention_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 4, 4)).astype(np.float32))
    mask = jnp.ones((1, 1, 4, 4), bool).at[..., 3].set(False)
    out = attention_xla(q, k, v, mask=mask)
    # masked key contributes nothing: recompute without key 3
    out_ref = attention_xla(q, k[:, :, :3], v[:, :, :3])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)


def test_vit_shapes_and_determinism():
    model = ViT(TINY_VIT)
    x = jnp.ones((2, 64, 48, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, (64 // 16) * (48 // 16), 32)
    out2 = model.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_vit_cls_token_and_intermediates():
    cfg = ViTConfig(img_size=(28, 28), patch_size=14, embed_dim=16, depth=3,
                    num_heads=2, use_cls_token=True, layerscale_init=1e-5,
                    dtype=jnp.float32)
    model = ViT(cfg)
    x = jnp.ones((1, 28, 28, 3))
    params = model.init(jax.random.key(0), x)
    inter, final, cls = model.apply(params, x, out_layers=[0, 2])
    assert len(inter) == 2
    assert inter[0].shape == (1, 4, 16)
    assert final.shape == (1, 4, 16)
    assert cls.shape == (1, 16)


def test_pos_embed_interpolation():
    pos = jnp.ones((1, 4 * 3, 8))
    out = interpolate_pos_embed(pos, (4, 3), (8, 6))
    assert out.shape == (1, 48, 8)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_hamer_forward_contract():
    model = Hamer(TINY_HAMER)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    mano = synthetic_mano()
    out = hamer_forward(model, params, mano, x)
    assert out.vertices.shape == (2, 778, 3)
    assert out.keypoints_3d.shape == (2, 21, 3)
    assert out.keypoints_2d.shape == (2, 21, 2)
    assert out.global_orient.shape == (2, 1, 3, 3)
    assert out.hand_pose.shape == (2, 15, 3, 3)
    # rotations orthonormal
    R = np.asarray(out.hand_pose).reshape(-1, 3, 3)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-4
    )
    # cam_t formula: tz = 2f / (image_size * s)
    s = np.asarray(out.pred_cam)[:, 0]
    tz = np.asarray(out.pred_cam_t)[:, 2]
    np.testing.assert_allclose(tz, 2 * 5000.0 / (64 * s + 1e-9), rtol=1e-5)


def test_hamer_jit_compiles():
    model = Hamer(TINY_HAMER)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)

    @jax.jit
    def fwd(p, im):
        return model.apply(p, im)

    go, hp, betas, cam = fwd(params, x)
    assert go.shape == (1, 1, 3, 3) and betas.shape == (1, 10) and cam.shape == (1, 3)
