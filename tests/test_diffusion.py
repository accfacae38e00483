"""Scheduler parity + Hunyuan stack shape/grad tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.diffusion.scheduler import (
    make_schedule,
    scale_noise,
    step,
    step_final,
)
from followmyhold_tpu.models.hunyuan import (
    COND_TINY,
    DIT_TINY,
    VAE_TINY,
    Conditioner,
    HunyuanDiT,
    ShapeVAE,
    fourier_embed,
    vae_query_logits,
)


def test_schedule_reversed_sigmas():
    # FOHO passes sigmas = linspace(0,1,N) (pipelines.py:1187)
    sched = make_schedule(sigmas=np.linspace(0, 1, 20))
    s = np.asarray(sched.sigmas)
    assert s.shape == (21,)
    np.testing.assert_allclose(s[:20], np.linspace(0, 1, 20), atol=1e-6)
    assert s[20] == 1.0
    np.testing.assert_allclose(np.asarray(sched.timesteps), s[:20] * 1000, rtol=1e-6)
    # sigmas ASCEND (reversed vs. standard diffusers)
    assert (np.diff(s[:20]) > 0).all()


def test_schedule_shift_transform():
    sched = make_schedule(sigmas=np.linspace(0, 1, 10), shift=3.0)
    s_in = np.linspace(0, 1, 10)
    expected = 3.0 * s_in / (1 + 2.0 * s_in)
    np.testing.assert_allclose(np.asarray(sched.sigmas)[:10], expected, rtol=1e-6)


def test_step_euler_update():
    sched = make_schedule(sigmas=np.linspace(0, 1, 5))
    x = jnp.ones((2, 4))
    eps = jnp.full((2, 4), 0.5)
    prev, pred_x1 = step(sched, 1, eps, x)
    s = np.linspace(0, 1, 5)
    np.testing.assert_allclose(np.asarray(prev), 1 + (s[2] - s[1]) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pred_x1), 1 + (1 - s[1]) * 0.5, rtol=1e-6)


def test_step_final_matches_pred_x1():
    sched = make_schedule(sigmas=np.linspace(0, 1, 5))
    x = jnp.ones((1, 3)) * 2.0
    eps = jnp.ones((1, 3)) * -1.0
    _, pred = step(sched, 2, eps, x)
    np.testing.assert_allclose(np.asarray(step_final(sched, 2, eps, x)),
                               np.asarray(pred))


def test_full_denoise_reaches_x1():
    # with a perfect constant velocity field eps = x1 - x0, Euler integration
    # of the reversed flow reaches x1 exactly
    n = 10
    sched = make_schedule(sigmas=np.linspace(0, 1, n))
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8)).astype(np.float32))
    x1 = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)).astype(np.float32))
    eps = x1 - x0
    x = x0
    for i in range(n):
        x, _ = step(sched, i, eps, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x1), atol=1e-5)


def test_scale_noise():
    sched = make_schedule(sigmas=np.linspace(0, 1, 5))
    x = jnp.ones((2, 2))
    noise = jnp.zeros((2, 2))
    out = scale_noise(sched, 2, x, noise)
    np.testing.assert_allclose(np.asarray(out), 1 - np.linspace(0, 1, 5)[2])


def test_dit_shapes_and_cfg_batching():
    model = HunyuanDiT(DIT_TINY)
    latents = jnp.ones((2, 16, 64))
    t = jnp.asarray([0.3, 0.3])
    cond = jnp.ones((2, 4, 32))
    params = model.init(jax.random.key(0), latents, t, cond)
    eps = model.apply(params, latents, t, cond)
    assert eps.shape == (2, 16, 64)
    assert np.isfinite(np.asarray(eps)).all()


def test_vae_query_logits_chunking():
    model = ShapeVAE(VAE_TINY)
    latents = jnp.ones((1, 16, 8))
    queries = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 100, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), latents, queries[:, :4])
    full = vae_query_logits(model, params, latents, queries, chunk=128)
    chunked = vae_query_logits(model, params, latents, queries, chunk=32)
    assert full.shape == (1, 100)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)
    # chunk-group batching (incl. the group-equalization path: 4 chunks at
    # group=3 equalizes to 2 groups of 2) must not change values
    for group in (1, 2, 3, 4, 7):
        grouped = vae_query_logits(model, params, latents, queries, chunk=32,
                                   group=group)
        np.testing.assert_allclose(np.asarray(full), np.asarray(grouped),
                                   atol=1e-5)


def test_vae_query_logits_differentiable_wrt_latents():
    model = ShapeVAE(VAE_TINY)
    latents = jnp.ones((1, 16, 8))
    queries = jnp.zeros((1, 10, 3))
    params = model.init(jax.random.key(0), latents, queries)

    def loss(lat):
        return vae_query_logits(model, params, lat, queries).sum()

    g = jax.grad(loss)(latents)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_vae_query_logits_remat_modes_agree():
    """remat='full'/'tail'/'none' are pure scheduling choices: values and
    d/d(latents) must be bit-comparable."""
    model = ShapeVAE(VAE_TINY)
    latents = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 16, 8)).astype(np.float32))
    queries = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 100, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), latents, queries[:, :4])

    def loss(lat, mode):
        return vae_query_logits(model, params, lat, queries, chunk=32,
                                remat=mode).sum()

    v0, g0 = jax.value_and_grad(lambda l: loss(l, "full"))(latents)
    for mode in ("tail", "none"):
        v, g = jax.value_and_grad(lambda l: loss(l, mode))(latents)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v0), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0),
                                   rtol=1e-5, atol=1e-6)


def test_conditioner_uncond_shapes():
    # cls + 4 patches: hy3dgen DinoImageEncoder(use_cls_token=True) feeds
    # last_hidden_state (cls included) to the DiT; uncond matches
    model = Conditioner(COND_TINY)
    img = jnp.ones((2, 28, 28, 3)) * 0.5
    params = model.init(jax.random.key(0), img)
    cond = model.apply(params, img)
    assert cond["main"].shape == (2, 5, 32)
    uncond = model.apply(params, 2, method=Conditioner.unconditional_embedding)
    assert uncond["main"].shape == (2, 5, 32)


def test_fourier_embed_shape():
    x = jnp.ones((5, 3))
    e = fourier_embed(x, 4)
    assert e.shape == (5, 3 * 9)


def test_scheduler_shift_plumbing(tmp_path, monkeypatch):
    """A checkpoint scheduler_config with shift != 1 must reach every
    sampler (the reference applies config.shift inside set_timesteps even
    for explicitly-passed sigmas — schedulers.py:199-202). Covers the
    converter-saved config -> scheduler_shift() roundtrip, the guided
    sampler's schedule, and the HOI-stage denoise loop."""
    monkeypatch.setenv("FOHO_TPU_ASSETS", str(tmp_path))
    from followmyhold_tpu.utils import params as P

    assert P.scheduler_shift() == 1.0        # no config saved -> default
    P.save_scheduler_config({"shift": 3.0})
    assert P.scheduler_shift() == 3.0

    from followmyhold_tpu.diffusion.guidance import GuidedSampler

    sampler = GuidedSampler(dit=None, vae=None, camera=None,
                            scheduler_shift=P.scheduler_shift())
    sched = sampler._schedule(10)
    s_in = np.linspace(0, 1, 10)
    np.testing.assert_allclose(np.asarray(sched.sigmas)[:10],
                               3.0 * s_in / (1 + 2.0 * s_in), rtol=1e-6)
    base = GuidedSampler(dit=None, vae=None, camera=None)._schedule(10)
    assert not np.allclose(np.asarray(sched.sigmas)[:10],
                           np.asarray(base.sigmas)[:10])

    # HOI-stage loop: shift must change the sampled latents
    from followmyhold_tpu.diffusion.pipeline import denoise_latents

    model = HunyuanDiT(DIT_TINY)
    cond = jnp.ones((1, 4, 32)) * 0.1
    uncond = jnp.zeros((1, 4, 32))
    params = model.init(jax.random.key(0), jnp.ones((2, 16, 64)),
                        jnp.asarray([0.3, 0.3]), jnp.concatenate([cond, uncond]))
    kw = dict(latent_shape=(16, 64), num_inference_steps=4)
    lat1 = denoise_latents(model, params, cond, uncond, jax.random.key(1),
                           scheduler_shift=1.0, **kw)
    lat3 = denoise_latents(model, params, cond, uncond, jax.random.key(1),
                           scheduler_shift=3.0, **kw)
    assert not np.allclose(np.asarray(lat1), np.asarray(lat3))


def test_scheduler_matches_reference_torch():
    """Direct oracle vs the reference's patched scheduler file
    (third_party_patches/hy3dgen/shapegen/schedulers.py), not just
    hand-derived parity: sigma/timestep construction (default + shift) and
    step / step_no_update / step_final outputs on random tensors."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import _torch_oracles as oracles

    if not oracles.reference_available():
        import pytest

        pytest.skip("reference tree not available")
    import torch

    ref_mod = oracles.import_reference_scheduler()
    from followmyhold_tpu.diffusion.scheduler import (
        make_schedule,
        step,
        step_final,
        step_no_update,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 16, 8)).astype(np.float32)
    eps = rng.normal(0, 1, (1, 16, 8)).astype(np.float32)

    for shift in (1.0, 3.0):
        ref = ref_mod.FlowMatchEulerDiscreteScheduler(shift=shift)
        ref.set_timesteps(20)
        ours = make_schedule(num_inference_steps=20, shift=shift)
        np.testing.assert_allclose(np.asarray(ours.sigmas),
                                   ref.sigmas.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours.timesteps),
                                   ref.timesteps.numpy(), rtol=1e-5, atol=1e-4)

        # explicit-sigmas path (what the guided sampler + HOI stage use):
        # the reference applies config.shift to the PASSED sigmas too
        # (schedulers.py:199-202)
        ref_e = ref_mod.FlowMatchEulerDiscreteScheduler(shift=shift)
        ref_e.set_timesteps(sigmas=np.linspace(0, 1, 20))
        ours_e = make_schedule(sigmas=np.linspace(0, 1, 20), shift=shift)
        np.testing.assert_allclose(np.asarray(ours_e.sigmas),
                                   ref_e.sigmas.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ours_e.timesteps),
                                   ref_e.timesteps.numpy(), rtol=1e-5,
                                   atol=1e-4)

        for i in (0, 7, 18):
            ref._step_index = i
            out = ref.step(torch.from_numpy(eps), ref.timesteps[i],
                           torch.from_numpy(x))
            prev, x1 = step(ours, i, jnp.asarray(eps), jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(prev),
                                       out.prev_sample.numpy(),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(x1),
                                       out.pred_x1.numpy(),
                                       rtol=1e-5, atol=1e-6)

            ref._step_index = i
            out2 = ref.step_no_update(torch.from_numpy(eps), ref.timesteps[i],
                                      torch.from_numpy(x))
            assert ref._step_index == i        # index NOT advanced
            prev2, x12 = step_no_update(ours, i, jnp.asarray(eps),
                                        jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(prev2),
                                       out2.prev_sample.numpy(),
                                       rtol=1e-5, atol=1e-6)

            ref._step_index = i
            out3 = ref.step_final(torch.from_numpy(eps), ref.timesteps[i],
                                  torch.from_numpy(x))
            x13 = step_final(ours, i, jnp.asarray(eps), jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(x13), out3.numpy(),
                                       rtol=1e-5, atol=1e-6)
