"""CPU validation of the Pallas flash-attention kernel via interpret mode
(the kernel itself; the dispatcher's XLA fallback is covered elsewhere)."""

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from followmyhold_tpu.ops import attention as A


def _run_interpreted(fn, *args, **kw):
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    try:
        return fn(*args, **kw)
    finally:
        pl.pallas_call = orig


def test_flash_kernel_matches_xla_exact_blocks():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 512, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 512, 64)).astype(np.float32))
    out, _ = _run_interpreted(A._flash_attention_pallas, q, k, v, 512, 0.125, 256, 256)
    ref = A.attention_xla(q, k, v, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_kernel_ragged_kv_masking():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 212), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 212), (0, 0)))
    out, _ = _run_interpreted(A._flash_attention_pallas, q, kp, vp, 300, 0.125,
                              256, 256)
    ref = A.attention_xla(q, k, v, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _xla_grads(q, k, v, g, scale):
    def f(q, k, v):
        return jnp.sum(A.attention_xla(q, k, v, scale=scale) * g)
    import jax
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


def _flash_grads(q, k, v, g, scale):
    import jax

    def f(q, k, v):
        return jnp.sum(A._flash_mha(q, k, v, scale) * g)
    return jax.grad(f, argnums=(0, 1, 2))(q, k, v)


def test_flash_backward_matches_xla_exact_blocks():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 512, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 512, 64)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    dq, dk, dv = _run_interpreted(_flash_grads, q, k, v, g, 0.125)
    rq, rk, rv = _xla_grads(q, k, v, g, 0.125)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4)


def test_flash_backward_ragged_shapes():
    """Unpadded N/M exercise the padding + masking paths of the backward."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 410, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 410, 64)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    dq, dk, dv = _run_interpreted(_flash_grads, q, k, v, g, 0.125)
    rq, rk, rv = _xla_grads(q, k, v, g, 0.125)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4)


def test_flash_forward_emits_logsumexp():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, 1, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 256, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 256, 64)).astype(np.float32))
    out, lse = _run_interpreted(A._flash_attention_pallas, q, k, v, 256, 0.125,
                                256, 256)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * 0.125
    ref_lse = np.log(np.exp(s).sum(-1))
    np.testing.assert_allclose(np.asarray(lse), ref_lse, atol=1e-4)
