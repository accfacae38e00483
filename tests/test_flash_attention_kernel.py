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
    out = _run_interpreted(A._flash_attention_pallas, q, k, v, 512, 0.125, 256, 256)
    ref = A.attention_xla(q, k, v, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_kernel_ragged_kv_masking():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 300, 64)).astype(np.float32))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, 212), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, 212), (0, 0)))
    out = _run_interpreted(A._flash_attention_pallas, q, kp, vp, 300, 0.125,
                           256, 256)
    ref = A.attention_xla(q, k, v, scale=0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
