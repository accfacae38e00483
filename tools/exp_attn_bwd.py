"""TPU experiment: flash-attention backward timing at geo-decoder shapes.

Times grad of _flash_mha at the hot shape (q [1,16,8192,64], kv 3072) with
the op wrapped x16 in lax.scan inside ONE jit (per-dispatch RPC over the
tunnel is ~3 ms — never microbenchmark per-call). Run on the working tree
vs a stashed two-pass baseline to compare kernels.

Run: python tools/exp_attn_bwd.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops import attention as A


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def main() -> None:
    key = jax.random.key(0)
    kq, kk, kv_, kg = jax.random.split(key, 4)
    shape_q = (1, 16, 8192, 64)
    shape_kv = (1, 16, 3072, 64)
    q = jax.random.normal(kq, shape_q, jnp.bfloat16)
    k = jax.random.normal(kk, shape_kv, jnp.bfloat16)
    v = jax.random.normal(kv_, shape_kv, jnp.bfloat16)
    g = jax.random.normal(kg, shape_q, jnp.bfloat16)
    scale = 0.125

    @jax.jit
    def grad16(q, k, v):
        def step(c, _):
            qq, kk2, vv = c
            dq, dk, dv = jax.grad(
                lambda q_, k_, v_: jnp.sum(
                    A._flash_mha(q_, k_, v_, scale).astype(jnp.float32) *
                    g.astype(jnp.float32)),
                argnums=(0, 1, 2))(qq, kk2, vv)
            return (qq + dq.astype(qq.dtype) * 1e-6,
                    kk2 + dk.astype(kk2.dtype) * 1e-6,
                    vv + dv.astype(vv.dtype) * 1e-6), ()
        (qo, ko, vo), _ = jax.lax.scan(step, (q, k, v), None, length=16)
        return qo

    _sync(grad16(q, k, v))
    t0 = time.time()
    for _ in range(3):
        _sync(grad16(q, k, v))
    per = (time.time() - t0) / 3 / 16
    print(f"# fwd+bwd per call: {per*1e3:.2f} ms", flush=True)

    @jax.jit
    def fwd16(q, k, v):
        def step(c, _):
            qq, kk2, vv = c
            o = A._flash_mha(qq, kk2, vv, scale)
            return (qq + o * 1e-6, kk2, vv), ()
        (qo, _, _), _ = jax.lax.scan(step, (q, k, v), None, length=16)
        return qo

    _sync(fwd16(q, k, v))
    t0 = time.time()
    for _ in range(3):
        _sync(fwd16(q, k, v))
    per_f = (time.time() - t0) / 3 / 16
    print(f"# fwd only per call: {per_f*1e3:.2f} ms", flush=True)
    print(f"# bwd estimate: {(per-per_f)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
