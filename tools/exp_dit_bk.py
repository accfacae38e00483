"""TPU experiment: DiT flash-attention kv block size at the 4442-token shape.

The DiT's joint sequence is 3072 latents + 1370 cond = 4442 tokens; with
bk=1024 the kv sweep pads to 5120 (15% masked tail). bk=768 pads to 4608
(3.7%) at slightly more per-block overhead; bk=512 likewise 4608 with more
iterations. Times one CFG step per bk via a x4 scan in ONE jit (per-dispatch
RPC over the tunnel is ~3 ms — never time per-call).

Run on TPU: python tools/exp_dit_bk.py
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

from followmyhold_tpu.models import hunyuan as H
from followmyhold_tpu.ops import attention as A
from followmyhold_tpu.utils.params import fast_init


def _sync(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def main() -> None:
    dit_cfg = H.DIT_FULL
    dit = H.HunyuanDiT(dit_cfg)
    lat = jax.random.normal(jax.random.key(0), (1, 3072, 64))
    cond = jax.random.normal(jax.random.key(1), (2, 1370, dit_cfg.context_dim),
                             jnp.bfloat16)
    print("# init dit params...", flush=True)
    params = fast_init(dit.init, lat, jnp.zeros(1), cond[:1])
    print("# params ready", flush=True)

    orig = A._block_sizes

    def run(bk_choice):
        def patched(N, M):
            bq, bk = orig(N, M)
            Mp0 = ((M + 255) // 256) * 256
            if Mp0 > 3072:          # only the long-kv path (the DiT shape)
                bk = bk_choice
            return bq, bk

        A._block_sizes = patched

        @jax.jit
        def step(p, l, c):
            # thread the carry INTO the measured op so XLA cannot hoist the
            # loop-invariant forward out of the scan (bench.py pattern)
            def body(carry, _):
                lat_in = jnp.concatenate([carry, carry], axis=0)
                eps = dit.apply(p, lat_in, jnp.full((2,), 0.5), c)
                eps_c, eps_u = jnp.split(eps, 2, axis=0)
                guided = eps_u + 5.0 * (eps_c - eps_u)
                return carry + guided.astype(carry.dtype) * 1e-30, None

            out, _ = jax.lax.scan(body, l, None, length=4)
            return out

        try:
            out = step(params, lat, cond)
            _sync(out)
            t0 = time.time()
            out = step(params, lat, cond)
            _sync(out)
            dt = (time.time() - t0) / 4
            print(f"# bk={bk_choice}: {dt * 1e3:.1f} ms/cfg-step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"# bk={bk_choice}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
        finally:
            A._block_sizes = orig

    for bk in (1024, 768, 512):
        run(bk)


if __name__ == "__main__":
    main()
