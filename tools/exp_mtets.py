"""TPU experiment: where does the marching_tets forward go?

Times the full kernel and its stages separately at bench shapes (65^3 grid,
24576/49152 caps): the two jnp.nonzero compactions are suspected to cost
~25 ms each (CLAUDE.md r2 notes). Run: python tools/exp_mtets.py
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

from followmyhold_tpu.ops import surface as S


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    small = min(leaves, key=lambda l: getattr(l, "size", 1 << 60))
    np.asarray(small)


def _timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.time() - t0) / iters


def main() -> None:
    res = 64
    n = res + 1
    g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = jnp.asarray((np.sqrt(X**2 + Y**2 + Z**2) - 0.8).reshape(-1))
    bmin = jnp.asarray([-1.1] * 3)
    bmax = jnp.asarray([1.1] * 3)
    mv, mf = 24576, 49152

    t = _timeit(lambda s: S.marching_tets(s, bmin, bmax, res, mv, mf), sdf)
    print(f"# mtets full fwd: {t*1e3:.1f} ms", flush=True)

    # stage: active-edge detection + nonzero compaction only
    @jax.jit
    def stage_edges(sdf_grid):
        s = sdf_grid.reshape(n, n, n)
        ends = jnp.stack([
            jnp.pad(s, ((0, int(d[0])), (0, int(d[1])), (0, int(d[2]))),
                    constant_values=1e9)[int(d[0]):, int(d[1]):, int(d[2]):]
            for d in np.asarray(S._DIRS)])
        active = (jnp.sign(s[None]) != jnp.sign(ends)) & (jnp.abs(ends) < 1e8)
        flat = active.transpose(1, 2, 3, 0).reshape(-1)
        (ids,) = jnp.nonzero(flat, size=mv, fill_value=0)
        return ids

    t = _timeit(stage_edges, sdf)
    print(f"# edge detect + nonzero({n**3*7}->:{mv}): {t*1e3:.1f} ms", flush=True)

    # stage: the same detection without the nonzero
    @jax.jit
    def stage_detect(sdf_grid):
        s = sdf_grid.reshape(n, n, n)
        ends = jnp.stack([
            jnp.pad(s, ((0, int(d[0])), (0, int(d[1])), (0, int(d[2]))),
                    constant_values=1e9)[int(d[0]):, int(d[1]):, int(d[2]):]
            for d in np.asarray(S._DIRS)])
        active = (jnp.sign(s[None]) != jnp.sign(ends)) & (jnp.abs(ends) < 1e8)
        return active.transpose(1, 2, 3, 0).reshape(-1).sum()

    t = _timeit(stage_detect, sdf)
    print(f"# edge detect only: {t*1e3:.1f} ms", flush=True)

    # stage: face-candidate nonzero at [r^3*12]
    cand = jnp.zeros(res**3 * 12, bool).at[:mf // 2].set(True)

    @jax.jit
    def stage_face_nz(c):
        (ids,) = jnp.nonzero(c, size=mf, fill_value=0)
        return ids

    t = _timeit(stage_face_nz, cand)
    print(f"# face nonzero({res**3*12}->{mf}): {t*1e3:.1f} ms", flush=True)

    # stage: slot-channel volumes + one-hot selection (tet loop)
    @jax.jit
    def stage_channels(sdf_grid):
        s = sdf_grid.reshape(n, n, n)
        slot_of_key = jnp.arange(n**3 * 7, dtype=jnp.int32) % mv
        r = res
        ins3 = s < 0
        corner_cols = [
            ins3[c[0]:c[0] + r, c[1]:c[1] + r, c[2]:c[2] + r].reshape(-1)
            for c in np.asarray(S._CORNERS)]
        lookup = jnp.asarray(S._FACE_LOOKUP)
        case_iota = jnp.arange(16, dtype=jnp.int32)[None]
        slot3 = slot_of_key.reshape(n, n, n, 7)
        e_t = jnp.stack(
            [slot3[ox:ox + r, oy:oy + r, oz:oz + r, d].reshape(-1)
             for (ox, oy, oz, d) in S._SLOT_CHANNELS], axis=-1
        ).astype(jnp.float32)
        sel = jnp.asarray(S._SLOT_SEL)
        out = []
        for tnum in range(6):
            tet = S._TETS[tnum]
            case = (corner_cols[tet[0]].astype(jnp.int32)
                    + 2 * corner_cols[tet[1]]
                    + 4 * corner_cols[tet[2]]
                    + 8 * corner_cols[tet[3]])
            onehot = (case[:, None] == case_iota).astype(jnp.float32)
            vals = onehot @ lookup[tnum]
            st = sel[tnum].reshape(6 * 16, -1)
            gsel = (e_t @ st.T).reshape(-1, 6, 16)
            slots = jnp.sum(gsel * onehot[:, None, :], axis=-1)
            out.append(slots.sum())
        return sum(out)

    t = _timeit(stage_channels, sdf)
    print(f"# channel volumes + one-hot select: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
