"""Sweep the Pallas rasterizer's pixel-tile shape on the real device.

The fwd/bwd kernels are elementwise-bound per face*pixel: every face
iteration does a [th, tw] tile of VPU math (floor analysis in
ops/rasterizer.py). Shrinking the tile cuts per-face vector work
(128*128)/(th*tw)x against three costs that grow: grid-step count, faces
straddling more tile edges (padded bbox ~9 px at sigma 0.7), and the
backward's [T, K] geometry scatter-add. This sweeps tile shapes on the
bench's 61k-face sphere mesh (the same raster_fwd/raster_grad graphs
bench.py times) in one subprocess per shape so the jit caches and the
lru-cached Pallas factory can't leak a stale tile shape across configs.

Usage: python tools/exp_raster_tile.py [th,tw th,tw ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time
import jax, jax.numpy as jnp
import numpy as np
from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache
_enable_cache()
from followmyhold_tpu.ops.surface import marching_tets, vertex_normals
from followmyhold_tpu.ops.rasterizer import render_normal_and_disparity
from followmyhold_tpu.ops.camera import GuidanceCamera

res = 64
n = res + 1
g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
sdf0 = jnp.asarray((np.sqrt(X**2 + Y**2 + Z**2) - 0.8).reshape(-1))
lo = jnp.asarray([-1.1] * 3); hi = jnp.asarray([1.1] * 3)
mesh0 = jax.jit(lambda s: marching_tets(s, lo, hi, res, max_verts=65536,
                                        max_faces=131072))(sdf0)
nf = int(np.asarray(mesh0.face_mask).sum())
cam = GuidanceCamera(height=512, width=512, fov_deg=60.0)
shift = jnp.asarray([0.0, 0.0, -2.5])

def raster_loss(verts):
    vmesh = mesh0._replace(verts=verts + shift)
    vn = vertex_normals(vmesh)
    n01, disp01, out = render_normal_and_disparity(
        cam, vmesh.verts, vmesh.faces, vn, vmesh.face_mask,
        faces_per_tile=KCAP)
    return jnp.sum(n01) + jnp.sum(disp01) + jnp.sum(out.alpha)

@jax.jit
def fwd8(verts):
    def step(c, _):
        return c + raster_loss(c) * 1e-12 * jnp.ones(3), ()
    return jax.lax.scan(step, verts, None, length=8)[0]

@jax.jit
def grad8(verts):
    def step(c, _):
        return c + jax.grad(raster_loss)(c) * 1e-12, ()
    return jax.lax.scan(step, verts, None, length=8)[0]

def timeit(fn, x, iters=3):
    np.asarray(fn(x))
    t0 = time.time()
    for _ in range(iters):
        np.asarray(fn(x))
    return (time.time() - t0) / iters / 8

tile = os.environ.get("FOHO_RASTER_TILE", "128x128")
f = timeit(fwd8, mesh0.verts)
gr = timeit(grad8, mesh0.verts)
# alpha checksum for cross-config value agreement
from followmyhold_tpu.ops.rasterizer import rasterize
vm = mesh0._replace(verts=mesh0.verts + shift)
out = jax.jit(lambda v: rasterize(cam, v, vm.faces, vertex_normals(vm),
                                  vm.face_mask, faces_per_tile=KCAP))(vm.verts)
chk = float(jnp.sum(out.alpha)), int(jnp.sum(out.face_id >= 0))
print(f"RESULT tile={tile} K={KCAP} faces={nf} fwd_ms={f*1e3:.1f} "
      f"grad_ms={gr*1e3:.1f} alpha_sum={chk[0]:.2f} npix={chk[1]}",
      flush=True)
"""


def main():
    # "THxTW" or "THxTW:K" (per-tile face capacity; default 8192). The r4
    # follow-up measured TRUE counts on this mesh: 16216 max at 128x128,
    # 6635 at 32x128 — so the original sweep compared 128x128 WITH silent
    # face drops against small tiles without; honest capacities matter.
    shapes = sys.argv[1:] or ["128x128:16384", "128x128:24576", "32x128",
                              "32x128:8192", "16x128:8192"]
    for s in shapes:
        tile, _, k = s.partition(":")
        env = dict(os.environ, FOHO_RASTER_TILE=tile,
                   FOHO_RASTER_FPT=k or "8192")
        child = _CHILD.replace("KCAP", k or "8192")
        r = subprocess.run([sys.executable, "-c", child], env=env,
                           capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                break
        else:
            print(f"RESULT tile={s} FAILED rc={r.returncode}", flush=True)
            tail = (r.stderr or "")[-2000:]
            print(tail, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
