import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from followmyhold_tpu.utils.compilation_cache import enable
enable()
from followmyhold_tpu.models.hunyuan import ShapeVAE, ShapeVAEConfig, vae_query_logits
from followmyhold_tpu.utils.params import fast_init
from followmyhold_tpu.ops.grid import generate_dense_grid_points

xyz, _, _ = generate_dense_grid_points([-1.1]*3, [1.1]*3, 64)
xyz = jnp.asarray(xyz)

def timeit(fn, *a, iters=3):
    r = fn(*a); np.asarray(jax.tree_util.tree_leaves(r)[0])
    t0 = time.time()
    for _ in range(iters):
        r = fn(*a); np.asarray(jax.tree_util.tree_leaves(r)[0])
    return (time.time()-t0)/iters

for remat_blocks, remat_chunks in ((True, True), (False, True), (True, False), (False, False)):
    cfg = ShapeVAEConfig(remat_blocks=remat_blocks)
    vae = ShapeVAE(cfg)
    lat = jax.random.normal(jax.random.key(0), (1, cfg.num_latents, cfg.embed_dim))
    vp = fast_init(vae.init, lat, jnp.zeros((1, 8, 3)))
    try:
        g = jax.jit(jax.grad(lambda l: vae_query_logits(
            vae, vp, l, xyz[None], 8192, remat_chunks=remat_chunks).sum()))
        print(f"blocks={remat_blocks} chunks={remat_chunks}: grad {timeit(g, lat)*1e3:.1f} ms", flush=True)
    except Exception as e:
        print(f"blocks={remat_blocks} chunks={remat_chunks}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
    del vp
    import gc; gc.collect()
print("DONE", flush=True)
