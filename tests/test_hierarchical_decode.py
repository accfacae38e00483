"""Hierarchical (two-level) export decode == dense decode.

The final 384^3 export decode is the single biggest per-image cost
(~38 s/image dense). vae_query_logits_hierarchical refines only surface
cells. On a Lipschitz field (what a trained shape VAE produces — it
represents a watertight surface) the refined grid must reproduce the dense
decode's mesh EXACTLY; on an adversarial high-frequency noise field (random
tiny-VAE weights, fourier features up to 2^7) the selected cells still carry
exact values and the output stays finite under cap overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.hunyuan import (
    VAE_TINY,
    ShapeVAE,
    compose_hierarchical_grid,
    vae_query_logits,
    vae_query_logits_hierarchical,
)


def _hier_dense(vae, params, lat, res, chunk, cell_cap, use_pt_ids=True):
    g_c, pt_ids, fine, n_sel, n_pts = vae_query_logits_hierarchical(
        vae, params, lat, [-BOX] * 3, [BOX] * 3, res, chunk=chunk,
        cell_cap=cell_cap)
    return compose_hierarchical_grid(
        g_c, fine, res, cell_cap=cell_cap, expect_n_pts=int(n_pts),
        pt_ids=pt_ids if use_pt_ids else None), n_sel
from followmyhold_tpu.ops.grid import generate_dense_grid_points
from followmyhold_tpu.ops.surface import marching_tets_host

RES = 64
BOX = 1.1


class AnalyticVae:
    """Duck-typed stand-in whose geo query evaluates an analytic field
    (logits = -sdf), so hierarchical-vs-dense equality is testable on a
    realistic Lipschitz surface instead of random-weight noise."""

    class cfg:  # noqa: N801 — mimics ShapeVAE.cfg
        scale_factor = 1.0

    def __init__(self, sdf_fn):
        self.sdf_fn = sdf_fn

    def apply(self, params, *args, method=None):
        name = getattr(method, "__name__", "")
        if name in ("decode", "geo_kv"):
            return args[0]
        q = args[0]                      # geo_query(queries, kv)
        return -self.sdf_fn(q)


def _two_spheres(q):
    a = jnp.linalg.norm(q - jnp.asarray([0.25, 0.0, 0.1]), axis=-1) - 0.55
    b = jnp.linalg.norm(q + jnp.asarray([0.4, 0.3, 0.0]), axis=-1) - 0.35
    return jnp.minimum(a, b)


def test_hierarchical_exact_on_lipschitz_field():
    vae = AnalyticVae(_two_spheres)
    lat = jnp.zeros((1, 4, 4))
    xyz, _, _ = generate_dense_grid_points([-BOX] * 3, [BOX] * 3, RES)
    dense = np.asarray(
        vae_query_logits(vae, None, lat, jnp.asarray(xyz)[None], 4096)[0])
    hier, n_sel = _hier_dense(vae, None, lat, RES, 4096, 4096)
    assert 0 < int(n_sel) <= 4096

    hv, hf = marching_tets_host(-dense, [-BOX] * 3, [BOX] * 3, RES)
    sv, sf = marching_tets_host(-hier, [-BOX] * 3, [BOX] * 3, RES)
    assert len(hv) > 100
    assert len(sv) == len(hv) and len(sf) == len(hf)
    np.testing.assert_allclose(sv, hv, atol=1e-5)
    np.testing.assert_array_equal(sf, hf)

    # the host-recompute compose fallback (no pt_ids) must match exactly
    hier2, _ = _hier_dense(vae, None, lat, RES, 4096, 4096, use_pt_ids=False)
    np.testing.assert_array_equal(hier2, hier)


def test_selected_cells_exact_on_noise_field():
    """Random tiny-VAE weights give an aliased noise field — selection can't
    be complete there, but every SELECTED cell must carry exact fine values
    and sign agreement must still be high."""
    vae = ShapeVAE(VAE_TINY)
    lat = jax.random.normal(jax.random.key(0),
                            (1, VAE_TINY.num_latents, VAE_TINY.embed_dim))
    params = vae.init(jax.random.key(1), lat, jnp.zeros((1, 8, 3)))
    xyz, _, _ = generate_dense_grid_points([-BOX] * 3, [BOX] * 3, RES)
    dense = np.asarray(
        vae_query_logits(vae, params, lat, jnp.asarray(xyz)[None], 2048)[0])
    hier, n_sel = _hier_dense(vae, params, lat, RES, 2048, 8192)
    agree = np.mean(np.sign(hier) == np.sign(dense))
    assert agree > 0.99, agree


def test_export_refine_ids_host_matches_device_on_noise_field():
    """compose_hierarchical_grid recomputes the refine-point ids on host
    instead of transferring them; host (np) and device (jnp) must derive the
    SAME ids from g_c — exercised on an adversarial random-VAE noise field
    where selection boundaries are everywhere, and under cell-cap
    truncation."""
    from followmyhold_tpu.models.hunyuan import (
        _refine_point_ids_device,
        refine_point_ids_host,
        vae_decode_kv,
        _geo_query_grouped,
    )

    vae = ShapeVAE(VAE_TINY)
    lat = jax.random.normal(jax.random.key(3),
                            (1, VAE_TINY.num_latents, VAE_TINY.embed_dim))
    params = vae.init(jax.random.key(4), lat, jnp.zeros((1, 8, 3)))
    res = 32
    kv = vae_decode_kv(vae, params, lat)
    n_c = res // 4 + 1
    ax = jnp.linspace(-BOX, BOX, n_c)
    X, Y, Z = jnp.meshgrid(ax, ax, ax, indexing="ij")
    pts = jnp.stack([X, Y, Z], -1).reshape(1, -1, 3)
    g_c = _geo_query_grouped(vae, params, kv, pts, 2048)[0].reshape(
        n_c, n_c, n_c)
    for cap in (4096, 64):                      # no-truncation + truncation
        dev_ids, n_sel, n_pts = _refine_point_ids_device(g_c, res, 4, cap, 0.5)
        host_ids = refine_point_ids_host(g_c, res, 4, cap, 0.5)
        k = min(int(n_pts), dev_ids.shape[0])
        assert host_ids.size == k, (host_ids.size, k, cap)
        np.testing.assert_array_equal(np.asarray(dev_ids)[:k], host_ids)


def test_refine_point_budget_pins_capacity_sweep():
    """Pin the empirical point budget (_refine_point_budget) and the
    indicator semantics (ADVICE r3 #3): on the capacity-sweep fields the
    deduped unique-point count stays within budget*cells, and the in-loop
    indicator fires for a shape whose cell count exceeds the cap."""
    from followmyhold_tpu.models.hunyuan import (
        _noncoarse_offsets,
        _refine_point_budget,
        _select_surface_cells,
    )

    def unique_ratio(sdf_fn, res, cf, box=1.1):
        res_c = res // cf
        n_c, n_f = res_c + 1, res + 1
        ax = np.linspace(-box, box, n_c, dtype=np.float32)
        X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
        g = -np.asarray(sdf_fn(np.stack([X, Y, Z], -1)), np.float32)
        select = _select_surface_cells(g, res_c, 0.5, np)
        ids = np.nonzero(select)[0]
        ci = ids // (res_c * res_c)
        cj = (ids // res_c) % res_c
        ck = ids % res_c
        base = np.stack([ci, cj, ck], -1).astype(np.int64) * cf
        fidx = base[:, None, :] + _noncoarse_offsets(cf).astype(np.int64)[None]
        flat = (fidx[..., 0] * n_f + fidx[..., 1]) * n_f + fidx[..., 2]
        return ids.size, np.unique(flat.reshape(-1)).size

    def sphere(r):
        return lambda q: np.linalg.norm(q, axis=-1) - r

    def box_sdf(h):
        return lambda q: np.abs(q).max(-1) - h

    ripple = lambda q: (np.linalg.norm(q, axis=-1) - 0.8            # noqa: E731
                        - 0.05 * np.sin(40 * q[..., 0])
                        * np.sin(37 * q[..., 1]) * np.sin(43 * q[..., 2]))

    for cf, res in ((2, 64), (4, 128)):
        budget = _refine_point_budget(cf)
        for field in (sphere(0.8), sphere(1.05), box_sdf(0.7), ripple):
            cells, uniq = unique_ratio(field, res, cf)
            assert cells > 0
            assert uniq <= budget * cells, (cf, cells, uniq, budget)

    # indicator semantics: a box-filling sphere overflows a small cell cap
    # and the in-loop decode reports it via the returned indicator
    vae = AnalyticVae(lambda q: jnp.linalg.norm(q, axis=-1) - 1.05)
    lat = jnp.zeros((1, 4, 4))
    _, ind = vae_query_logits_hier_grid(
        vae, None, lat, [-BOX] * 3, [BOX] * 3, 32, chunk=4096,
        coarse_factor=2, cell_cap=256)
    assert int(ind) > 256


def test_export_f16_transfer_tolerance():
    """FOHO_EXPORT_F16 device path (transfer_dtype=f16): the composed grid
    stays within f16 rounding of the f32 compose with zero sign flips on a
    Lipschitz field, and the fallback-compose guard refuses f16 g_c."""
    import pytest

    vae = AnalyticVae(_two_spheres)
    lat = jnp.zeros((1, 4, 4))
    g_c, pt_ids, fine, n_sel, n_pts, n_flips = vae_query_logits_hierarchical(
        vae, None, lat, [-BOX] * 3, [BOX] * 3, RES, chunk=4096,
        cell_cap=4096, transfer_dtype=jnp.float16)
    assert np.asarray(g_c).dtype == np.float16
    assert np.asarray(fine).dtype == np.float16
    assert int(n_flips) == 0
    hier16 = compose_hierarchical_grid(
        np.asarray(g_c), np.asarray(fine), RES, cell_cap=4096,
        expect_n_pts=int(n_pts), pt_ids=np.asarray(pt_ids))
    hier32, _ = _hier_dense(vae, None, lat, RES, 4096, 4096)
    scale = np.abs(hier32).max()
    assert np.abs(hier16 - hier32).max() <= scale * 2.0 ** -10
    assert (np.sign(hier16) == np.sign(hier32)).all()
    with pytest.raises(ValueError):   # host id recompute needs exact f32 g_c
        compose_hierarchical_grid(np.asarray(g_c), np.asarray(fine), RES,
                                  cell_cap=4096, expect_n_pts=int(n_pts))


def test_compose_ids_digest_canary():
    """The no-pt_ids compose fallback's digest canary (ADVICE r4): an
    order-invariant uint32 wrap-sum of the ids catches count-preserving
    host/device selection divergence; device (zero-padded) and host digests
    agree."""
    import pytest

    from followmyhold_tpu.models.hunyuan import refine_ids_digest

    vae = AnalyticVae(_two_spheres)
    lat = jnp.zeros((1, 4, 4))
    g_c, pt_ids, fine, n_sel, n_pts = vae_query_logits_hierarchical(
        vae, None, lat, [-BOX] * 3, [BOX] * 3, RES, chunk=4096, cell_cap=4096)
    dig = refine_ids_digest(pt_ids)        # full zero-padded device array
    ok = compose_hierarchical_grid(g_c, fine, RES, cell_cap=4096,
                                   expect_n_pts=int(n_pts),
                                   expect_ids_digest=dig)
    assert np.isfinite(ok).all()           # host digest matched the device's
    with pytest.raises(RuntimeError):      # same count, different selection
        compose_hierarchical_grid(g_c, fine, RES, cell_cap=4096,
                                  expect_n_pts=int(n_pts),
                                  expect_ids_digest=(dig + 1) % (2 ** 32))


def test_hierarchical_overflow_degrades_not_crashes():
    vae = AnalyticVae(lambda q: jnp.sin(10 * q).sum(-1) * 0.2)  # many cells
    lat = jnp.zeros((1, 4, 4))
    hier, n_sel = _hier_dense(vae, None, lat, RES, 4096, 8)
    assert np.isfinite(np.asarray(hier)).all()
    assert int(n_sel) > 8   # the cap was exceeded; values still usable


# --------------------------------------------------------------------------- #
# in-loop two-level decode (vae_query_logits_hier_grid): values AND gradients
# --------------------------------------------------------------------------- #

from followmyhold_tpu.models.hunyuan import vae_query_logits_hier_grid  # noqa: E402
from followmyhold_tpu.ops.surface import marching_tets  # noqa: E402


class AnalyticVaeLatentSphere(AnalyticVae):
    """Sphere whose center is a differentiable function of the latents (the
    kv pass-through), so grad-through-decode paths are testable without a
    trained VAE."""

    def __init__(self):
        pass

    def apply(self, params, *args, method=None):
        name = getattr(method, "__name__", "")
        if name in ("decode", "geo_kv"):
            return args[0]
        q, kv = args                                   # [G,N,3], [G,L,E]
        center = jnp.tanh(kv.reshape(kv.shape[0], -1)[:, :3]) * 0.3
        sdf = jnp.linalg.norm(q - center[:, None, :], axis=-1) - 0.55
        return -sdf


def _mesh_loss(logits_flat, res):
    mesh = marching_tets(-logits_flat, jnp.asarray([-BOX] * 3),
                         jnp.asarray([BOX] * 3), res,
                         max_verts=8192, max_faces=16384)
    w = jnp.sin(jnp.arange(mesh.verts.size).astype(jnp.float32)).reshape(
        mesh.verts.shape)
    return jnp.sum(mesh.verts * w * mesh.vert_mask[:, None])


def test_hier_grid_matches_dense_values_and_gradients():
    """The production gradient path: latents -> decode -> mtets -> loss.
    Hier and dense must agree in loss value and d(loss)/d(latents)."""
    res = 32
    vae = AnalyticVaeLatentSphere()
    lat = jnp.asarray([[[0.3, -0.2, 0.1, 0.05]]])      # [1,1,4]
    xyz, _, _ = generate_dense_grid_points([-BOX] * 3, [BOX] * 3, res)

    def loss_dense(l):
        return _mesh_loss(
            vae_query_logits(vae, None, l, jnp.asarray(xyz)[None], 4096)[0],
            res)

    def loss_hier(l):
        logits, _ = vae_query_logits_hier_grid(
            vae, None, l, [-BOX] * 3, [BOX] * 3, res, chunk=4096,
            coarse_factor=2, cell_cap=2048)
        return _mesh_loss(logits[0], res)

    vd, gd = jax.value_and_grad(loss_dense)(lat)
    vh, gh = jax.value_and_grad(loss_hier)(lat)
    np.testing.assert_allclose(vh, vd, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gh, gd, rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(gd)).max() > 1e-4         # gradient is nontrivial


def test_hier_grid_mesh_equals_dense_two_spheres():
    res = RES
    vae = AnalyticVae(_two_spheres)
    lat = jnp.zeros((1, 4, 4))
    xyz, _, _ = generate_dense_grid_points([-BOX] * 3, [BOX] * 3, res)
    dense = np.asarray(
        vae_query_logits(vae, None, lat, jnp.asarray(xyz)[None], 4096)[0])
    hier, n_sel = vae_query_logits_hier_grid(
        vae, None, lat, [-BOX] * 3, [BOX] * 3, res, chunk=4096,
        coarse_factor=2, cell_cap=8192)
    hier = np.asarray(hier[0])
    assert 0 < int(n_sel) <= 8192
    hv, hf = marching_tets_host(-dense, [-BOX] * 3, [BOX] * 3, res)
    sv, sf = marching_tets_host(-hier, [-BOX] * 3, [BOX] * 3, res)
    assert len(hv) > 100
    assert len(sv) == len(hv) and len(sf) == len(hf)
    np.testing.assert_allclose(sv, hv, atol=1e-5)
    np.testing.assert_array_equal(sf, hf)


def test_hier_grid_vmaps():
    """run_batch vmaps the decode over images; nonzero(size=...) + scatter
    must lower under vmap."""
    res = 16
    vae = AnalyticVaeLatentSphere()
    lats = jnp.asarray([[[[0.3, -0.2, 0.1, 0.05]]], [[[-0.4, 0.3, 0.0, 0.2]]]])

    def f(l):
        logits, n_sel = vae_query_logits_hier_grid(
            vae, None, l, [-BOX] * 3, [BOX] * 3, res, chunk=512,
            coarse_factor=2, cell_cap=512)
        return logits, n_sel

    batched, n = jax.vmap(f)(lats)
    one0, n0 = f(lats[0])
    one1, n1 = f(lats[1])
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(one0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(one1),
                               rtol=1e-6, atol=1e-6)


def test_hier_grid_pf_default_survives_adversarial_field():
    """pad_factor=0.5 regression pin: ripples with wavelength ~2 fine cells
    (the measured failure boundary is 0.25) must still produce the exact
    dense mesh at production resolution."""
    res = 64

    def spiky(q):
        r = jnp.linalg.norm(q, axis=-1)
        rip = (0.05 * jnp.sin(40 * q[..., 0]) * jnp.sin(37 * q[..., 1])
               * jnp.sin(43 * q[..., 2]))
        return -(r - 0.8 - rip)

    vae = AnalyticVae(spiky)
    lat = jnp.zeros((1, 4, 4))
    xyz, _, _ = generate_dense_grid_points([-1.1] * 3, [1.1] * 3, res)
    dense = np.asarray(
        vae_query_logits(vae, None, lat, jnp.asarray(xyz)[None], 8192)[0])
    hier, n_sel = vae_query_logits_hier_grid(
        vae, None, lat, [-1.1] * 3, [1.1] * 3, res, chunk=8192,
        coarse_factor=2, cell_cap=8192)
    hv, hf = marching_tets_host(-dense, [-1.1] * 3, [1.1] * 3, res)
    sv, sf = marching_tets_host(-np.asarray(hier[0]), [-1.1] * 3, [1.1] * 3, res)
    assert int(n_sel) <= 8192            # cap covers the adversarial shell
    assert len(sv) == len(hv) and len(sf) == len(hf)
    np.testing.assert_allclose(sv, hv, atol=1e-5)
    np.testing.assert_array_equal(sf, hf)


def test_hier_grid_small_cap_branches_exact():
    """Two-tier refine capacity (small_cell_cap lax.cond): both branches must
    reproduce the single-capacity decode exactly — values AND the production
    gradient path — whichever branch the predicate picks."""
    res = 32
    vae = AnalyticVaeLatentSphere()
    lat = jnp.asarray([[[0.3, -0.2, 0.1, 0.05]]])

    def loss(l, small):
        logits, _ = vae_query_logits_hier_grid(
            vae, None, l, [-BOX] * 3, [BOX] * 3, res, chunk=4096,
            coarse_factor=2, cell_cap=2048, small_cell_cap=small)
        return _mesh_loss(logits[0], res)

    v_ref, g_ref = jax.value_and_grad(lambda l: loss(l, None))(lat)
    # small branch taken: a res/2=16 grid selects well under 1024 cells.
    # Values are exact; gradients see f32 summation-order noise from the
    # different refine-chunk padding (same class as dense-vs-hier, rtol 1e-4)
    v_s, g_s = jax.value_and_grad(lambda l: loss(l, 1024))(lat)
    np.testing.assert_allclose(v_s, v_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g_s, g_ref, rtol=1e-4, atol=1e-5)
    # big branch forced: a 2-cell small cap can never fit the sphere shell.
    # Same static shapes as ref, but the lax.cond wrapper moves XLA fusion
    # boundaries in the backward — f32 rounding shifts ~2e-6 rel
    v_b, g_b = jax.value_and_grad(lambda l: loss(l, 2))(lat)
    np.testing.assert_allclose(v_b, v_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(g_b, g_ref, rtol=1e-4, atol=1e-5)
    assert np.abs(np.asarray(g_ref)).max() > 1e-4


def test_hier_grid_small_cap_vmaps_both_branches():
    """Vmapped lax.cond lowers to both-branches-execute; results must still
    match the unbatched decode per element (the batched driver disables the
    small cap for SPEED, not correctness)."""
    res = 16
    vae = AnalyticVaeLatentSphere()
    lats = jnp.asarray([[[[0.3, -0.2, 0.1, 0.05]]], [[[-0.4, 0.3, 0.0, 0.2]]]])

    def f(l):
        logits, n_sel = vae_query_logits_hier_grid(
            vae, None, l, [-BOX] * 3, [BOX] * 3, res, chunk=512,
            coarse_factor=2, cell_cap=512, small_cell_cap=128)
        return logits, n_sel

    batched, _ = jax.vmap(f)(lats)
    for i in range(2):
        one, _ = f(lats[i])
        np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(one),
                                   rtol=1e-6, atol=1e-6)
