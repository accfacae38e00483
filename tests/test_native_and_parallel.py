import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followmyhold_tpu import native
from followmyhold_tpu.geometry.postprocess import (
    reduce_faces,
    remove_degenerate_faces,
    remove_floaters,
)
from followmyhold_tpu.parallel import make_mesh, parse_mesh_shape, shard_model_params


def grid_mesh(n, offset=(0, 0, 0)):
    """n x n planar grid mesh: (n+1)^2 verts, 2n^2 faces, one component."""
    ys, xs = np.meshgrid(np.arange(n + 1), np.arange(n + 1), indexing="ij")
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    verts += np.asarray(offset, np.float32)
    idx = np.arange((n + 1) * (n + 1)).reshape(n + 1, n + 1)
    f1 = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:]], -1).reshape(-1, 3)
    f2 = np.stack([idx[:-1, :-1], idx[1:, 1:], idx[:-1, 1:]], -1).reshape(-1, 3)
    return verts, np.concatenate([f1, f2]).astype(np.int32)


def test_remove_floaters_keeps_largest():
    v1, f1 = grid_mesh(10)
    v2, f2 = grid_mesh(2, offset=(100, 100, 100))
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    nv, nf = remove_floaters(verts, faces)
    assert len(nv) == len(v1)
    assert len(nf) == len(f1)
    assert (nv.max(0) < 50).all()


def test_remove_degenerate_faces():
    v, f = grid_mesh(4)
    bad = np.array([[0, 0, 1], [2, 2, 2], [0, 1, 1]], np.int32)
    nv, nf = remove_degenerate_faces(v, np.concatenate([f, bad]))
    assert len(nf) == len(f)


def test_reduce_faces_structured():
    v, f = grid_mesh(100)  # 20000 faces
    nv, nf = reduce_faces(v, f, max_faces=5000)
    assert len(nf) <= 5000
    assert len(nv) > 10
    # geometry preserved approximately
    assert nv.min() >= -1 and nv.max() <= 101


def _closed_sphere_mesh(res=48, r=0.8):
    from followmyhold_tpu.ops.surface import marching_tets_host

    n = res + 1
    g = np.linspace(-1.1, 1.1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    sdf = (np.sqrt(X**2 + Y**2 + Z**2) - r).reshape(-1)
    return marching_tets_host(sdf, [-1.1] * 3, [1.1] * 3, res)


def _watertight(f):
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    return bool((cnt == 2).all())


@pytest.mark.parametrize("method", ["quadric", "grid"])
def test_reduce_faces_watertight_and_budget(method):
    """Both decimation paths (VERDICT r4 #7): face budget respected and a
    closed marching-tets sphere stays watertight (every edge on exactly two
    faces); the quadric path must beat grid clustering's surface error."""
    if method == "quadric" and native.get_lib() is None:
        pytest.skip("no compiler")
    hv, hf = _closed_sphere_mesh()
    assert len(hf) > 8000 and _watertight(hf)
    v2, f2 = reduce_faces(hv, hf, max_faces=2000, method=method)
    assert 0 < len(f2) <= 2000
    assert np.isfinite(v2).all()
    assert f2.min() >= 0 and f2.max() < len(v2)
    assert _watertight(f2)
    r = np.linalg.norm(v2, axis=1)
    rms = float(np.sqrt(((r - 0.8) ** 2).mean()))
    assert rms < 0.02, rms
    if method == "quadric":
        vg, fg = reduce_faces(hv, hf, max_faces=2000, method="grid")
        rg = np.linalg.norm(vg, axis=1)
        rms_g = float(np.sqrt(((rg - 0.8) ** 2).mean()))
        assert rms <= rms_g, (rms, rms_g)


def test_native_lib_matches_numpy_components():
    if native.get_lib() is None:
        pytest.skip("no compiler")
    v1, f1 = grid_mesh(5)
    v2, f2 = grid_mesh(3, offset=(50, 0, 0))
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + len(v1)])
    labels, main = native.connected_components(len(verts), faces)
    assert (labels[: len(v1)] == labels[0]).all()
    assert (labels[len(v1):] == labels[len(v1)]).all()
    assert labels[0] != labels[len(v1)]
    assert main == labels[0]  # larger component


# ---------- parallel ----------

def test_parse_mesh_shape():
    assert parse_mesh_shape("dp=4,tp=2", 8) == {"dp": 4, "tp": 2}
    assert parse_mesh_shape("dp=-1", 8) == {"dp": 8}
    assert parse_mesh_shape("dp=-1,tp=2", 8) == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        parse_mesh_shape("dp=-1,tp=-1", 8)
    with pytest.raises(ValueError):
        parse_mesh_shape("dp=3", 8)  # covered at make_mesh; parse ok
        make_mesh("dp=3")


def test_make_mesh_and_shard_params():
    mesh = make_mesh("dp=2,tp=4")
    assert mesh.devices.shape == (2, 4)

    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16, name="qkv")(x)
            x = nn.Dense(8, name="proj")(x)
            return nn.LayerNorm(name="norm")(x)

    m = M()
    params = m.init(jax.random.key(0), jnp.ones((1, 8)))
    sharded = shard_model_params(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(sharded)
    specs = {}
    for path, leaf in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        specs[name] = leaf.sharding.spec
    # column-parallel qkv: output dim sharded over tp
    assert specs["params/qkv/kernel"] == jax.sharding.PartitionSpec(None, "tp")
    # row-parallel proj: input dim sharded
    assert specs["params/proj/kernel"] == jax.sharding.PartitionSpec("tp", None)
    # norms replicated
    assert specs["params/norm/scale"] == jax.sharding.PartitionSpec()


def test_sharded_matmul_executes():
    mesh = make_mesh("dp=4,tp=2")
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(jnp.ones((8, 16)), NamedSharding(mesh, P("dp")))
    w = jax.device_put(jnp.ones((16, 32)), NamedSharding(mesh, P(None, "tp")))

    @jax.jit
    def f(x, w):
        return x @ w

    out = f(x, w)
    np.testing.assert_allclose(np.asarray(out), 16.0)


def test_scanned_block_kernels_carry_tp():
    """nn.scan depth-folding gives block kernels a leading depth axis (ndim 3);
    tp must still shard them (regression: r1 spec_for matched only ndim==2,
    silently replicating every transformer block)."""
    mesh = make_mesh("dp=4,tp=2")

    from followmyhold_tpu.models.hunyuan import DIT_TINY, HunyuanDiT

    dit = HunyuanDiT(DIT_TINY)
    lat = jnp.zeros((1, 8, DIT_TINY.in_channels))
    cond = jnp.zeros((1, 4, DIT_TINY.context_dim))
    params = dit.init(jax.random.key(0), lat, jnp.zeros(1), cond)
    sharded = shard_model_params(params, mesh)

    tp_specs = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(sharded):
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        if "tp" in str(leaf.sharding.spec):
            tp_specs[name] = (leaf.ndim, leaf.sharding.spec)

    # at least one scanned (ndim-3) block kernel must actually carry tp
    scanned = {n: s for n, (nd, s) in tp_specs.items() if nd == 3}
    assert scanned, f"no scanned block kernel sharded over tp; tp-sharded: {tp_specs}"
    # column-parallel scanned kernels shard the LAST dim, row-parallel the middle
    for name, (nd, spec) in tp_specs.items():
        if nd == 3:
            assert spec in (
                jax.sharding.PartitionSpec(None, None, "tp"),
                jax.sharding.PartitionSpec(None, "tp", None),
            ), (name, spec)

    # the sharded model still runs and matches the replicated one
    out_ref = dit.apply(params, lat, jnp.zeros(1), cond)
    out_tp = jax.jit(dit.apply)(sharded, lat, jnp.zeros(1), cond)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_tp),
                               rtol=2e-4, atol=2e-4)


def test_reduce_faces_quadric_precluster_path():
    """The big-mesh pre-cluster (grid pass before edge collapse) must respect
    the budget, stay watertight, and keep quadric-class surface error.
    FOHO_QUADRIC_PRECLUSTER lowers the trigger so a test-size sphere takes
    the production 2.56M-face code path."""
    if native.get_lib() is None:
        pytest.skip("no compiler")
    hv, hf = _closed_sphere_mesh()
    import os
    os.environ["FOHO_QUADRIC_PRECLUSTER"] = "1000"
    try:
        v2, f2 = reduce_faces(hv, hf, max_faces=1000, method="quadric")
    finally:
        del os.environ["FOHO_QUADRIC_PRECLUSTER"]
    assert 0 < len(f2) <= 1000
    assert _watertight(f2)
    r = np.linalg.norm(v2, axis=1)
    rms = float(np.sqrt(((r - 0.8) ** 2).mean()))
    assert rms < 0.02, rms
