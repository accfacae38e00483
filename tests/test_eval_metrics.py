import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.eval import (
    chamfer_distance,
    delta1_depth,
    f_score,
    rel_depth,
    scale_aligned_depth_metrics,
)
from followmyhold_tpu.eval.metrics import align_depth_scale, chamfer_between_meshes
from followmyhold_tpu.utils.profiling import reset, span, summary


def test_depth_metrics_perfect():
    d = jnp.asarray(np.random.default_rng(0).uniform(1, 5, (16, 16)).astype(np.float32))
    assert float(rel_depth(d, d)) == 0.0
    assert float(delta1_depth(d, d)) == 1.0


def test_scale_alignment_recovers_scale():
    gt = jnp.asarray(np.random.default_rng(1).uniform(1, 5, (16, 16)).astype(np.float32))
    pred = gt / 3.0
    s = float(align_depth_scale(pred, gt))
    np.testing.assert_allclose(s, 3.0, rtol=1e-5)
    rel, d1 = scale_aligned_depth_metrics(pred, gt)
    assert float(rel) < 1e-5 and float(d1) == 1.0


def test_depth_metrics_masked():
    gt = jnp.ones((4, 4))
    pred = jnp.ones((4, 4)).at[0, 0].set(10.0)
    mask = jnp.ones((4, 4), bool).at[0, 0].set(False)
    assert float(rel_depth(pred, gt, mask)) == 0.0
    assert float(rel_depth(pred, gt)) > 0.5


def test_chamfer_identity_and_offset():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    assert float(chamfer_distance(a, a)) < 1e-6
    b = a + jnp.asarray([0.1, 0.0, 0.0])
    cd = float(chamfer_distance(a, b))
    assert 0 < cd <= 0.1 + 1e-5


def test_f_score():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32))
    assert float(f_score(a, a, threshold=0.001)) > 0.99
    far = a + 10.0
    assert float(f_score(a, far, threshold=0.01)) < 1e-6


def test_chamfer_between_meshes():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    cd = chamfer_between_meshes(verts, faces, verts + [0, 0, 0.05], faces,
                                samples=500)
    np.testing.assert_allclose(cd, 0.05, atol=5e-3)


def test_profiling_spans():
    reset()
    with span("unit"):
        pass
    with span("unit"):
        pass
    s = summary()
    assert "unit" in s and "     2" in s


def test_eval_runner_compares_mesh_pairs(tmp_path):
    """eval.run consumes split rows and scores pred-vs-ref mesh pairs."""
    import csv
    import json

    import numpy as np

    from followmyhold_tpu.eval.run import evaluate
    from followmyhold_tpu.utils.mesh_io import write_ply

    def icosphere(r, off):
        t = np.linspace(0, np.pi, 12)
        p = np.linspace(0, 2 * np.pi, 12)
        tt, pp = np.meshgrid(t[1:-1], p[:-1], indexing="ij")
        v = np.stack([r * np.sin(tt) * np.cos(pp), r * np.sin(tt) * np.sin(pp),
                      r * np.cos(tt)], -1).reshape(-1, 3) + off
        idx = np.arange(10 * 11).reshape(10, 11)
        f = []
        for i in range(9):
            for j in range(10):
                a, b, c, d = idx[i, j], idx[i + 1, j], idx[i + 1, (j + 1) % 11], idx[i, (j + 1) % 11]
                f += [[a, b, c], [a, c, d]]
        return v.astype(np.float32), np.asarray(f, np.int32)

    split = tmp_path / "split.csv"
    with open(split, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["img_id", "img_path"])
        w.writerow(["7", "img/7.jpg"])
        w.writerow(["8", "img/8.jpg"])

    pred_dir = tmp_path / "pred"
    ref_dir = tmp_path / "ref"
    pred_dir.mkdir()
    ref_dir.mkdir()
    v, f = icosphere(0.1, np.zeros(3))
    write_ply(str(pred_dir / "7_obj.ply"), v, f)
    v2, f2 = icosphere(0.1, np.asarray([0.005, 0, 0]))
    write_ply(str(ref_dir / "7_obj.ply"), v2, f2)
    # row 8 has a prediction but no reference
    write_ply(str(pred_dir / "8_obj.ply"), v, f)

    report = tmp_path / "report.json"
    out = evaluate(str(split), str(pred_dir), str(ref_dir), samples=2000,
                   report_path=str(report))
    s = out["summary"]
    assert s["evaluated"] == 1 and s["missing_ref"] == 1
    assert 0.0 < s["mean_chamfer"] < 0.02
    assert 0.0 <= s["mean_f@10mm"] <= 1.0
    assert json.load(open(report))["summary"]["evaluated"] == 1
