"""Full-pipeline integration test (tiny profile, synthetic image).

Drives followmyhold_tpu.main.run_pipeline end-to-end: preprocess -> inpaint ->
MoGe -> Hunyuan -> HaMeR -> h2m ICP -> mano ICP -> guided reconstruction, and
checks every artifact of the reference contract exists.
"""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def synthetic_scene(tmp_path):
    """A 'hand' (skin-colored blob) holding an 'object' (blue box)."""
    rng = np.random.default_rng(0)
    H = W = 96
    img = np.full((H, W, 3), 40, np.uint8)
    img += rng.integers(0, 20, size=img.shape).astype(np.uint8)
    # blue object box
    img[30:70, 40:80] = [40, 60, 200]
    # skin-colored hand blob overlapping the object
    img[45:80, 20:55] = [210, 140, 110]
    path = tmp_path / "000001.png"
    Image.fromarray(img).save(path)
    return str(path)


def test_full_pipeline(tmp_path, synthetic_scene, monkeypatch):
    monkeypatch.setenv("FOHO_TPU_PROFILE", "tiny")

    base = tmp_path / "out"
    cfg_path = tmp_path / "pipeline.env"
    cfg_path.write_text(
        f"PROJECT_ROOT={tmp_path}\n"
        f"BASE_DIR={base}\n"
        f"IMAGE_PATH={synthetic_scene}\n"
        "RUN_INPAINT=1\n"
    )

    from followmyhold_tpu.configs import load_config
    from followmyhold_tpu.main import run_pipeline

    cfg = load_config(str(cfg_path))
    run_pipeline(cfg)

    image_id = "000001"
    # preprocess artifacts
    crops = [p for p in os.listdir(cfg.cropped_hoi_path) if p.startswith(image_id)]
    assert crops, "no HOI crop produced"
    assert os.path.exists(os.path.join(cfg.mask_dir_path, f"{image_id}_cropped_obj_mask.png"))
    assert os.path.exists(os.path.join(cfg.mask_dir_path, f"{image_id}_cropped_hand_mask.png"))
    # inpaint
    assert any(p.startswith(image_id) for p in os.listdir(cfg.cropped_inpainted_obj))
    # moge
    moge_dir = os.path.join(cfg.moge_out_path, f"{image_id}_cropped_hoi")
    assert os.path.exists(os.path.join(moge_dir, "fov.json"))
    assert os.path.exists(os.path.join(moge_dir, "mesh.ply"))
    # hunyuan HOI mesh
    assert os.path.exists(os.path.join(cfg.hunyuan_hoi_mesh_path, f"{image_id}_hoi_mesh.ply"))
    # hamer
    assert os.path.exists(os.path.join(cfg.hamer_out_path, f"{image_id}.npy"))
    assert os.path.exists(os.path.join(cfg.hamer_out_path, f"{image_id}_kps_for_guidance.npy"))
    assert os.path.exists(os.path.join(cfg.hamer_out_path, f"{image_id}_hamer.obj"))
    # alignment
    assert os.path.exists(os.path.join(cfg.h2m_rt_path, f"{image_id}_hoi_mesh.npy"))
    assert os.path.exists(os.path.join(cfg.aligned_mano_path, f"{image_id}_hamer_aligned_mano.ply"))
    # guidance outputs
    obj_ply = os.path.join(cfg.guidance_out_path, f"{image_id}_obj.ply")
    hand_ply = os.path.join(cfg.guidance_out_path, f"{image_id}_hand.ply")
    assert os.path.exists(obj_ply), "guided object mesh missing"
    assert os.path.exists(hand_ply), "guided hand mesh missing"

    from followmyhold_tpu.utils.mesh_io import load_mesh

    obj = load_mesh(obj_ply)
    hand = load_mesh(hand_ply)
    assert obj.num_vertices > 0
    assert hand.num_vertices == 778
    assert np.isfinite(obj.vertices).all() and np.isfinite(hand.vertices).all()

    # h2m transform is a valid 4x4
    T = np.load(os.path.join(cfg.h2m_rt_path, f"{image_id}_hoi_mesh.npy"))
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-5)

    # resumability: a second run skips everything quickly
    run_pipeline(cfg)
