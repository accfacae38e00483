import os

import pytest

from followmyhold_tpu.configs import OptimizationConfig, load_config
from followmyhold_tpu.utils import artifacts_for, parse_cropped_hoi_name, should_skip


def _write_cfg(tmp_path, extra=""):
    p = tmp_path / "pipeline.env"
    p.write_text(
        f"PROJECT_ROOT={tmp_path}\n"
        f"BASE_DIR={tmp_path}/out\n"
        "SPLIT_PATH=splits/dexycb_test.csv\n"
        "# comment line\n"
        'GEMINI_API_KEY="quoted-key"\n' + extra
    )
    return str(p)


def test_load_config_derives_base_dir_grammar(tmp_path):
    cfg = load_config(_write_cfg(tmp_path))
    base = f"{tmp_path}/out"
    assert cfg.cropped_hoi_path == f"{base}/cropped_hoi_imgs"
    assert cfg.moge_out_path == f"{base}/moge_out"
    assert cfg.guidance_out_path == f"{base}/guidance_out"
    assert cfg.gemini_api_key == "quoted-key"
    assert cfg.run_inpaint is True
    assert len(cfg.output_dirs()) == 12


def test_load_config_override_and_flags(tmp_path):
    cfg = load_config(_write_cfg(tmp_path, "RUN_INPAINT=0\nMOGE_OUT_PATH=/custom/moge\n"))
    assert cfg.run_inpaint is False
    assert cfg.moge_out_path == "/custom/moge"


def test_load_config_requires_input_source(tmp_path):
    p = tmp_path / "bad.env"
    p.write_text(f"PROJECT_ROOT={tmp_path}\nBASE_DIR={tmp_path}/o\n")
    with pytest.raises(ValueError):
        load_config(str(p))


def test_optimization_config_parity_with_reference():
    # Values from reference src/foho/configs/guid_config.py:6-32
    c = OptimizationConfig()
    assert c.num_inference_steps == 20
    assert c.guidance_start_step == 10
    assert c.handopt_start_step == 9
    assert c.optimization_steps_hand == 200
    assert c.optimization_steps_scale == 100
    assert c.optimization_steps_joint == 50
    assert c.phase1_hand_lrs.rot == 0.5
    assert c.noise_obj_lr2 == 1e-2
    assert c() is c  # callable self-return, reference guid_config.py:31


def test_artifact_grammar(tmp_path):
    cfg = load_config(_write_cfg(tmp_path))
    art = artifacts_for(cfg, "000123", is_right=True)
    assert art.cropped_hoi.endswith("000123_cropped_hoi_1.png")
    assert art.cropped_obj_mask.endswith("000123_cropped_obj_mask.png")
    assert art.h2m_transform.endswith("000123_hoi_mesh.npy")
    assert art.guidance_obj.endswith("000123_obj.ply")
    assert art.hamer_kps.endswith("000123_kps_for_guidance.npy")
    assert art.aligned_mano_mesh.endswith("000123_hamer_aligned_mano.ply")

    image_id, is_right = parse_cropped_hoi_name("000123_cropped_hoi_1.png")
    assert image_id == "000123" and is_right
    image_id, is_right = parse_cropped_hoi_name("7_cropped_hoi_0.png")
    assert image_id == "7" and not is_right


def test_should_skip(tmp_path):
    a = tmp_path / "a.txt"
    assert not should_skip(str(a))
    a.write_text("x")
    assert should_skip(str(a))
