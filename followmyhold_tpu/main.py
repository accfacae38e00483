"""Pipeline orchestrator.

Public surface mirrors the reference entry point
(python -m foho.main --config configs/pipeline.env, src/foho/main.py:281-288)
but the execution model is TPU-native (SURVEY.md §7 design stance): ONE
python process, stages called in-process as functions over the shared config
— no conda subprocesses, no model reload per stage, one jax device/mesh
context. Stage order and the artifact contract match run_pipeline
(main.py:94-278).
"""

from __future__ import annotations

import argparse
import os
import warnings

from followmyhold_tpu.configs import PipelineConfig, load_config


def run_pipeline(cfg: PipelineConfig) -> None:
    from followmyhold_tpu.utils.compilation_cache import enable as _enable_cache

    _enable_cache()
    if cfg.suppress_warnings:
        warnings.filterwarnings("ignore", category=FutureWarning)
        warnings.filterwarnings("ignore", category=UserWarning)
    os.environ["FOHO_PROJECT_ROOT"] = cfg.project_root
    if cfg.assets_dir:
        os.environ["FOHO_TPU_ASSETS"] = cfg.assets_dir

    for path in cfg.output_dirs().values():
        os.makedirs(path, exist_ok=True)

    gemini_csv = cfg.gemini_responses or os.path.join(
        cfg.base_dir, "gemini_responses.csv")

    # 1. object naming (main.py:130-143)
    if not cfg.gemini_responses:
        from followmyhold_tpu.preprocess import gemini_objname

        gemini_objname.run(out_csv=gemini_csv, split_path=cfg.split_path,
                           image_path=cfg.image_path)

    # 2. HOI input generation (main.py:145-164)
    from followmyhold_tpu.preprocess import get_hunyuan_input

    get_hunyuan_input.run(
        occ_img_dir=cfg.masked_obj_path,
        cropped_img_dir=cfg.cropped_hoi_path,
        cropped_img_wo_bckg_dir=cfg.cropped_hoi_wo_bckg_path,
        mask_dir=cfg.mask_dir_path,
        original_img_dir=cfg.original_img_dir,
        split_path=cfg.split_path,
        image_path=cfg.image_path,
        gemini_responses=gemini_csv,
        project_root=cfg.project_root,
    )

    # 3. inpainting (main.py:166-180)
    if cfg.run_inpaint:
        from followmyhold_tpu.preprocess import inpaint

        inpaint.run(save_dir=cfg.cropped_inpainted_obj,
                    cropped_img_dir=cfg.cropped_hoi_path,
                    gemini_responses=gemini_csv,
                    mask_dir=cfg.mask_dir_path)

    # 4. MoGe geometry (main.py:182-195)
    from followmyhold_tpu.geometry import moge

    moge.run(input_dir=cfg.cropped_hoi_wo_bckg_path,
             output_dir=cfg.moge_out_path, project_root=cfg.project_root)

    # 5. Hunyuan HOI mesh (main.py:197-210)
    from followmyhold_tpu.geometry import hunyuan

    hunyuan.run(image_dir=cfg.cropped_hoi_wo_bckg_path,
                save_dir=cfg.hunyuan_hoi_mesh_path,
                project_root=cfg.project_root)

    # 6. HaMeR hand regression (main.py:212-227)
    from followmyhold_tpu.hand import hamer

    hamer.run(img_folder=cfg.cropped_hoi_path,
              out_folder=cfg.hamer_out_path,
              full_img_dir=cfg.original_img_dir,
              mask_dir=cfg.mask_dir_path,
              save_mesh=True)

    # 7. Hunyuan -> MoGe alignment (main.py:229-242)
    from followmyhold_tpu.alignment import h2m

    h2m.run(hunyuan_mesh_dir=cfg.hunyuan_hoi_mesh_path,
            moge_out_dir=cfg.moge_out_path,
            h2m_rt_dir=cfg.h2m_rt_path)

    # 8. MANO -> Hunyuan alignment (main.py:244-257)
    from followmyhold_tpu.alignment import mano as mano_align

    mano_align.run(hamer_out_dir=cfg.hamer_out_path,
                   hunyuan_mesh_dir=cfg.hunyuan_hoi_mesh_path,
                   aligned_mano_dir=cfg.aligned_mano_path)

    # 9. guided reconstruction (main.py:259-278)
    from followmyhold_tpu.guidance import run as guidance_run

    guidance_run.run(
        project_root=cfg.project_root,
        cropped_obj_img_dir=cfg.cropped_inpainted_obj if cfg.run_inpaint
        else cfg.masked_obj_path,
        mask_dir=cfg.mask_dir_path,
        moge_out_dir=cfg.moge_out_path,
        hunyuan_hoi_mesh_dir=cfg.hunyuan_hoi_mesh_path,
        hamer_out_dir=cfg.hamer_out_path,
        h2m_rt_dir=cfg.h2m_rt_path,
        aligned_mano_dir=cfg.aligned_mano_path,
        guidance_out_dir=cfg.guidance_out_path,
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    args = parser.parse_args()
    run_pipeline(load_config(args.config))


if __name__ == "__main__":
    main()
