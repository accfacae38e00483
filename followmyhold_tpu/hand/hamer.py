"""Hand stage: HaMeR regression over cropped HOI images.

Public surface mirrors the reference (src/foho/hand/hamer.py:34-300): per
image write {id}.npy (full outputs), {id}_kps_for_guidance.npy
(mano_3d_kps / mano_2d_kps / cam_t), {id}_hamer.obj, and the shared
J_regressor dump the guidance stage loads (hamer.py:103-104).

Detection front-end: the reference chains ViTDet person boxes -> ViTPose
wholebody keypoints -> hand boxes (hand/hamer.py:117-176). In pipeline mode
this stage consumes the pipeline's own 512^2 HOI crops whose hand mask the
preprocess stage already produced, so the hand box comes from
{id}_cropped_hand_mask.png directly (whole image as fallback) — one jitted
batch instead of three detector stacks; handedness comes from the crop
filename ({id}_cropped_hoi_{is_right}.png). In --multi_hand mode (raw,
possibly multi-person frames) the full chain runs: GdinoPersonDetector
person boxes (the documented ViTDet substitute) -> per-person ViTPose ->
per-side NMS.

Crop semantics match ViTDetDataset (vitdet_dataset.py:23-95): square box
rescaled 2.5x, 256x256 patch, ImageNet normalization, horizontal flip for
left hands; outputs un-flip x (hand/hamer.py:256-266).
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np
from PIL import Image

from followmyhold_tpu.models.hamer import Hamer, HamerConfig, hamer_forward
from followmyhold_tpu.models.mano import load_mano
from followmyhold_tpu.ops.camera import cam_crop_to_full, perspective_projection
from followmyhold_tpu.ops.image import generate_patch_image
from followmyhold_tpu.utils.artifacts import parse_cropped_hoi_name
from followmyhold_tpu.utils.mesh_io import write_obj
from followmyhold_tpu.utils.params import load_or_init

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray,
              thresh: float = 0.5) -> np.ndarray:
    """Greedy IoU NMS -> kept indices (reference hand/hamer.py:23-31)."""
    order = np.argsort(-scores)
    keep = []
    while len(order):
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        if not len(rest):
            break
        b = boxes[i]
        xx0 = np.maximum(b[0], boxes[rest, 0])
        yy0 = np.maximum(b[1], boxes[rest, 1])
        xx1 = np.minimum(b[2], boxes[rest, 2])
        yy1 = np.minimum(b[3], boxes[rest, 3])
        inter = np.maximum(xx1 - xx0, 0) * np.maximum(yy1 - yy0, 0)
        area = lambda bb: np.maximum(bb[..., 2] - bb[..., 0], 0) * \
            np.maximum(bb[..., 3] - bb[..., 1], 0)  # noqa: E731
        iou = inter / np.maximum(area(b[None]) + area(boxes[rest]) - inter,
                                 1e-9)
        order = rest[iou <= thresh]
    return np.asarray(keep, np.int64)


def collect_hand_candidates(img01: np.ndarray, pose_front: "VitPoseFrontEnd",
                            person_boxes=None, conf_thresh: float = 0.5,
                            nms_thresh: float = 0.5):
    """Multi-person frame -> per-side NMS'd hand candidates
    [(box_xyxy, score, is_right), ...] (reference hand/hamer.py:117-176:
    ViTDet person boxes -> per-person ViTPose -> keypoint-block boxes ->
    per-side NMS). person_boxes default to the whole frame; callers with a
    person detector (e.g. preprocess.detectors bundles) pass theirs."""
    H, W = img01.shape[:2]
    if person_boxes is None or not len(person_boxes):
        person_boxes = [np.array([0, 0, W - 1, H - 1], np.float32)]
    cands = []
    for pb in person_boxes:
        x0, y0 = max(int(pb[0]), 0), max(int(pb[1]), 0)
        x1, y1 = min(int(pb[2]) + 1, W), min(int(pb[3]) + 1, H)
        if x1 - x0 < 16 or y1 - y0 < 16:
            continue
        for box, score, is_right in pose_front.hand_candidates(
                img01[y0:y1, x0:x1], conf_thresh):
            cands.append((box + np.array([x0, y0, x0, y0], np.float32),
                          score, is_right))
    out = []
    for side in (False, True):
        side_c = [(b, s) for b, s, r in cands if r == side]
        if not side_c:
            continue
        boxes = np.stack([b for b, _ in side_c])
        scores = np.asarray([s for _, s in side_c])
        for i in nms_boxes(boxes, scores, nms_thresh):
            out.append((boxes[i], float(scores[i]), side))
    return out


def _hand_bbox_from_mask(mask_path: Optional[str], img_hw) -> np.ndarray:
    """xyxy hand box from the preprocess hand mask; whole image fallback."""
    H, W = img_hw
    if mask_path and os.path.exists(mask_path):
        m = np.asarray(Image.open(mask_path).convert("L")) > 0
        ys, xs = np.nonzero(m)
        if len(xs) > 0:
            return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
    return np.array([0, 0, W - 1, H - 1], np.float32)


class GdinoPersonDetector:
    """Person-box source for raw multi-person frames.

    The reference runs a detectron2 Cascade-ViTDet person detector before
    ViTPose and keeps class-0 boxes with score > 0.5
    (src/foho/hand/hamer.py:73-85, 120-123). Porting that 631M-parameter
    stack would add a third detector family whose only role here is person
    boxes — so this build substitutes the already-vendored GroundingDINO
    (numerically validated end-to-end against the HF implementation in
    tests/test_convert_oracle.py) prompted with "person." at the same 0.5
    score threshold. Built only when converted 'gdino' weights exist;
    without them the multi-hand path falls back to the whole frame."""

    def __init__(self, model=None, params=None):
        if model is None:
            import jax.numpy as _jnp

            from followmyhold_tpu.models.gdino import GDINO_BASE, GroundingDino

            model = GroundingDino(GDINO_BASE)

            def _init(k):
                c = model.cfg
                T = 8
                return model.init(
                    k,
                    pixel_values=_jnp.zeros((1, c.image_size, c.image_size, 3)),
                    input_ids=_jnp.zeros((1, T), jnp.int32),
                    token_type_ids=_jnp.zeros((1, T), jnp.int32),
                    text_self_attention_masks=_jnp.ones((1, T, T), bool),
                    position_ids=_jnp.zeros((1, T), jnp.int32),
                    text_token_mask=_jnp.ones((1, T), bool))

            params = load_or_init("gdino", _init)
        self.model = model
        self.params = params

    @classmethod
    def maybe_build(cls) -> Optional["GdinoPersonDetector"]:
        from followmyhold_tpu.utils.params import has_params

        return cls() if has_params("gdino") else None

    def person_boxes(self, img01: np.ndarray,
                     score_thresh: float = 0.5) -> np.ndarray:
        """[H,W,3] in [0,1] -> person boxes [N,4] xyxy in frame pixels,
        descending score (reference keeps every person above 0.5)."""
        from followmyhold_tpu.models.gdino import detect_text_prompt

        boxes, _ = detect_text_prompt(
            self.model, self.params, (img01 * 255).astype(np.uint8),
            "person.", box_threshold=score_thresh)
        return boxes


class VitPoseFrontEnd:
    """ViTPose wholebody keypoints -> handed hand boxes (the reference's
    detection front end, src/foho/hand/hamer.py:117-176, minus the ViTDet
    person stage — the pipeline's own crops are the person region). Built
    only when converted 'vitpose' weights exist."""

    def __init__(self, pose_model=None, pose_params=None):
        if pose_model is None:
            from followmyhold_tpu.models.vitpose import ViTPose, ViTPoseConfig
            from followmyhold_tpu.utils.params import load_or_init

            pose_model = ViTPose(ViTPoseConfig())
            ih, iw = pose_model.cfg.backbone.img_size
            pose_params = load_or_init(
                "vitpose",
                lambda k: pose_model.init(k, jnp.zeros((1, ih, iw, 3))))
        self.model = pose_model
        self.params = pose_params

    @classmethod
    def maybe_build(cls) -> Optional["VitPoseFrontEnd"]:
        from followmyhold_tpu.utils.params import has_params

        return cls() if has_params("vitpose") else None

    def keypoints(self, img01: np.ndarray) -> np.ndarray:
        """[H,W,3] in [0,1] -> wholebody keypoints [133,3] in image pixels."""
        from followmyhold_tpu.models.vitpose import heatmaps_to_keypoints

        H, W = img01.shape[:2]
        ih, iw = self.model.cfg.backbone.img_size
        patch = np.asarray(Image.fromarray(
            (img01 * 255).astype(np.uint8)).resize((iw, ih)), np.float32) / 255.0
        patch = (patch - IMAGENET_MEAN) / IMAGENET_STD
        hm = self.model.apply(self.params, jnp.asarray(patch)[None])
        kps = np.array(heatmaps_to_keypoints(hm, (ih, iw)))[0]
        kps[:, 0] *= W / iw
        kps[:, 1] *= H / ih
        return kps

    def hand_candidates(self, img01: np.ndarray, conf_thresh: float = 0.5):
        """-> [(box_xyxy, score, is_right), ...] from the keypoint blocks."""
        from followmyhold_tpu.models.vitpose import (
            hand_candidates_from_wholebody,
        )

        return hand_candidates_from_wholebody(self.keypoints(img01),
                                              conf_thresh)

    def hand_bbox(self, img01: np.ndarray, is_right: bool,
                  conf_thresh: float = 0.5) -> Optional[np.ndarray]:
        """xyxy box for the requested side, or None when the keypoint block
        is not confident (reference requires >3 confident keypoints,
        hand/hamer.py:134-152). The keypoint-extent box is kept as-is — the
        ViTDetDataset math downstream applies its own 2.5x rescale."""
        for box, _, side in self.hand_candidates(img01, conf_thresh):
            if side == is_right:
                return box
        return None


def _default_config() -> HamerConfig:
    if os.environ.get("FOHO_TPU_PROFILE", "full") == "tiny":
        from followmyhold_tpu.models.vit import ViTConfig

        return HamerConfig(
            backbone=ViTConfig(img_size=(64, 48), patch_size=16, embed_dim=32,
                               depth=1, num_heads=2, dtype=jnp.float32),
            head_dim=32, head_depth=1, head_heads=2, head_dim_head=8,
            head_mlp_dim=32, context_dim=32, image_size=64, dtype=jnp.float32)
    return HamerConfig()


def _build_model(cfg: HamerConfig):
    model = Hamer(cfg)

    def init_fn(key):
        import jax

        dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        return model.init(key, dummy)

    params = load_or_init("hamer", init_fn)
    return model, params


def _process_hand(model, params, mano, cfg, img: np.ndarray,
                  box: np.ndarray, is_right: bool,
                  rescale_factor: float) -> dict:
    """One hand instance -> all per-hand arrays (ViTDetDataset crop math +
    HAMER forward + cam_crop_to_full + full-image 2D keypoints)."""
    H, W = img.shape[:2]
    # ViTDetDataset box math (vitdet_dataset.py:38-47)
    center = (box[:2] + box[2:]) / 2.0
    scale = rescale_factor * (box[2:] - box[:2]) / 200.0
    box_size = float(np.max(scale) * 200.0)
    bbox_xywh = [center[0] - box_size / 2, center[1] - box_size / 2,
                 box_size, box_size]

    patch, _ = generate_patch_image(
        jnp.asarray(img), bbox_xywh, (cfg.image_size, cfg.image_size),
        do_flip=not is_right)
    patch = (np.asarray(patch) - IMAGENET_MEAN) / IMAGENET_STD

    out = hamer_forward(model, params, mano, jnp.asarray(patch)[None])

    mult = 1.0 if is_right else -1.0
    pred_cam = np.array(out.pred_cam)
    pred_cam[:, 1] *= mult  # un-flip tx (hand/hamer.py:196-197)

    img_size = np.array([[W, H]], np.float32)
    scaled_focal = cfg.focal_length / cfg.image_size * float(img_size.max())
    cam_t_full = np.asarray(cam_crop_to_full(
        jnp.asarray(pred_cam), jnp.asarray(center[None]),
        jnp.asarray([box_size]), jnp.asarray(img_size), scaled_focal))

    verts = np.array(out.vertices[0])
    kps3d = np.array(out.keypoints_3d[0])
    verts[:, 0] *= mult
    kps3d[:, 0] *= mult

    kps2d_full = np.asarray(perspective_projection(
        jnp.asarray(kps3d[None]), jnp.asarray(cam_t_full),
        jnp.asarray([[scaled_focal, scaled_focal]]),
        jnp.asarray([[W / 2.0, H / 2.0]]),
    ))[0]

    return {
        "pred_cam": pred_cam[0],
        "pred_cam_t": np.asarray(out.pred_cam_t)[0],
        "pred_cam_t_full": cam_t_full[0],
        "pred_vertices": verts,
        "pred_keypoints_3d": kps3d,
        "pred_keypoints_2d": np.asarray(out.keypoints_2d)[0],
        "betas": np.asarray(out.betas)[0],
        "global_orient": np.asarray(out.global_orient)[0],
        "hand_pose": np.asarray(out.hand_pose)[0],
        "box_center": center,
        "box_size": np.asarray(box_size),
        "right": np.asarray(float(is_right)),
        "scaled_focal": scaled_focal,
        "mano_2d_kps": kps2d_full,
    }


def render_overlay(img01: np.ndarray, hands: list, faces: np.ndarray,
                   scaled_focal: float) -> np.ndarray:
    """Normal-shaded MANO overlay on the frame (reference renders overlays,
    hand/hamer.py:229-284) via the shared rasterizer. The frame is padded to
    the rasterizer's 64px tiles and cropped back."""
    import math

    from followmyhold_tpu.ops.camera import GuidanceCamera
    from followmyhold_tpu.ops.rasterizer import render_normal_and_disparity
    from followmyhold_tpu.ops.surface import PaddedMesh, vertex_normals

    H, W = img01.shape[:2]
    Hp, Wp = ((H + 63) // 64) * 64, ((W + 63) // 64) * 64
    py, px = (Hp - H) // 2, (Wp - W) // 2
    canvas = np.zeros((Hp, Wp, 3), np.float32)
    canvas[py:py + H, px:px + W] = img01
    fov = 2.0 * math.degrees(math.atan((min(Hp, Wp) - 1) / 2.0 / scaled_focal))
    cam = GuidanceCamera(height=Hp, width=Wp, fov_deg=fov)

    all_v, all_f, off = [], [], 0
    for h in hands:
        v = h["pred_vertices"] + h["pred_cam_t_full"]
        all_v.append(v * np.array([1.0, -1.0, -1.0], np.float32))  # cv -> GL
        all_f.append(np.asarray(faces) + off)
        off += len(v)
    verts = jnp.asarray(np.concatenate(all_v))
    fcs = jnp.asarray(np.concatenate(all_f))
    mesh = PaddedMesh(verts=verts, faces=fcs,
                      vert_mask=jnp.ones(verts.shape[0]),
                      face_mask=jnp.ones(fcs.shape[0]))
    vn = vertex_normals(mesh)
    # capacity >= total face count can never overflow (a tile holds at most
    # every face — n_hands * 1538 MANO faces here)
    fpt = ((int(fcs.shape[0]) + 127) // 128) * 128
    n01, _, out = render_normal_and_disparity(cam, verts, fcs, vn,
                                              mesh.face_mask,
                                              faces_per_tile=fpt)
    hit = np.asarray(out.face_id >= 0)[..., None]
    over = np.where(hit, 0.7 * np.asarray(n01) + 0.3 * canvas, canvas)
    return (np.clip(over[py:py + H, px:px + W], 0, 1) * 255).astype(np.uint8)


def run(
    img_folder: str,
    out_folder: str,
    full_img_dir: Optional[str] = None,
    mask_dir: Optional[str] = None,
    save_mesh: bool = True,
    rescale_factor: float = 2.5,
    hamer_demo_dir: Optional[str] = None,  # accepted for CLI parity, unused
    multi_hand: bool = False,
    save_overlay: bool = False,
) -> None:
    os.makedirs(out_folder, exist_ok=True)
    cfg = _default_config()
    model, params = _build_model(cfg)
    mano = load_mano()

    # the 16x778 J_regressor the guidance stage consumes (reference dumps
    # J_regressor_hamer.pt once, hamer.py:103-104)
    np.save(os.path.join(out_folder, "J_regressor_hamer.npy"),
            np.asarray(mano.j_regressor))

    images = sorted(
        glob.glob(os.path.join(img_folder, "*.png"))
        + glob.glob(os.path.join(img_folder, "*.jpg"))
    )
    if not images:
        print(f"No images found in {img_folder}")
        return

    pose_front = VitPoseFrontEnd.maybe_build()
    # person detection only matters on raw (possibly multi-person) frames;
    # pipeline crops already isolate the person region
    person_det = GdinoPersonDetector.maybe_build() if multi_hand else None

    for img_path in images:
        image_id, is_right = parse_cropped_hoi_name(img_path)
        out_npy = os.path.join(out_folder, f"{image_id}.npy")
        kps_npy = os.path.join(out_folder, f"{image_id}_kps_for_guidance.npy")
        if os.path.exists(out_npy) and os.path.exists(kps_npy):
            print(f"{image_id} exists, skipping")
            continue

        img = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        H, W = img.shape[:2]

        # build the hand-instance list: multi-hand mode keeps EVERY per-side
        # NMS survivor (raw benchmark frames, reference hand/hamer.py:
        # 117-176); pipeline mode keeps one box for the crop's handedness
        instances = []
        if multi_hand and pose_front is not None:
            pboxes = (person_det.person_boxes(img)
                      if person_det is not None else None)
            instances = [(b, r) for b, _, r in
                         collect_hand_candidates(img, pose_front,
                                                 person_boxes=pboxes)]
        if not instances:
            box = None
            if pose_front is not None:
                box = pose_front.hand_bbox(img, is_right)
            if box is None:
                mask_path = None
                if mask_dir:
                    mask_path = os.path.join(
                        mask_dir, f"{image_id}_cropped_hand_mask.png")
                box = _hand_bbox_from_mask(mask_path, (H, W))
            instances = [(box, is_right)]

        hands = [_process_hand(model, params, mano, cfg, img, box, right,
                               rescale_factor)
                 for box, right in instances]

        # stacked over detections like the reference's batch dim
        stack_keys = ("pred_cam", "pred_cam_t", "pred_cam_t_full",
                      "pred_vertices", "pred_keypoints_3d",
                      "pred_keypoints_2d", "betas", "global_orient",
                      "hand_pose", "box_center", "box_size", "right")
        np.save(out_npy, {k: np.stack([h[k] for h in hands])
                          for k in stack_keys})
        np.save(kps_npy, {
            "mano_3d_kps": np.stack([h["pred_keypoints_3d"] for h in hands]),
            "mano_2d_kps": (hands[0]["mano_2d_kps"] if len(hands) == 1 else
                            np.stack([h["mano_2d_kps"] for h in hands])),
            "cam_t": np.stack([h["pred_cam_t_full"] for h in hands]),
        })

        if save_mesh:
            # camera-frame mesh for downstream ICP (reference exports the
            # cam_t-translated mesh, hand/hamer.py:281-284)
            for k, h in enumerate(hands):
                name = (f"{image_id}_hamer.obj" if len(hands) == 1
                        else f"{image_id}_hamer_{k}.obj")
                write_obj(os.path.join(out_folder, name),
                          h["pred_vertices"] + h["pred_cam_t_full"],
                          np.asarray(mano.faces))
        if save_overlay:
            try:
                over = render_overlay(img, hands, np.asarray(mano.faces),
                                      hands[0]["scaled_focal"])
                Image.fromarray(over).save(
                    os.path.join(out_folder, f"{image_id}_overlay.png"))
            except Exception as e:  # overlay is diagnostic-only
                print(f"overlay render failed for {image_id}: {e}")
        print(f"Processed {image_id} ({len(hands)} hand(s))")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_folder", required=True)
    parser.add_argument("--out_folder", required=True)
    parser.add_argument("--full_img_dir", default=None)
    parser.add_argument("--mask_dir", default=None)
    parser.add_argument("--hamer_demo_dir", default=None)
    parser.add_argument("--save_mesh", action="store_true", default=True)
    parser.add_argument("--multi_hand", action="store_true", default=False,
                        help="raw multi-person frames: keep every per-side "
                             "NMS survivor instead of one hand per crop")
    parser.add_argument("--save_overlay", action="store_true", default=False)
    args = parser.parse_args()
    run(args.img_folder, args.out_folder, args.full_img_dir, args.mask_dir,
        args.save_mesh, hamer_demo_dir=args.hamer_demo_dir,
        multi_hand=args.multi_hand, save_overlay=args.save_overlay)


if __name__ == "__main__":
    main()
