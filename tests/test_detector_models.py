"""Smoke + contract tests for the detector/segmentation/inpainting model
families (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.models.gdino import GDINO_TINY, detect_text_prompt
from followmyhold_tpu.models.hand_object_detector import (
    FRCNN_TINY,
    HandObjectDetector,
    detect_hand_object,
    generate_anchors,
    match_hands_to_objects,
    shift_anchors,
)
from followmyhold_tpu.models.vitpose import (
    VITPOSE_TINY,
    ViTPose,
    hand_bboxes_from_wholebody,
    heatmaps_to_keypoints,
)


def test_vitpose_heatmaps_and_keypoints():
    model = ViTPose(VITPOSE_TINY)
    x = jnp.ones((1, 64, 48, 3))
    params = model.init(jax.random.key(0), x)
    hm = model.apply(params, x)
    assert hm.shape == (1, 16, 12, 133)
    kps = heatmaps_to_keypoints(hm, (64, 48))
    assert kps.shape == (1, 133, 3)
    k = np.asarray(kps[0])
    assert (k[:, 0] <= 48).all() and (k[:, 1] <= 64).all()


def test_hand_bboxes_from_wholebody_blocks():
    kps = np.zeros((133, 3), np.float32)
    kps[91:112, :2] = [10, 20]
    kps[91:96, 2] = 0.9  # 5 confident left-hand kps
    kps[91:96, 0] = [10, 12, 14, 16, 18]
    left, right = hand_bboxes_from_wholebody(kps)
    assert left is not None and right is None
    np.testing.assert_allclose(left, [10, 20, 18, 20])



def test_frcnn_outputs_and_matching():
    model = HandObjectDetector(FRCNN_TINY)
    img = jnp.ones((64, 64, 3)) * 0.5
    params = model.init(jax.random.key(0), img)
    out = model.apply(params, img)
    n = FRCNN_TINY.post_nms_top_n
    assert out["rois"].shape == (n, 4)
    assert out["cls_probs"].shape == (n, 3)
    assert out["contact_state"].shape == (n, 5)
    assert out["offset"].shape == (n, 3)
    # offset direction is 0.1-normalized (extension_layers.py:73-76)
    d = np.linalg.norm(np.asarray(out["offset"])[:, 1:], axis=-1)
    np.testing.assert_allclose(d, 0.1, atol=1e-4)

    obj_b, hand_b = detect_hand_object(model, params, np.ones((64, 64, 3), np.uint8))
    # no training: either None or a valid union box
    for b in (obj_b, hand_b):
        if b is not None:
            assert b.shape == (4,)

    # filter_object port
    objs = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    hands = np.array([[48, 48, 58, 58]], np.float32)
    contact = np.array([3])
    offsets = np.array([[0.001, 0.07, 0.07]], np.float32)  # points to +x+y
    ids = match_hands_to_objects(objs, hands, contact, offsets)
    assert ids == [1]
    assert match_hands_to_objects(objs, hands, np.array([0]), offsets) == [-1]


def test_anchors_shape():
    base = generate_anchors()
    # classic generate_anchors: 3 ratios x 4 scales, integer-rounded extents
    assert base.shape == (12, 4)
    # ratio 1.0, scale 16 -> the canonical [-120, -120, 135, 135]
    np.testing.assert_allclose(base[6], [-120, -120, 135, 135])
    a = shift_anchors(base, 4, 4, 16)
    assert a.shape == (4 * 4 * 12, 4)
    assert (a[:, 2] > a[:, 0]).all()



def test_gdino_detect():
    from followmyhold_tpu.models.gdino import (
        GroundingDino,
        preprocess_inputs,
        simple_tokenize,
    )

    model = GroundingDino(GDINO_TINY)
    ids = simple_tokenize("cup.", 16, vocab_size=GDINO_TINY.bert.vocab_size)
    img = np.full((80, 60, 3), 100, np.uint8)
    kwargs = preprocess_inputs(img, ids, GDINO_TINY.image_size)
    params = model.init(jax.random.key(0), **kwargs)
    out = model.apply(params, **kwargs)
    assert out["pred_boxes"].shape == (1, GDINO_TINY.num_queries, 4)
    assert float(out["pred_boxes"].min()) >= 0
    assert float(out["pred_boxes"].max()) <= 1
    boxes, scores = detect_text_prompt(model, params, img, "cup",
                                       box_threshold=0.0)
    assert boxes.shape[1] == 4 and len(boxes) == len(scores)



def test_vitpose_front_end_hand_bbox():
    """VitPoseFrontEnd: deterministic heatmaps -> handed hand boxes with
    the reference's >3-confident-keypoints gate (hand/hamer.py:134-152)."""
    from followmyhold_tpu.hand.hamer import VitPoseFrontEnd
    from followmyhold_tpu.models.vitpose import (
        NUM_WHOLEBODY_KPS,
        RIGHT_HAND_SLICE,
        VITPOSE_TINY,
        ViTPose,
    )

    class FakePose:
        cfg = ViTPose(VITPOSE_TINY).cfg

        def apply(self, params, images):
            B, H, W, _ = images.shape
            h, w = H // 4, W // 4
            hm = np.full((B, h, w, NUM_WHOLEBODY_KPS), -5.0, np.float32)
            # right-hand block peaks in the lower-right quadrant
            for i in range(RIGHT_HAND_SLICE.start, RIGHT_HAND_SLICE.stop):
                hm[:, int(h * 0.75), int(w * 0.75), i] = 2.0
            return jnp.asarray(hm)

    fe = VitPoseFrontEnd(pose_model=FakePose(), pose_params={})
    img = np.full((200, 160, 3), 0.5, np.float32)
    box_r = fe.hand_bbox(img, is_right=True)
    assert box_r is not None
    # point-mass block -> degenerate-extent box at ~3/4 of the image
    assert abs(box_r[0] - 160 * 0.75) < 12 and abs(box_r[1] - 200 * 0.75) < 12
    # left hand block has no confident keypoints -> None (mask fallback)
    assert fe.hand_bbox(img, is_right=False) is None
