"""Tests for transforms, camera, grid, knn, sdf, losses, image, nms."""

import jax
import jax.numpy as jnp
import numpy as np

from followmyhold_tpu.ops.camera import (
    GuidanceCamera,
    cam_crop_to_full,
    perspective_projection,
)
from followmyhold_tpu.ops.grid import generate_dense_grid_points, generate_grid_jax
from followmyhold_tpu.ops.image import (
    box_iou,
    gen_trans_from_patch,
    generate_patch_image,
    process_bbox,
    warp_affine,
)
from followmyhold_tpu.ops.knn import knn, nn_sqdist
from followmyhold_tpu.ops.losses import (
    attraction_loss,
    binary_cross_entropy,
    combine_losses_fp32,
    honerf_intersection_loss,
    mesh_edge_loss,
    normal_alignment_loss,
)
from followmyhold_tpu.ops.nms import nms, roi_align
from followmyhold_tpu.ops.sdf import mesh_to_sdf, point_triangle_sqdist, winding_number
from followmyhold_tpu.ops.transforms import (
    masked_bbox_center,
    scale_trans_rot,
    transform_around_center_w_scale,
    transform_points,
)


def unit_box():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
    faces = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
         [0, 1, 5], [0, 5, 4], [1, 2, 6], [1, 6, 5],
         [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]], np.int32)
    # outward winding (CCW seen from outside)
    return jnp.asarray(verts), jnp.asarray(faces)


# ---------- transforms ----------

def test_masked_bbox_center():
    verts = jnp.asarray([[0, 0, 0], [2, 2, 2], [100, 100, 100]], jnp.float32)
    mask = jnp.asarray([1, 1, 0], jnp.float32)
    np.testing.assert_allclose(masked_bbox_center(verts, mask), [1, 1, 1])


def test_transform_around_center_w_scale_identity_scale2():
    verts, _ = unit_box()
    T = jnp.eye(4)
    out = transform_around_center_w_scale(verts, T, jnp.asarray(2.0))
    # doubled about bbox center (0.5,0.5,0.5)
    np.testing.assert_allclose(
        np.asarray(out)[0], [-0.5, -0.5, -0.5], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out)[6], [1.5, 1.5, 1.5], atol=1e-6)


def test_scale_trans_rot_translation_only():
    verts, _ = unit_box()
    out = scale_trans_rot(
        verts, jnp.asarray(1.0), jnp.asarray([1.0, 2.0, 3.0]),
        jnp.asarray([1.0, 0.0, 0.0, 0.0]),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(verts) + [1, 2, 3], atol=1e-6)


def test_transform_points_4x4():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1, 0, 0]
    pts = jnp.zeros((5, 3))
    np.testing.assert_allclose(transform_points(pts, jnp.asarray(T))[:, 0], 1.0)


# ---------- camera ----------

def test_perspective_projection_center():
    # point on optical axis projects to camera center
    pts = jnp.zeros((1, 1, 3))
    tr = jnp.asarray([[0.0, 0.0, 5.0]])
    f = jnp.asarray([[1000.0, 1000.0]])
    c = jnp.asarray([[256.0, 256.0]])
    uv = perspective_projection(pts, tr, f, c)
    np.testing.assert_allclose(np.asarray(uv)[0, 0], [256, 256], atol=1e-5)


def test_cam_crop_to_full_formula():
    cam_bbox = jnp.asarray([[1.0, 0.1, -0.2]])
    box_center = jnp.asarray([[300.0, 200.0]])
    box_size = jnp.asarray([100.0])
    img_size = jnp.asarray([[640.0, 480.0]])
    out = np.asarray(cam_crop_to_full(cam_bbox, box_center, box_size, img_size, 5000.0))
    bs = 100.0
    np.testing.assert_allclose(out[0, 2], 2 * 5000.0 / bs, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0], 2 * (300 - 320) / bs + 0.1, rtol=1e-4)


def test_guidance_camera_center_projection():
    cam = GuidanceCamera(height=512, width=512, fov_deg=60.0)
    # GL convention: camera looks down -z; point straight ahead
    p = jnp.asarray([[0.0, 0.0, -2.0]])
    uvz = np.asarray(cam.project(p))
    np.testing.assert_allclose(uvz[0, :2], [255.5, 255.5], atol=1e-4)
    np.testing.assert_allclose(uvz[0, 2], 2.0, atol=1e-6)


def test_guidance_camera_offsets():
    cam = GuidanceCamera(height=512, width=512, fov_deg=90.0)
    # fov 90 -> f = (512-1)/2; x=+z_dist/2 should land 1/4 extent right of center
    p = jnp.asarray([[1.0, 0.0, -2.0], [0.0, 1.0, -2.0]])
    uvz = np.asarray(cam.project(p))
    assert uvz[0, 0] > 255.5 and abs(uvz[0, 1] - 255.5) < 1e-3
    # +y world (up in GL) -> v decreases? y_cam = -y -> v = cy + f*(-1/2) < cy
    assert uvz[1, 1] < 255.5


# ---------- grid ----------

def test_dense_grid_matches_reference_shape():
    xyz, gs, length = generate_dense_grid_points([-1.1] * 3, [1.1] * 3, 64)
    assert xyz.shape == (65**3, 3)
    assert gs == (65, 65, 65)
    np.testing.assert_allclose(np.asarray(length), [2.2] * 3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xyz)[0], [-1.1] * 3)
    np.testing.assert_allclose(np.asarray(xyz)[-1], [1.1] * 3)
    # 'ij' indexing: second element varies z
    np.testing.assert_allclose(np.asarray(xyz)[1], [-1.1, -1.1, -1.1 + 2.2 / 64], atol=1e-6)


def test_grid_jax_traced_bounds():
    g = jax.jit(lambda lo, hi: generate_grid_jax(lo, hi, 4))(
        jnp.asarray([0.0, 0, 0]), jnp.asarray([1.0, 1, 1])
    )
    assert g.shape == (125, 3)
    np.testing.assert_allclose(np.asarray(g)[-1], [1, 1, 1], atol=1e-6)


# ---------- knn ----------

def test_nn_sqdist_exact():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(50, 3)).astype(np.float32)
    p = rng.normal(size=(70, 3)).astype(np.float32)
    d2, idx = nn_sqdist(jnp.asarray(q), jnp.asarray(p))
    ref = ((q[:, None] - p[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref.min(-1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(-1))


def test_nn_sqdist_chunked_and_masked():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(100, 3)).astype(np.float32)
    p = rng.normal(size=(40, 3)).astype(np.float32)
    mask = np.zeros(40, np.float32)
    mask[:10] = 1
    d2, idx = nn_sqdist(jnp.asarray(q), jnp.asarray(p), jnp.asarray(mask), chunk=32)
    ref = ((q[:, None] - p[None, :10]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), ref.min(-1), rtol=1e-4, atol=1e-5)
    assert (np.asarray(idx) < 10).all()


def test_knn_topk():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(20, 3)).astype(np.float32)
    p = rng.normal(size=(30, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(p), k=3)
    ref = np.sort(((q[:, None] - p[None]) ** 2).sum(-1), axis=-1)[:, :3]
    np.testing.assert_allclose(np.sort(np.asarray(d2), -1), ref, rtol=1e-4, atol=1e-5)


# ---------- sdf ----------

def test_point_triangle_sqdist_analytic():
    tri = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
    pts = jnp.asarray(
        [[0.25, 0.25, 1.0],   # above interior -> d=1
         [-1.0, 0.0, 0.0],    # beyond vertex a -> d=1
         [0.5, -2.0, 0.0],    # below edge ab -> d=2
         [1.0, 1.0, 0.0]],    # beyond hypotenuse -> d=sqrt(2)/2
        jnp.float32,
    )
    d2 = np.asarray(point_triangle_sqdist(pts, tri))[:, 0]
    np.testing.assert_allclose(d2, [1.0, 1.0, 4.0, 0.5], atol=1e-5)


def test_winding_number_box():
    verts, faces = unit_box()
    pts = jnp.asarray([[0.5, 0.5, 0.5], [2.0, 2.0, 2.0], [0.1, 0.1, 0.1]], jnp.float32)
    wn = np.asarray(winding_number(pts, verts, faces))
    np.testing.assert_allclose(wn, [1.0, 0.0, 1.0], atol=1e-4)


def test_mesh_to_sdf_box():
    verts, faces = unit_box()
    pts = jnp.asarray(
        [[0.5, 0.5, 0.5],    # center: inside, dist 0.5
         [0.5, 0.5, 2.0],    # outside, dist 1.0
         [0.5, 0.5, 1.25]],  # outside, dist 0.25
        jnp.float32,
    )
    sdf = np.asarray(mesh_to_sdf(pts, verts, faces))
    np.testing.assert_allclose(sdf, [-0.5, 1.0, 0.25], atol=1e-4)


def test_mesh_to_sdf_face_mask_padding():
    verts, faces = unit_box()
    faces_padded = jnp.concatenate([faces, jnp.zeros((6, 3), jnp.int32)])
    mask = jnp.concatenate([jnp.ones(12), jnp.zeros(6)])
    pts = jnp.asarray([[0.5, 0.5, 0.5], [0.5, 0.5, 2.0]], jnp.float32)
    sdf = np.asarray(mesh_to_sdf(pts, verts, faces_padded, mask))
    np.testing.assert_allclose(sdf, [-0.5, 1.0], atol=1e-4)


def test_sdf_differentiable():
    verts, faces = unit_box()
    pts = jnp.asarray([[0.5, 0.5, 1.7]], jnp.float32)

    def f(v):
        return mesh_to_sdf(pts, v, faces).sum()

    g = np.asarray(jax.grad(f)(verts))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


# ---------- losses ----------

def test_normal_alignment_loss():
    r = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]])
    g = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]])
    assert float(normal_alignment_loss(r, g)) == 1.0  # mean(0, 2)
    m = jnp.asarray([[True, False]])
    assert float(normal_alignment_loss(r, g, m)) == 0.0


def test_bce_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    p = rng.uniform(0.01, 0.99, size=(8, 8)).astype(np.float32)
    t = (rng.random((8, 8)) > 0.5).astype(np.float32)
    ours = float(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t)))
    theirs = float(torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(p), torch.from_numpy(t)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_honerf_intersection_count():
    sdf_h = jnp.asarray([-1.0, -1.0, 1.0, -1.0])
    sdf_o = jnp.asarray([-1.0, 1.0, -1.0, -1.0])
    # points inside both: idx 0 and 3 -> 2/1000
    np.testing.assert_allclose(float(honerf_intersection_loss(sdf_h, sdf_o)), 0.002)


def test_attraction_loss_margin():
    d2 = jnp.asarray([0.0, 0.02, 0.005])
    np.testing.assert_allclose(
        float(attraction_loss(d2, margin=0.01)), np.mean([0.0, 0.01, 0.0]), atol=1e-7
    )


def test_mesh_edge_loss():
    verts = jnp.asarray([[0, 0, 0], [2, 0, 0], [0, 1, 0]], jnp.float32)
    edges = jnp.asarray([[0, 1], [0, 2]])
    np.testing.assert_allclose(float(mesh_edge_loss(verts, edges)), (4 + 1) / 2, atol=1e-6)


def test_combine_losses_nan_guard():
    total = combine_losses_fp32(
        {"a": jnp.asarray(1.0), "b": jnp.asarray(jnp.nan)}, {"a": 2.0, "b": 5.0}
    )
    np.testing.assert_allclose(float(total), 2.0)


# ---------- image ----------

def test_gen_trans_identity():
    # crop the full image to same size -> identity
    t = gen_trans_from_patch(32, 32, 64, 64, 64, 64)
    np.testing.assert_allclose(t, [[1, 0, 0], [0, 1, 0]], atol=1e-6)


def test_gen_trans_matches_cv2_semantics():
    # scale-up crop: 32x32 patch centered at (16,16) -> 64x64 output
    t = gen_trans_from_patch(16, 16, 32, 32, 64, 64)
    # maps (16,16)->(32,32) and (32,16)->(64,32)
    np.testing.assert_allclose(t @ [16, 16, 1], [32, 32], atol=1e-5)
    np.testing.assert_allclose(t @ [32, 16, 1], [64, 32], atol=1e-5)
    tinv = gen_trans_from_patch(16, 16, 32, 32, 64, 64, inv=True)
    np.testing.assert_allclose(tinv @ [32, 32, 1], [16, 16], atol=1e-5)


def test_warp_affine_translation():
    img = jnp.zeros((8, 8))
    img = img.at[2, 3].set(1.0)
    t = jnp.asarray([[1.0, 0, 1], [0, 1, 2]])  # shift x+1, y+2
    out = np.asarray(warp_affine(img, t, (8, 8)))
    assert out[4, 4] == 1.0


def test_generate_patch_image_flip():
    img = jnp.zeros((16, 16, 3)).at[8, 2, 0].set(1.0)
    patch, T = generate_patch_image(img, [0, 0, 16, 16], (16, 16), do_flip=True)
    # x=2 flips to x=13 in the flipped image; the reference's center shift
    # (c_x = W - c_x - 1, segment_hoi_sam2.py:93) then moves it to 14.
    assert np.asarray(patch)[8, 14, 0] > 0.9
    assert T.shape == (3, 3)


def test_process_bbox_squares_and_scales():
    out = process_bbox([0, 0, 10, 20], factor=1.25)
    assert out[2] == out[3] == 25.0
    # center preserved
    assert out[0] + out[2] / 2 == 5.0 and out[1] + out[3] / 2 == 10.0


def test_box_iou():
    a = jnp.asarray([0.0, 0, 10, 10])
    b = jnp.asarray([5.0, 5, 15, 15])
    np.testing.assert_allclose(float(box_iou(a, b)), 25 / 175, rtol=1e-6)
    np.testing.assert_allclose(float(box_iou(a, a)), 1.0)


# ---------- nms / roi_align ----------

def test_nms_suppression():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms(boxes, scores, iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def _greedy_nms_numpy(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            x1 = max(boxes[i, 0], boxes[j, 0]); y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2]); y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter) > thresh:
                suppressed[j] = True
    return np.sort(np.array(keep))


def test_nms_matches_greedy_reference():
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 50, size=(30, 2)).astype(np.float32)
    wh = rng.uniform(5, 25, size=(30, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=-1)
    scores = rng.random(30).astype(np.float32)
    keep_ref = _greedy_nms_numpy(boxes, scores, 0.4)
    keep_ours = np.flatnonzero(np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.4)))
    np.testing.assert_array_equal(keep_ref, keep_ours)


def test_roi_align_constant_field():
    feat = jnp.ones((16, 16, 2)) * 3.0
    boxes = jnp.asarray([[2.0, 2, 10, 10]])
    out = np.asarray(roi_align(feat, boxes, (4, 4)))
    np.testing.assert_allclose(out, 3.0, atol=1e-5)
