"""YOLOv8 (WiLoR detector slot) model + converter tests."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from followmyhold_tpu.models.yolov8 import (
    YOLOV8_TINY_TEST,
    YoloV8,
    detect_hands_yolov8,
)


def test_yolov8_forward_and_detect():
    m = YoloV8(YOLOV8_TINY_TEST)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), img)
    boxes, scores = m.apply(params, img)
    n = (64 // 8) ** 2 + (64 // 16) ** 2 + (64 // 32) ** 2
    assert boxes.shape == (1, n, 4)
    assert scores.shape == (1, n, 2)
    dets = detect_hands_yolov8(m, params, np.full((80, 60, 3), 120, np.uint8),
                               conf=0.0)
    assert isinstance(dets, list)
    if dets:
        assert set(dets[0]) == {"box", "score", "is_right"}


def test_fuse_conv_bn_matches_torch():
    torch = pytest.importorskip("torch")
    from followmyhold_tpu.convert.yolov8 import fuse_conv_bn

    torch.manual_seed(0)
    conv = torch.nn.Conv2d(4, 8, 3, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3)
    bn.weight.data.normal_(1.0, 0.2)
    bn.bias.data.normal_(0, 0.2)
    bn.running_mean.normal_(0, 0.5)
    bn.running_var.uniform_(0.5, 2.0)
    bn.eval()
    x = torch.randn(2, 4, 8, 8)
    with torch.no_grad():
        ref = bn(conv(x)).numpy()

    wf, bf = fuse_conv_bn(conv.weight.detach().numpy(),
                          bn.weight.detach().numpy(),
                          bn.bias.detach().numpy(),
                          bn.running_mean.numpy(), bn.running_var.numpy())
    fused = torch.nn.Conv2d(4, 8, 3, padding=1)
    fused.weight.data = torch.from_numpy(wf)
    fused.bias.data = torch.from_numpy(bf)
    with torch.no_grad():
        out = fused(x).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def _inverse_map(flax_path):
    """'m2/m0/cv1' -> '2.m.0.cv1'; 'm22/cv2_1_0' -> '22.cv2.1.0'."""
    parts = flax_path.split("/")
    out = [parts[0][1:]]
    for p in parts[1:]:
        mm = re.fullmatch(r"m(\d+)", p)
        hd = re.fullmatch(r"(cv[23])_(\d+)_(\d+)", p)
        if mm:
            out += ["m", mm.group(1)]
        elif hd:
            out += [hd.group(1), hd.group(2), hd.group(3)]
        else:
            out.append(p)
    return ".".join(out)


def test_yolov8_converter_layout_complete():
    from followmyhold_tpu.convert.yolov8 import convert_yolov8

    cfg = YOLOV8_TINY_TEST
    m = YoloV8(cfg)
    params = m.init(jax.random.key(1),
                    jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))
    rng = np.random.default_rng(2)

    # synthesize the ultralytics layout from the flax shapes
    sd = {}
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        arr = np.asarray(leaf)
        if names[-1] == "kernel":
            w_t = np.transpose(arr, (3, 2, 0, 1))     # flax->torch conv
            if len(names) >= 3 and names[-2] == "conv":
                base = "model." + _inverse_map("/".join(names[1:-2]))
                out_ch = w_t.shape[0]
                sd[f"{base}.conv.weight"] = rng.normal(
                    0, 0.05, w_t.shape).astype(np.float32)
                sd[f"{base}.bn.weight"] = rng.uniform(
                    0.5, 1.5, out_ch).astype(np.float32)
                sd[f"{base}.bn.bias"] = rng.normal(0, 0.1, out_ch).astype(np.float32)
                sd[f"{base}.bn.running_mean"] = rng.normal(
                    0, 0.1, out_ch).astype(np.float32)
                sd[f"{base}.bn.running_var"] = rng.uniform(
                    0.5, 1.5, out_ch).astype(np.float32)
                sd[f"{base}.bn.num_batches_tracked"] = np.asarray(1)
            else:
                base = "model." + _inverse_map("/".join(names[1:-1]))
                sd[f"{base}.weight"] = rng.normal(
                    0, 0.05, w_t.shape).astype(np.float32)
                sd[f"{base}.bias"] = rng.normal(
                    0, 0.05, w_t.shape[0]).astype(np.float32)
    sd["model.22.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(
        1, 16, 1, 1)

    conv_params, report = convert_yolov8(sd, cfg)
    assert not report.missing_src, report.missing_src[:8]
    assert not report.unused_src, report.unused_src[:8]

    boxes, scores = m.apply(
        conv_params, jnp.asarray(rng.uniform(
            0, 1, (1, cfg.image_size, cfg.image_size, 3)).astype(np.float32)))
    assert np.isfinite(np.asarray(boxes)).all()
    assert np.isfinite(np.asarray(scores)).all()
