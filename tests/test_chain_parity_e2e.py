"""End-to-end postprocess-chain parity for yolov5-face and MTCNN.

yolov5: synthetic raw stride-8/16/32 head maps run through the reference's
OWN ``conv_strides_to_anchors`` + ``w_non_max_suppression``
(``modules/yolov5_face/onnx/onnx_utils.py:30-163``) vs our fused
``decode_heads`` + ``yolov5_face_postprocess`` — the same oracle pattern as
tests/test_blazeface_e2e_parity.py.

MTCNN: the mtcnn pip package / facenet numpy cascade is not installable here
(zero egress, needs TF), so the oracle is an independent ragged-numpy
implementation of the published facenet ``detect_face`` staging written in
this test (loops, np.where, per-level lists — none of our masked fixed-K
machinery), sharing only the P/R/O-Net forward passes and resize kernel with
the implementation under test. Box-for-box agreement proves the masked
fixed-shape cascade reproduces the classic ragged algorithm.
"""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # parity lane (pyproject addopts)

REF = "/root/reference/face_detection_and_extraction"


@pytest.fixture(scope="module")
def ref_onnx_utils():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    torch = pytest.importorskip("torch")
    # complete stub: later tests in the same session (mobile_facenet) import
    # torchvision.transforms through whatever module is already registered
    tv = types.ModuleType("torchvision")
    tv.ops = types.ModuleType("torchvision.ops")
    tv.ops.nms = lambda *a, **k: torch.zeros(0, dtype=torch.long)
    tv.transforms = types.SimpleNamespace(
        Compose=lambda *a, **k: None, Resize=lambda *a, **k: None,
        ToTensor=lambda *a, **k: None, Normalize=lambda *a, **k: None,
    )
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", tv.ops)
    sys.modules.setdefault("torchvision.transforms", tv.transforms)
    sys.path.insert(0, REF)
    from modules.yolov5_face.onnx import onnx_utils

    return onnx_utils


def _raw_heads(rng, grids=((8, 8), (4, 4), (2, 2)), na=3, no=16, hot=25):
    """Raw head maps with a controlled number of confident anchors and
    clustered boxes so NMS suppression actually executes."""
    maps = []
    total = sum(na * h * w for h, w in grids)
    hot_idx = set(rng.choice(total, hot, replace=False).tolist())
    flat_i = 0
    for gh, gw in grids:
        m = rng.uniform(-3, 3, (1, na, gh, gw, no)).astype(np.float32)
        m[..., 4] = -6.0  # objectness logit: default cold
        for a in range(na):
            for y in range(gh):
                for x in range(gw):
                    if flat_i in hot_idx:
                        m[0, a, y, x, 4] = rng.uniform(1.0, 4.0)
                    flat_i += 1
        maps.append(m)
    return maps


def test_yolov5_decode_chain_matches_reference(ref_onnx_utils, rng):
    """Full 16-col decode parity: reference conv_strides_to_anchors vs our
    decode_heads on identical raw maps."""
    from face_detection_and_recognition_tpu.models.yolov5_face import (
        FACE_ANCHORS, decode_heads,
    )

    maps = _raw_heads(rng)
    ref = ref_onnx_utils.conv_strides_to_anchors(maps, "cpu").numpy()
    ours = np.asarray(decode_heads(maps, FACE_ANCHORS, (8, 16, 32)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_yolov5_nms_chain_matches_reference(ref_onnx_utils, rng):
    """Box-for-box NMS parity: reference w_non_max_suppression (the custom
    +1px-IoU python while loop) vs our masked fixed-size postprocess."""
    import torch

    from face_detection_and_recognition_tpu.models.yolov5_face import (
        FACE_ANCHORS, YoloV5FaceConfig, decode_heads, yolov5_face_postprocess,
    )

    for trial in range(3):
        maps = _raw_heads(rng, hot=30)
        decoded = ref_onnx_utils.conv_strides_to_anchors(maps, "cpu")
        ref_out = ref_onnx_utils.w_non_max_suppression(
            decoded.clone(), num_classes=1, conf_thres=0.4, nms_thres=0.3)[0]
        ref_rows = (ref_out.numpy() if ref_out is not None
                    else np.zeros((0, 7), np.float32))

        ours_pred = np.asarray(decode_heads(maps, FACE_ANCHORS, (8, 16, 32)))
        cfg = YoloV5FaceConfig(conf_thres=0.4, iou_thres=0.3,
                               max_candidates=256, max_det=64,
                               pallas_nms=False)
        dets, valid = yolov5_face_postprocess(ours_pred, cfg)
        got = np.asarray(dets[0])[np.asarray(valid[0])]

        assert len(got) == len(ref_rows), f"trial {trial}"
        if not len(got):
            continue
        order_r = np.argsort(-ref_rows[:, 4], kind="stable")
        order_g = np.argsort(-got[:, 4], kind="stable")
        # [x1, y1, x2, y2, obj] must agree box-for-box
        np.testing.assert_allclose(got[order_g][:, :5],
                                   ref_rows[order_r][:, :5],
                                   rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# MTCNN cascade oracle
# ---------------------------------------------------------------------------


def _np_nms(boxes, scores, thres, mode="Union"):
    """Classic ragged greedy NMS with the facenet +1 convention."""
    if len(boxes) == 0:
        return np.zeros(0, int)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = (np.maximum(0.0, xx2 - xx1 + 1)
                 * np.maximum(0.0, yy2 - yy1 + 1))
        if mode == "Min":
            o = inter / np.minimum(area[i], area[order[1:]])
        else:
            o = inter / (area[i] + area[order[1:]] - inter)
        order = order[1:][o <= thres]
    return np.asarray(keep, int)


def _np_rerec(b):
    w, h = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
    l = np.maximum(w, h)
    b = b.copy()
    b[:, 0] = b[:, 0] + w * 0.5 - l * 0.5
    b[:, 1] = b[:, 1] + h * 0.5 - l * 0.5
    b[:, 2] = b[:, 0] + l
    b[:, 3] = b[:, 1] + l
    return b


def _np_bbreg(b, reg):
    w = b[:, 2] - b[:, 0] + 1
    h = b[:, 3] - b[:, 1] + 1
    out = b.copy()
    out[:, 0] += reg[:, 0] * w
    out[:, 1] += reg[:, 1] * h
    out[:, 2] += reg[:, 2] * w
    out[:, 3] += reg[:, 3] * h
    return out


def _np_crops(norm, boxes, size, resize):
    """facenet pad(): boxes are 1-based, so the 0-based crop is
    img[y1-1:y2, x1-1:x2] — origin (x1-1, y1-1), size (x2-x1+1, y2-y1+1);
    out-of-bounds region lands in a zero canvas before resampling."""
    import jax.numpy as jnp

    h, w = norm.shape[:2]
    out = []
    for b in boxes:
        x1, y1, x2, y2 = (int(v) for v in np.trunc(b))
        cw, ch = max(x2 - x1 + 1, 1), max(y2 - y1 + 1, 1)
        ox, oy = x1 - 1, y1 - 1
        canvas = np.zeros((ch, cw, 3), np.float32)
        sx1, sy1 = max(ox, 0), max(oy, 0)
        sx2, sy2 = min(ox + cw, w), min(oy + ch, h)
        if sx2 > sx1 and sy2 > sy1:
            canvas[sy1 - oy:sy2 - oy, sx1 - ox:sx2 - ox] = norm[sy1:sy2,
                                                                sx1:sx2]
        out.append(np.asarray(resize(jnp.asarray(canvas), (size, size))))
    return np.stack(out) if out else np.zeros((0, size, size, 3), np.float32)


def _numpy_cascade(cascade, variables, img_bgr):
    """Independent ragged facenet detect_face staging (Zhang et al. 2016 as
    published in facenet align/detect_face.py), sharing only net forwards +
    resize with the code under test."""
    import jax.numpy as jnp

    from face_detection_and_recognition_tpu.models.mtcnn import pyramid_scales
    from face_detection_and_recognition_tpu.ops.geometry import resize_bilinear

    cfg = cascade.cfg
    t1, t2, t3 = cfg.thresholds
    h, w = img_bgr.shape[:2]
    norm = (img_bgr.astype(np.float32)[..., ::-1] - 127.5) * 0.0078125

    total = []
    for scale in pyramid_scales(h, w, cfg.min_size, cfg.factor):
        sh, sw = int(np.ceil(h * scale)), int(np.ceil(w * scale))
        resized = np.asarray(resize_bilinear(jnp.asarray(norm), (sh, sw)))
        prob, reg = cascade.pnet.apply(variables["pnet"], resized[None])
        score = np.asarray(prob)[0, :, :, 1]
        regs = np.asarray(reg)[0]
        yy, xx = np.where(score > t1)
        if not len(yy):
            continue
        s = score[yy, xx]
        b = np.stack([np.trunc((2.0 * xx + 1.0) / scale),
                      np.trunc((2.0 * yy + 1.0) / scale),
                      np.trunc((2.0 * xx + 12.0) / scale),
                      np.trunc((2.0 * yy + 12.0) / scale)], axis=-1)
        r = regs[yy, xx]
        keep = _np_nms(b, s, 0.5)
        total.append((b[keep], s[keep], r[keep]))
    if not total:
        return np.zeros((0, 15), np.float32)
    boxes = np.concatenate([t[0] for t in total])
    scores = np.concatenate([t[1] for t in total])
    regs = np.concatenate([t[2] for t in total])

    keep = _np_nms(boxes, scores, 0.7)
    boxes, scores, regs = boxes[keep], scores[keep], regs[keep]
    bw, bh = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    boxes = np.stack([boxes[:, 0] + regs[:, 0] * bw,
                      boxes[:, 1] + regs[:, 1] * bh,
                      boxes[:, 2] + regs[:, 2] * bw,
                      boxes[:, 3] + regs[:, 3] * bh], axis=-1)
    boxes = np.trunc(_np_rerec(boxes))

    # stage 2
    crops = _np_crops(norm, boxes, 24, resize_bilinear)
    prob, reg = cascade.rnet.apply(variables["rnet"], crops)
    score = np.asarray(prob)[:, 1]
    reg = np.asarray(reg)
    ipass = score > t2
    boxes, score, reg = boxes[ipass], score[ipass], reg[ipass]
    if len(boxes):
        keep = _np_nms(boxes, score, 0.7)
        boxes, score, reg = boxes[keep], score[keep], reg[keep]
        boxes = np.trunc(_np_rerec(_np_bbreg(boxes, reg)))

    # stage 3
    crops = _np_crops(norm, boxes, 48, resize_bilinear)
    prob, reg, lmk = cascade.onet.apply(variables["onet"], crops)
    score = np.asarray(prob)[:, 1]
    reg, lmk = np.asarray(reg), np.asarray(lmk)
    ipass = score > t3
    boxes, score, reg, lmk = boxes[ipass], score[ipass], reg[ipass], lmk[ipass]
    if not len(boxes):
        return np.zeros((0, 15), np.float32)
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    lx = bw[:, None] * lmk[:, 0:5] + boxes[:, 0:1] - 1
    ly = bh[:, None] * lmk[:, 5:10] + boxes[:, 1:2] - 1
    boxes = _np_bbreg(boxes, reg)
    keep = _np_nms(boxes, score, 0.7, mode="Min")
    boxes, score, lx, ly = boxes[keep], score[keep], lx[keep], ly[keep]
    pairs = np.stack([lx, ly], axis=-1).reshape(len(boxes), 10)
    dets = np.concatenate([boxes, pairs, score[:, None]], axis=-1)
    return dets / np.asarray([w, h] * 7 + [1], np.float32)


def test_mtcnn_cascade_matches_numpy_oracle():
    from face_detection_and_recognition_tpu.models.mtcnn import (MTCNN,
                                                                 MTCNNConfig)

    # local rng: the session fixture's draw position depends on test order,
    # and this test needs specific draws that push proposals through all
    # three stages of the random-init cascade
    rng = np.random.RandomState(42)
    # lower thresholds so random-init nets emit proposals through all stages
    cfg = MTCNNConfig(thresholds=(0.5, 0.4, 0.3), min_size=40)
    cascade = MTCNN(cfg)
    variables = cascade.variables()

    hits = 0
    for trial in range(4):
        img = rng.randint(0, 255, (120, 100, 3)).astype(np.uint8)
        ref = _numpy_cascade(cascade, variables, img)
        dets, valid = cascade(variables, img)
        got = np.asarray(dets)[np.asarray(valid)]

        assert len(got) == len(ref), f"trial {trial}"
        if len(ref):
            hits += 1
            order_r = np.lexsort(ref.T[:2])
            order_g = np.lexsort(got.T[:2])
            np.testing.assert_allclose(got[order_g], ref[order_r],
                                       rtol=1e-3, atol=2e-4)
    assert hits >= 1, "no trial produced detections; oracle unexercised"


def test_official_yolov5_nms_matches_reference(ref_onnx_utils, rng):
    """Official (multiclass) path: our masked class-offset NMS vs the
    reference's own non_max_suppression (onnx_utils.py:193-288), with a
    FAITHFUL torchvision.ops.nms implanted in the stub (strict-IoU greedy,
    plain x2-x1 areas)."""
    import torch

    from face_detection_and_recognition_tpu.models.yolov5_face import (
        YoloV5FaceConfig, yolov5_official_postprocess,
    )

    def tv_nms(boxes, scores, thres):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            b1, rest = boxes[i], boxes[order[1:]]
            lt = torch.max(b1[:2], rest[:, :2])
            rb = torch.min(b1[2:], rest[:, 2:])
            inter = (rb - lt).clamp(min=0).prod(1)
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
            iou = inter / (a1 + a2 - inter)
            order = order[1:][iou <= thres]
        return torch.stack(keep)

    sys.modules["torchvision"].ops.nms = tv_nms

    nc = 6
    for trial in range(3):
        # decoded predictions [1, N, 5+nc]: plausible xywh, mostly-cold obj
        n = 400
        pred = np.zeros((1, n, 5 + nc), np.float32)
        pred[0, :, 0:2] = rng.uniform(50, 590, (n, 2))
        pred[0, :, 2:4] = rng.uniform(10, 120, (n, 2))
        pred[0, :, 4] = 0.01
        hot = rng.choice(n, 40, replace=False)
        pred[0, hot, 4] = rng.uniform(0.45, 0.99, 40)
        pred[0, :, 5:] = rng.uniform(0, 1, (n, nc))
        # cluster half the hot boxes so NMS suppression executes
        pred[0, hot[:20], 0:4] = pred[0, hot[0], 0:4] + rng.uniform(
            -4, 4, (20, 4)).astype(np.float32)

        ref = ref_onnx_utils.non_max_suppression(
            torch.from_numpy(pred.copy()), conf_thres=0.4, iou_thres=0.5,
            agnostic=False)[0].numpy()

        cfg = YoloV5FaceConfig(conf_thres=0.4, iou_thres=0.5,
                               max_candidates=256, max_det=300)
        dets, valid = yolov5_official_postprocess(pred, cfg)
        got = np.asarray(dets[0])[np.asarray(valid[0])]

        assert len(got) == len(ref), f"trial {trial}"
        if not len(got):
            continue
        o_r = np.argsort(-ref[:, 4], kind="stable")
        o_g = np.argsort(-got[:, 4], kind="stable")
        np.testing.assert_allclose(got[o_g], ref[o_r], rtol=1e-4, atol=1e-4)


def test_official_decode_matches_torch_detect_inference(rng):
    """decode_heads(landmarks=False) == the official Detect layer's
    inference transform (sigmoid-all, xy/wh grid-anchor decode)."""
    import torch

    from face_detection_and_recognition_tpu.models.yolov5_face import (
        OFFICIAL_ANCHORS, decode_heads,
    )

    nc, na = 3, 3
    grids = ((8, 8), (4, 4), (2, 2))
    strides = (8, 16, 32)
    maps = [rng.uniform(-3, 3, (1, na, gh, gw, 5 + nc)).astype(np.float32)
            for gh, gw in grids]
    ours = np.asarray(decode_heads(maps, OFFICIAL_ANCHORS, strides, nc,
                                   landmarks=False))

    outs = []
    for m, anc, stride in zip(maps, OFFICIAL_ANCHORS, strides):
        t = torch.sigmoid(torch.from_numpy(m))
        _, _, ny, nx, no = m.shape
        yv, xv = torch.meshgrid([torch.arange(ny), torch.arange(nx)])
        grid = torch.stack((xv, yv), 2).view(1, 1, ny, nx, 2).float()
        anc_t = torch.tensor(anc, dtype=torch.float32).view(1, na, 1, 1, 2)
        xy = (t[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (t[..., 2:4] * 2.0) ** 2 * anc_t
        outs.append(torch.cat([xy, wh, t[..., 4:]], -1).view(1, -1, no))
    ref = torch.cat(outs, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
