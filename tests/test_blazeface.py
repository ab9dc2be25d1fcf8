"""BlazeFace: anchor generation, shape contracts, and — when the reference
repo is mounted — bit-level architecture parity against the torch graph with
randomly initialized weights converted through utils/weights.py."""
import os
import sys

import numpy as np
import pytest

from face_detection_and_recognition_tpu.models import blazeface as BF
from face_detection_and_recognition_tpu.utils.weights import convert_blazeface

REF = "/root/reference/face_detection_and_extraction"


def test_anchor_generation():
    anchors = BF.generate_anchors()
    assert anchors.shape == (896, 4)
    assert (anchors[:, 2:] == 1.0).all()
    # first 512 anchors: 16x16 map, 2 per cell
    np.testing.assert_allclose(anchors[0, :2], [0.5 / 16, 0.5 / 16])
    np.testing.assert_allclose(anchors[1, :2], [0.5 / 16, 0.5 / 16])
    np.testing.assert_allclose(anchors[2, :2], [1.5 / 16, 0.5 / 16])
    # last 384: 8x8 map, 6 per cell
    np.testing.assert_allclose(anchors[512, :2], [0.5 / 8, 0.5 / 8])
    np.testing.assert_allclose(anchors[-1, :2], [7.5 / 8, 7.5 / 8])


@pytest.mark.parametrize("back", [False, True])
def test_forward_shapes(back):
    cfg = BF.BlazeFaceConfig(back_model=back)
    net, params, detect = BF.make_blazeface(cfg)
    w, h = cfg.input_size
    import jax.numpy as jnp

    x = jnp.zeros((2, h, w, 3), jnp.float32)
    raw_boxes, raw_scores = net.apply(params, x)
    assert raw_boxes.shape == (2, 896, 16)
    assert raw_scores.shape == (2, 896, 1)
    dets, valid = detect(params, x)
    assert dets.shape == (2, cfg.max_faces, 17)
    assert valid.shape == (2, cfg.max_faces)


@pytest.mark.parametrize("back", [False, True])
def test_torch_parity_random_weights(back, rng):
    """Convert a randomly-initialized reference torch BlazeFace into our flax
    tree and demand identical raw head outputs — proves the NHWC
    re-architecture (padding, residuals, head flattening order) is exact."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    sys.path.insert(0, REF)
    import torch

    from modules.blazeface.blazeface import BlazeFace as TorchBlazeFace

    torch.manual_seed(0)
    tnet = TorchBlazeFace(back_model=back).eval()

    params = convert_blazeface(tnet.state_dict(), back_model=back)
    net = BF.BlazeFaceNet(back_model=back)

    size = 256 if back else 128
    x = rng.uniform(-1, 1, (2, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        t_boxes, t_scores = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    import jax

    j_boxes, j_scores = jax.jit(net.apply)(jax.device_put(params), x)
    np.testing.assert_allclose(np.asarray(j_boxes), t_boxes.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_scores), t_scores.numpy(), atol=2e-4)


def test_detect_pipeline_on_synthetic_blob(rng):
    """End-to-end smoke: random weights won't find faces, but the pipeline
    must run jitted and produce a consistent masked output."""
    cfg = BF.BlazeFaceConfig(back_model=False)
    _, params, detect = BF.make_blazeface(cfg)
    x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    dets, valid = detect(params, x)
    dets, valid = np.asarray(dets), np.asarray(valid)
    # all reported dets must carry score >= threshold; padding rows are zero
    assert (dets[valid][:, -1] >= cfg.min_score_thresh - 1e-6).all()
    assert (dets[~valid] == 0).all()
