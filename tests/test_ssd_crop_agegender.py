"""SSD family, crop kernel, and age/gender heads."""
import cv2
import numpy as np
import pytest

from face_detection_and_recognition_tpu.models import age_gender as AG
from face_detection_and_recognition_tpu.models import ssd as SSD
from face_detection_and_recognition_tpu.ops.crop import (crop_and_resize,
                                                         pad_boxes)


def test_prior_generation_counts():
    cfg = SSD.SSDConfig(input_size=(300, 300))
    priors = SSD.generate_priors(cfg)
    expect = 38 * 38 * 2 + 19 * 19 * 2 + 10 * 10 * 2 + 5 * 5 * 3
    assert priors.shape == (expect, 4)
    assert (priors[:, 2:] <= 1.0).all() and (priors[:, 2:] > 0).all()


def test_ssd_decode_identity():
    cfg = SSD.SSDConfig()
    priors = SSD.generate_priors(cfg)[:10]
    locs = np.zeros((1, 10, 4), np.float32)
    boxes = np.asarray(SSD.decode_ssd_locs(locs, priors, cfg.variances))[0]
    # zero locs decode to the priors themselves
    np.testing.assert_allclose(boxes[:, 2] - boxes[:, 0], priors[:, 2], atol=1e-6)
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    np.testing.assert_allclose(centers, priors[:, :2], atol=1e-6)


@pytest.mark.parametrize("backbone", ["resnet10", "mobilenetv2", "squeezenet"])
def test_ssd_detect_shapes(backbone):
    import jax.numpy as jnp

    cfg = SSD.SSDConfig(backbone=backbone, input_size=(128, 128),
                        top_k=64, keep_top_k=16)
    net, variables, detect = SSD.make_ssd_face(cfg)
    dets, valid = detect(variables, jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert dets.shape == (1, 16, 5)
    assert valid.shape == (1, 16)
    d, v = np.asarray(dets), np.asarray(valid)
    assert (d[v][:, 4] > cfg.conf_thres).all()


def test_crop_and_resize_matches_cv2(rng):
    img = rng.randint(0, 255, (240, 320, 3)).astype(np.uint8)
    boxes = np.array([[40.0, 30.0, 140.0, 170.0], [0.0, 0.0, 320.0, 240.0]],
                     np.float32)
    crops = np.asarray(crop_and_resize(img, boxes, (112, 112)))
    for i, b in enumerate(boxes):
        x1, y1, x2, y2 = map(int, b)
        ref = cv2.resize(img[y1:y2, x1:x2], (112, 112)).astype(np.float32)
        assert np.abs(crops[i] - ref).max() <= 1.0 + 1e-4


def test_crop_invalid_masked(rng):
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    boxes = np.array([[8, 8, 32, 32], [0, 0, 64, 64]], np.float32)
    valid = np.array([True, False])
    crops = np.asarray(crop_and_resize(img, boxes, (16, 16), valid))
    assert crops[0].max() > 0
    assert (crops[1] == 0).all()


def test_pad_boxes_offsets():
    boxes = np.array([[10.0, 10.0, 50.0, 50.0]], np.float32)
    out = np.asarray(pad_boxes(boxes, (-6, -1, 4, 5), img_wh=(64, 48)))
    np.testing.assert_allclose(out[0], [4, 9, 54, 47])


def test_age_gender_batched_classify(rng):
    _, (av, gv), classify = AG.make_age_gender()
    crops = rng.uniform(-120, 120, (3, 227, 227, 3)).astype(np.float32)
    a, g = classify(av, gv, crops)
    a, g = np.asarray(a), np.asarray(g)
    assert a.shape == (3, 8) and g.shape == (3, 2)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)
    labels = AG.labels_from_probs(a, g)
    assert len(labels) == 3
    assert labels[0].split(":")[0] in AG.GENDERS


def test_lrn_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.uniform(-1, 1, (2, 7, 7, 16)).astype(np.float32)
    ref = torch.nn.LocalResponseNorm(5, alpha=1e-4, beta=0.75, k=1.0)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy()
    got = np.asarray(AG._lrn(x)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
