"""Training data pipeline: letterbox target geometry + batching, and an
end-to-end mini training run through the CLI path on synthetic WIDER data."""
import os

import cv2
import numpy as np
import pytest

from face_detection_and_recognition_tpu.train import data as TD

pytestmark = pytest.mark.slow  # slow lane (pyproject addopts)


def test_make_example_geometry(rng):
    img = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    boxes = np.array([[100, 120, 80, 60]], np.float64)  # xywh
    x, t, v = TD.make_example(img, boxes, (320, 320), max_targets=4)
    assert x.shape == (320, 320, 3) and 0 <= x.min() and x.max() <= 1
    assert v[0] and not v[1:].any()
    # scale 0.5, pad top (320-240)/2=40: center (140,150) -> (70, 115)
    np.testing.assert_allclose(t[0, :4], [70, 75 + 40, 40, 30], atol=1e-4)
    # landmarks marked invisible
    assert (t[0, 4:] == -1).all()


@pytest.fixture()
def wider_tree(tmp_path, rng):
    img_dir = tmp_path / "images" / "0--Scene"
    img_dir.mkdir(parents=True)
    lines = []
    for i in range(6):
        img = rng.randint(0, 255, (240, 320, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        lines.append(f"0--Scene/im{i}.jpg\n1\n80 60 100 120 0 0 0 0 0 0\n")
    ann = tmp_path / "gt.txt"
    ann.write_text("".join(lines))
    return str(ann), str(tmp_path / "images")


def test_wider_batches(wider_tree):
    ann, images = wider_tree
    index = TD.load_wider_index(ann, images)
    assert len(index) == 6
    batches = list(TD.wider_batches(index, 2, (128, 128), 4, epochs=1))
    assert len(batches) == 3
    x, t, v = batches[0]
    assert x.shape == (2, 128, 128, 3)
    assert t.shape == (2, 4, 14)
    assert v.any()


def test_wider_batches_uint8_matches_f32(wider_tree):
    """as_uint8 yields the same pixels pre-normalization, and the train
    step's in-graph /255 makes the loss identical to the f32 input path."""
    import jax

    from face_detection_and_recognition_tpu.train.detection import (
        DetTrainConfig, create_det_train_state, make_det_train_step)

    ann, images = wider_tree
    index = TD.load_wider_index(ann, images)
    xf, tf_, vf = next(iter(TD.wider_batches(index, 2, (128, 128), 4)))
    xu, tu, vu = next(iter(TD.wider_batches(index, 2, (128, 128), 4,
                                            as_uint8=True)))
    assert xu.dtype == np.uint8 and xf.dtype == np.float32
    np.testing.assert_allclose(xf, xu.astype(np.float32) / 255.0, atol=1e-7)
    np.testing.assert_array_equal(tf_, tu)

    cfg = DetTrainConfig(arch="yolov5n", nc=1, input_size=(128, 128),
                         max_targets=4)
    state = create_det_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_det_train_step(state))
    out_f = step(state["params"], state["batch_stats"], state["opt_state"],
                 xf, tf_, vf)
    out_u = step(state["params"], state["batch_stats"], state["opt_state"],
                 xu, tu, vu)
    np.testing.assert_allclose(float(out_f[3]), float(out_u[3]),
                               rtol=1e-6, atol=1e-6)


def test_prefetch_iter_order_and_errors():
    assert list(TD.prefetch_iter(iter(range(7)), depth=3)) == list(range(7))

    def boom():
        yield 1
        raise ValueError("source failed")

    it = TD.prefetch_iter(boom(), depth=1)
    assert next(it) == 1
    with pytest.raises(ValueError, match="source failed"):
        list(it)


def test_train_detector_cli_smoke(wider_tree, tmp_path):
    from face_detection_and_recognition_tpu.cli.train_detector import main

    ann, images = wider_tree
    out = str(tmp_path / "ckpt")
    rc = main(["--ann", ann, "--images", images, "--arch", "yolov5n",
               "--size", "128", "--batch", "2", "--steps", "2",
               "--max-targets", "4", "--out", out, "--log-every", "1"])
    assert rc == 0
    assert os.path.isdir(out)
    # checkpoint reloads into an engine-compatible tree
    from face_detection_and_recognition_tpu.utils.checkpoint import \
        load_variables

    tree = load_variables(out)
    assert "params" in tree and "batch_stats" in tree


def test_flip_lr_landmark_swap():
    """Mirror x AND exchange left/right eye + mouth-corner slots
    (face_datasets.py:419-442); invisible (-1) landmarks stay invisible."""
    rows = np.zeros((1, 14), np.float32)
    rows[0, :4] = [30, 50, 20, 24]
    #            LE       RE      nose     LM        RM
    rows[0, 4:] = [10, 11, 20, 21, 15, 16, 12, 40, 18, 41]
    out = TD.flip_lr_targets(rows, img_w=100.0)
    assert out[0, 0] == 70.0 and out[0, 1] == 50.0  # cx mirrored, cy kept
    # new left eye = mirrored old right eye; new right eye = mirrored old left
    assert (out[0, 4], out[0, 5]) == (80.0, 21.0)
    assert (out[0, 6], out[0, 7]) == (90.0, 11.0)
    # nose mirrors in place
    assert (out[0, 8], out[0, 9]) == (85.0, 16.0)
    # mouth corners swap
    assert (out[0, 10], out[0, 11]) == (82.0, 41.0)
    assert (out[0, 12], out[0, 13]) == (88.0, 40.0)
    # invisible landmarks survive a flip untouched
    rows[0, 4:] = -1.0
    out = TD.flip_lr_targets(rows, img_w=100.0)
    assert (out[0, 4:] == -1.0).all()


def test_flip_ud_targets():
    rows = np.zeros((1, 14), np.float32)
    rows[0, :4] = [30, 20, 10, 10]
    rows[0, 4:] = [5, 10, 6, 11, 7, 12, 8, 13, 9, 14]
    out = TD.flip_ud_targets(rows, img_h=100.0)
    assert out[0, 1] == 80.0 and out[0, 0] == 30.0
    # only y mirrors, no slot swap
    assert (out[0, 4], out[0, 5]) == (5.0, 90.0)
    assert (out[0, 6], out[0, 7]) == (6.0, 89.0)


def test_augment_hsv_zero_gains_identity(rng):
    import random as pyrandom

    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    out = TD.augment_hsv(img.copy(), pyrandom.Random(0), 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(out, img)
    # deterministic under a fixed seed
    a = TD.augment_hsv(img.copy(), pyrandom.Random(7), 0.015, 0.7, 0.4)
    b = TD.augment_hsv(img.copy(), pyrandom.Random(7), 0.015, 0.7, 0.4)
    np.testing.assert_array_equal(a, b)
    assert a.shape == img.shape and a.dtype == np.uint8


def test_mosaic4_geometry_and_label_bounds():
    import random as pyrandom

    items = []
    for c in range(4):
        img = np.full((120, 160, 3), 40 * (c + 1), np.uint8)
        rows = np.full((1, 14), -1.0, np.float32)
        rows[0, :4] = [80, 60, 60, 50]  # centered box
        items.append((img, rows))
    canvas, rows = TD.mosaic4(items, (128, 128), pyrandom.Random(3), scale=0.2)
    assert canvas.shape == (128, 128, 3) and canvas.dtype == np.uint8
    assert len(rows) >= 1  # at least one GT survives the crop
    # every surviving box lies inside the canvas
    x1 = rows[:, 0] - rows[:, 2] / 2
    y1 = rows[:, 1] - rows[:, 3] / 2
    x2 = rows[:, 0] + rows[:, 2] / 2
    y2 = rows[:, 1] + rows[:, 3] / 2
    assert (x1 >= -1e-3).all() and (y1 >= -1e-3).all()
    assert (x2 <= 128 + 1e-3).all() and (y2 <= 128 + 1e-3).all()
    # deterministic under the same seed
    canvas2, rows2 = TD.mosaic4(items, (128, 128), pyrandom.Random(3),
                                scale=0.2)
    np.testing.assert_array_equal(canvas, canvas2)
    np.testing.assert_allclose(rows, rows2)


def test_letterbox_example_matches_make_example(rng):
    img = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    boxes = np.array([[100, 120, 80, 60]], np.float64)
    canvas, rows = TD.letterbox_example(img, TD.boxes_to_rows(boxes),
                                        (320, 320))
    assert canvas.shape == (320, 320, 3) and canvas.dtype == np.uint8
    np.testing.assert_allclose(rows[0, :4], [70, 115, 40, 30], atol=1e-4)
    assert (rows[0, 4:] == -1).all()


def test_wider_batches_augmented(wider_tree):
    ann, images = wider_tree
    index = TD.load_wider_index(ann, images)
    aug = TD.AugmentConfig(mosaic=1.0, fliplr=0.5)
    batches = list(TD.wider_batches(index, 2, (128, 128), 8, epochs=1,
                                    seed=11, augment=aug))
    assert len(batches) == 3
    x, t, v = batches[0]
    assert x.shape == (2, 128, 128, 3) and 0 <= x.min() and x.max() <= 1
    assert t.shape == (2, 8, 14)
    assert v.any()  # mosaic keeps at least some GT across the batch
    # deterministic under the same seed
    batches2 = list(TD.wider_batches(index, 2, (128, 128), 8, epochs=1,
                                     seed=11, augment=aug))
    np.testing.assert_allclose(batches[0][0], batches2[0][0])
