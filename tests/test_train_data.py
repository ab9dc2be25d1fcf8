"""Training data pipeline: letterbox target geometry + batching, and an
end-to-end mini training run through the CLI path on synthetic WIDER data."""
import os

import cv2
import numpy as np
import pytest

from face_detection_and_recognition_tpu.train import data as TD


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
