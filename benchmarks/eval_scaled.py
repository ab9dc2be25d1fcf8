"""Scaled executed eval: 256-image mixed plain/crowded WIDER-format tree.

Round-5 VERDICT #7: the executed eval evidence was a 64-image tree, small
enough that single-image flips move AP by points. This generates a
256-image mixed set (160 plain 0-4-face + 96 crowded 16-48-face frames,
train/golden.py composers), runs the four main detector families through
the SAME path as cli/eval_wider.py (eval/coco_eval.evaluate_engine_on_wider;
reference ``eval/eval_face_detector.py``), and reports AP plus the eval
path's own END-TO-END throughput (JPEG read -> batch -> engine -> COCO
accumulation), which no round had published.

Run (TPU):  python benchmarks/eval_scaled.py [--images 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", "data")

FAMILIES = [
    ("yolov5n", "yolov5n", "golden_yolov5n_ckpt", {}),
    ("yolov5s", "yolov5s", "golden_yolov5s_ckpt", {}),
    ("ssd-resnet10 @300", "ssd-resnet10", "golden_ssd_ckpt",
     {"input_size": (300, 300)}),
    ("mtcnn", "mtcnn", "golden_mtcnn_ckpt", {}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--crowded-frac", type=float, default=0.375)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        evaluate_engine_on_wider)
    from face_detection_and_recognition_tpu.train.golden import (
        make_composite_dataset)

    n_crowded = int(args.images * args.crowded_frac)
    n_plain = args.images - n_crowded
    out = tempfile.mkdtemp(prefix="eval_scaled_")
    ann, images_root = make_composite_dataset(
        out, n_images=n_plain, n_crowded=n_crowded, out_wh=(640, 640),
        seed=args.seed, include_real=True)
    n_total = sum(1 for line in open(ann) if line.strip().isdigit())
    print(f"eval tree: {n_total} images ({n_plain} plain + {n_crowded} "
          f"crowded), seed {args.seed}")
    print(f"{'family':22s} {'AP50':>6s} {'AP':>6s} {'AR':>6s} "
          f"{'imgs/s':>7s} {'wall s':>7s}")
    for label, det, ckpt, ov in FAMILIES:
        if args.only and args.only not in label:
            continue
        path = os.path.join(D, ckpt)
        if not os.path.isdir(path):
            print(f"{label:22s}   (not trained: {ckpt})")
            continue
        eng = FaceEngine(EngineConfig(detector=det, det_thres=0.02,
                                      bbox_area_thres=0.0, max_det=300,
                                      detector_overrides=ov))
        eng.load_weights(path)
        # warm the compile outside the timed region (first-compile is a
        # one-off cost, not eval throughput)
        evaluate_engine_on_wider(eng, ann, images_root,
                                 batch_size=args.batch, limit=args.batch)
        t0 = time.perf_counter()
        m = evaluate_engine_on_wider(eng, ann, images_root,
                                     batch_size=args.batch)
        wall = time.perf_counter() - t0
        print(f"{label:22s} {m['AP50']:6.3f} {m['AP']:6.3f} {m['AR']:6.3f} "
              f"{n_total / wall:7.1f} {wall:7.1f}", flush=True)


if __name__ == "__main__":
    main()
