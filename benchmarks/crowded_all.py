"""Crowded-frame AP for EVERY golden-gated detector family.

Round-5 VERDICT #1 second half: the round-4 crowded benchmark covered
yolov5n/s, ssd-resnet10 and mtcnn; this script measures the remaining
families (blazeface front/back, the two exact OpenVINO topologies,
yolov5n6) plus the crowd-trained checkpoints on the SAME seed-11 16-image
crowded set tests/test_crowded_accuracy.py evaluates — one table for
PARITY.md's per-family crowded row. Reference regime:
``eval/eval_face_detector.py:114-151``.

Run (TPU or CPU):  python benchmarks/crowded_all.py [--seed 11]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", "data")

# family -> (detector, ckpt dir, engine overrides)
FAMILIES = [
    ("yolov5n (base)", "yolov5n", "golden_yolov5n_ckpt", {}),
    ("yolov5s (base)", "yolov5s", "golden_yolov5s_ckpt", {}),
    ("yolov5n6 (base)", "yolov5n6", "golden_yolov5n6_ckpt", {}),
    ("ssd-resnet10 @300", "ssd-resnet10", "golden_ssd_ckpt",
     {"input_size": (300, 300)}),
    ("blazeface-front @128", "blazeface-front", "golden_blaze_ckpt", {}),
    ("blazeface-back @256", "blazeface-back", "golden_blaze_back_ckpt", {}),
    ("ov-0204 @448 (exact IR)", "ov-0204", "golden_ov_0204_ckpt", {}),
    ("ov-retail-0004 class @300", "ov-squeezenet-light", "golden_ov_sq_ckpt",
     {}),
    ("mtcnn (native pyramid)", "mtcnn", "golden_mtcnn_ckpt", {}),
    ("yolov5n CROWD-trained", "yolov5n", "golden_yolov5n_crowded_ckpt", {}),
    ("yolov5s6 CROWD-trained @960", "yolov5s6", "golden_yolov5s6_crowded_ckpt",
     {"input_size": (960, 960)}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="substring filter on the family label")
    args = ap.parse_args()

    from face_detection_and_recognition_tpu.core.engine import (
        EngineConfig, FaceEngine)
    from face_detection_and_recognition_tpu.eval.coco_eval import (
        evaluate_engine_on_wider)
    from face_detection_and_recognition_tpu.train.golden import (
        make_crowded_dataset)

    out = tempfile.mkdtemp(prefix="crowded_all_")
    ann, images_root = make_crowded_dataset(out, n_images=args.images,
                                            out_wh=(640, 640),
                                            seed=args.seed)
    print(f"crowded set: {args.images} images, seed {args.seed}")
    print(f"{'family':34s} {'AP50':>6s} {'AP':>6s} {'AR':>6s}")
    for label, det, ckpt, ov in FAMILIES:
        if args.only and args.only not in label:
            continue
        path = os.path.join(D, ckpt)
        if not os.path.isdir(path):
            print(f"{label:34s}   (not trained: {ckpt})")
            continue
        eng = FaceEngine(EngineConfig(detector=det, det_thres=0.02,
                                      bbox_area_thres=0.0, max_det=300,
                                      detector_overrides=ov))
        eng.load_weights(path)
        m = evaluate_engine_on_wider(eng, ann, images_root,
                                     batch_size=args.batch)
        print(f"{label:34s} {m['AP50']:6.3f} {m['AP']:6.3f} {m['AR']:6.3f}",
              flush=True)


if __name__ == "__main__":
    main()
