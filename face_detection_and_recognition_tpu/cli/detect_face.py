"""Unified face-detection CLI — covers all five reference entry points.

Reference scripts -> registry names:
    detect_face_opencv_dnn.py        -> --md ssd-resnet10
    detect_face_opencv_age_gender.py -> --md ssd-resnet10 --age-gender
    detect_face_blazeface.py         -> --md blazeface-front | blazeface-back
    detect_face_mtcnn.py             -> --md mtcnn
    detect_face_openvino.py          -> --md ssd-mobilenetv2 | ssd-squeezenet
    detect_face_yolov5_face.py       -> --md yolov5s | yolov5n | ...

Usage:
    python -m face_detection_and_recognition_tpu.cli.detect_face \
        -i img.jpg --md yolov5s --dt 0.7 --at 0.12 --no-display -o out.jpg

Accepts an optional ``--ckpt`` orbax/msgpack checkpoint for real weights;
otherwise runs with the initialized architecture (weight conversion from the
reference's torch checkpoints: utils/weights.py).
"""
from __future__ import annotations

import sys

from ..core.engine import EngineConfig, FaceEngine
from ..core.inference import inference_img, inference_vid, inference_webcam
from ..models import registry
from ..utils.files import get_file_type
from ..utils.parser import get_argparse


def build_engine(args) -> FaceEngine:
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    ckpt = getattr(args, "ckpt", None)
    overrides = {}
    if args.model == "openvino-ir":
        # the IR *is* the net: the weights file defines the topology, so it
        # must be present at build (detect_face_openvino.py's -m model.xml)
        if not ckpt or not ckpt.endswith(".xml"):
            raise SystemExit("--md openvino-ir requires --ckpt model.xml")
        overrides["xml"] = ckpt
        ckpt = None
    cfg = EngineConfig(
        detector=args.model,
        det_thres=args.det_thres,
        bbox_area_thres=args.bbox_area_thres,
        with_age_gender=getattr(args, "age_gender", False),
        embedder=getattr(args, "embedder", None),
        rect=getattr(args, "rect", False),
        detector_overrides=overrides,
    )
    engine = FaceEngine(cfg)
    if ckpt:
        # any reference weight format (.pt/.pth/.caffemodel/.pb/.xml) or an
        # orbax checkpoint of our own variables tree
        engine.load_weights(ckpt)
    return engine


def main(argv=None) -> int:
    parser = get_argparse(
        description="TPU-native face detection (all reference backends)"
    )
    parser.add_argument("--age-gender", dest="age_gender", action="store_true",
                        help="Attach age+gender labels (opencv_age_gender "
                             "entry-point equivalent).")
    parser.add_argument("--ckpt", "--weights", dest="ckpt", default=None,
                        help="Real weights for the detector: torch .pt/.pth, "
                             ".caffemodel, frozen .pb, OpenVINO .xml(+.bin), "
                             "or an orbax checkpoint dir.")
    parser.add_argument("--embedder", dest="embedder", default=None,
                        help="Also embed each detected face (registry name, "
                             "e.g. mobile_facenet) and report the vector "
                             "norm/dim.")
    parser.add_argument("--rect", action="store_true",
                        help="Rect letterbox inference (yolov5 families): "
                             "smallest stride-multiple canvas per source "
                             "resolution — same detections, ~1.5x faster on "
                             "16:9 video.")
    args = parser.parse_args(argv)

    if args.model not in registry.available():
        print(f"unknown model '{args.model}'. available: "
              f"{', '.join(registry.available())}", file=sys.stderr)
        return 2

    engine = build_engine(args)
    display = not args.no_display
    ftype = get_file_type(args.input_src)
    if ftype == "image":
        post = inference_img(engine, args.input_src, output=args.output,
                             display=display, age_gender=args.age_gender)
        print(f"{len(post.boxes)} face(s)")
        emb = None
        if args.embedder and len(post.boxes):
            import cv2

            emb = engine.embed_faces(cv2.imread(args.input_src), post.boxes)
        for i, (box, conf) in enumerate(zip(post.boxes, post.bbox_confs)):
            lbl = f" {post.bbox_labels[i]}" if post.bbox_labels else ""
            if emb is not None:
                lbl += f" emb[{emb.shape[1]}d]"
            print(f"  [{int(box[0])},{int(box[1])},{int(box[2])},{int(box[3])}]"
                  f" conf={conf:.3f}{lbl}")
    elif ftype == "video":
        results = inference_vid(engine, args.input_src, output=args.output,
                                display=display, age_gender=args.age_gender)
        total = sum(len(r.boxes) for r in results)
        print(f"{len(results)} frames, {total} detections")
    elif ftype == "camera":
        inference_webcam(engine, int(args.input_src),
                         age_gender=args.age_gender)
    else:
        print(f"cannot determine input type of {args.input_src}",
              file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
