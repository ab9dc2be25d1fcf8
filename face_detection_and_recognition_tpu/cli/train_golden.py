"""Train a detector to its first REAL detections on the golden image.

``python -m face_detection_and_recognition_tpu.cli.train_golden`` runs the
full in-environment accuracy loop (train/golden.py): synthetic composites
from the reference's pinned 3-face image -> augmented EMA training ->
engine gate (3 faces at IoU >= 0.5 vs the golden boxes of
tests/image_tests/test_yolov5_face.py:58-66, zero on the 0-face image) ->
orbax checkpoint -> reload through a fresh engine -> regate.

Exit code 0 only when the reloaded checkpoint passes the gate.
"""
from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="checkpoint output dir")
    ap.add_argument("--arch", default="yolov5n")
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--resume-from", default=None,
                    help="continue from a previous golden checkpoint")
    ap.add_argument("--gate-dt", type=float, default=0.5,
                    help="confidence center the golden gate holds at")
    ap.add_argument("--gate-margin", type=float, default=0.05,
                    help="gate must also hold at gate-dt +/- this "
                         "(0.6/0.15 covers the CLI's default --dt 0.70)")
    ap.add_argument("--gate-iou", type=float, default=0.5,
                    help="per-box IoU the gate requires (0.8 = the "
                         "reference harness's own matcher bar; training "
                         "early-stops only once every box clears it)")
    ap.add_argument("--export-caffemodel", default=None,
                    help="(res10-ssd only) also write the trained blobs "
                         "into a REAL binary .caffemodel at this path")
    ap.add_argument("--export-ir", default=None,
                    help="(ov-* only) also write the trained weights into "
                         "a REAL model.xml (+ sibling .bin) at this path")
    ap.add_argument("--face-px", default=None,
                    help="'lo,hi' pixel band for composite face sizes "
                         "(overrides the default 0.05*side..0.55*side "
                         "draw — e.g. a fine-tune concentrated on the "
                         "gate's evaluated face scale)")
    ap.add_argument("--loss-override", action="append", default=[],
                    metavar="KEY=VAL",
                    help="family-config LOSS knob override (repeatable), "
                         "e.g. --loss-override box_gain=4.0 for a "
                         "localization-weighted fine-tune")
    ap.add_argument("--crowded", action="store_true",
                    help="mix 16-48-face crowded composites (rotation/"
                         "overlap/8-300px) into training and widen the "
                         "target buffer — the WIDER-regime checkpoint for "
                         "tests/test_crowded_accuracy.py")
    args = ap.parse_args(argv)
    if args.export_caffemodel and args.arch != "res10-ssd":
        ap.error("--export-caffemodel applies to --arch res10-ssd only")
    if args.export_ir and not args.arch.startswith("ov-"):
        ap.error("--export-ir applies to the ov-* topologies only")

    from ..train.golden import train_golden

    work = args.work_dir or tempfile.mkdtemp(prefix="golden_")
    r = train_golden(
        args.out, work, arch=args.arch, input_size=args.size,
        batch_size=args.batch, max_steps=args.steps,
        eval_every=args.eval_every, n_images=args.images, lr=args.lr,
        seed=args.seed, resume_from=args.resume_from,
        gate_det_thres=args.gate_dt, gate_margin=args.gate_margin,
        gate_iou=args.gate_iou, crowded=args.crowded,
        face_px=(tuple(float(x) for x in args.face_px.split(","))
                 if args.face_px else None),
        loss_overrides={k: float(v) for k, v in
                        (s.split("=", 1) for s in args.loss_override)}
        or None)
    print(f"golden gate: ok={r['ok']} reload_ok={r.get('reload_ok')} "
          f"ious={['%.3f' % i for i in r['ious']]} steps={r.get('steps')}")
    if r["ok"] and r.get("reload_ok"):
        from ..core.engine import EngineConfig, FaceEngine
        from ..train.golden import evaluate_holdout_ap

        ov = ({} if args.arch.startswith("blazeface")
              else {"input_size": (args.size, args.size)})
        eng = FaceEngine(EngineConfig(
            detector=args.arch, det_thres=0.5, detector_overrides=ov))
        eng.load_weights(args.out)
        ap = evaluate_holdout_ap(eng, work, input_size=args.size,
                                 seed=args.seed + 7777)
        print(f"holdout AP50={ap['AP50']:.3f} AP={ap['AP']:.3f} "
              f"AR={ap['AR']:.3f}")
        if args.export_caffemodel:
            from ..train.caffe_golden import export_trained_caffemodel
            from ..utils.checkpoint import load_variables

            export_trained_caffemodel(load_variables(args.out),
                                      args.export_caffemodel)
            print(f"trained .caffemodel written to {args.export_caffemodel}")
        if args.export_ir:
            from ..models.ov_topologies import export_trained_ir
            from ..utils.checkpoint import load_variables

            export_trained_ir(args.arch, load_variables(args.out),
                              args.export_ir)
            print(f"trained IR written to {args.export_ir} (+ .bin)")
    return 0 if (r["ok"] and r.get("reload_ok")) else 1


if __name__ == "__main__":
    sys.exit(main())
